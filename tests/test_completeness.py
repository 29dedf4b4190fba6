"""Coverage for the remaining small reference components (K12, DBF, waveforms,
DDC metadata)."""

import numpy as np

import jax.numpy as jnp

from radar_signal_process_tpu.config import G2_PROFILE
from radar_signal_process_tpu.ingest.packets import G2Header
from radar_signal_process_tpu.ops import (
    amp_constrained_width,
    apply_dbf,
    composite_transmit_pulse,
    reference_pulses,
)
from radar_signal_process_tpu.ops.dbf import load_dbf_coeffs


def _width_oracle(spec, thresh_db):
    """ampConstrWidthEst.m transcription (no interpolation path)."""
    mag = np.abs(np.fft.fftshift(spec))
    db = 20 * np.log10(mag / mag.max())
    idx = np.nonzero(db >= thresh_db)[0]
    return float(idx[-1] - idx[0]) if len(idx) else 0.0


def test_amp_constrained_width_matches_oracle(rng):
    t = np.arange(256) / 256.0
    spec = np.fft.fft(np.exp(1j * 2 * np.pi * 40 * t) * np.hanning(256))
    got = float(amp_constrained_width(jnp.asarray(spec), -20.0))
    assert got == _width_oracle(spec, -20.0)
    # all-below threshold never happens (peak is 0 dB); a tight threshold
    # collapses to the mainlobe
    narrow = float(amp_constrained_width(jnp.asarray(spec), -0.5))
    assert narrow <= got


def test_amp_constrained_width_interp(rng):
    spec = np.fft.fft(np.hanning(64))
    w = float(amp_constrained_width(jnp.asarray(spec), -30.0, interp=True, interp_times=4))
    assert w > 0
    # width reported in original-sample units
    w1 = float(amp_constrained_width(jnp.asarray(spec), -30.0))
    assert abs(w - w1) < 2.0


def test_dbf_matches_reference_matmul(rng):
    """DBF = sig (samples x ch) @ coeffs.' non-conjugated (FrameDataRead:158)."""
    sig = rng.standard_normal((40, 16)) + 1j * rng.standard_normal((40, 16))
    coeffs = rng.standard_normal((13, 16)) + 1j * rng.standard_normal((13, 16))
    got = np.asarray(apply_dbf(jnp.asarray(sig), coeffs))
    want = sig @ coeffs.T  # .-transpose, no conjugation
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_dbf_coeff_text_loader(tmp_path, rng):
    coeffs = rng.standard_normal((13, 16)) + 1j * rng.standard_normal((13, 16))
    inter = np.empty((13, 32))
    inter[:, 0::2] = coeffs.real
    inter[:, 1::2] = coeffs.imag
    path = tmp_path / "dbf.txt"
    np.savetxt(path, inter)
    got = load_dbf_coeffs(str(path), 16)
    np.testing.assert_allclose(got, coeffs)


def test_composite_transmit_pulse_layout():
    prof = G2_PROFILE
    full = composite_transmit_pulse(prof)
    pulses = reference_pulses(prof)
    assert full.shape == (prof.point_prt,)
    for start, pulse in zip(prof.segment_starts, pulses):
        np.testing.assert_array_equal(full[start : start + len(pulse)], pulse)


def test_g2_chirp_slopes_signs():
    # fun_MTD_produce.m: K2 = -B/tao2 (down-chirp mid), K3 = +B/tao3 (up long)
    k1, k2, k3 = G2_PROFILE.chirp_slopes
    assert k2 < 0 < k3


def test_ddc_decimation_factor():
    head = G2Header(0, 0, 0, 16, 0, 3404, 1, 332, 4, 0, 228, 723, 2453)
    assert head.ddc_decimation == 2   # KuP4K
    head2 = G2Header(0, 0, 0, 16, 0, 3404, 1, 332, 2, 0, 228, 723, 2453)
    assert head2.ddc_decimation == 4  # X3D8K


def _col_width_oracle(col_mag, thresh_db, shifted=True):
    """K12 width on a magnitude Doppler column (ampConstrWidthEst.m:20-41)."""
    mag = col_mag if shifted else np.fft.fftshift(col_mag)
    db = 20 * np.log10(mag / mag.max())
    idx = np.nonzero(db >= thresh_db)[0]
    return float(idx[-1] - idx[0]) if len(idx) else 0.0


def test_detection_spectral_widths_matches_oracle(rng):
    from radar_signal_process_tpu.ops.spectrum import detection_spectral_widths

    nv, nr = 64, 48
    rdm = rng.random((nv, nr)).astype(np.float32) * 0.1
    # two synthetic detections with distinct Doppler mainlobes
    rdm[30:35, 10] += np.hanning(5) * 8.0
    rdm[10:21, 33] += np.hanning(11) * 5.0
    r_idx = jnp.asarray(np.array([10, 33], dtype=np.int32))
    got = np.asarray(detection_spectral_widths(jnp.asarray(rdm), r_idx, -20.0))
    want = [_col_width_oracle(rdm[:, r], -20.0) for r in (10, 33)]
    np.testing.assert_allclose(got, want)


def test_detection_spectral_widths_unshifted_layout(rng):
    """G0-layout (unshifted) columns are fftshift'ed before the width rule."""
    from radar_signal_process_tpu.ops.spectrum import detection_spectral_widths

    nv, nr = 32, 8
    rdm = rng.random((nv, nr)).astype(np.float32) * 0.01
    # clutter-free mainlobe straddling the wrap point (rows N-2..1)
    for i, row in enumerate([nv - 2, nv - 1, 0, 1]):
        rdm[row, 3] += (2.0, 8.0, 8.0, 2.0)[i]
    r_idx = jnp.asarray(np.array([3], dtype=np.int32))
    got = float(detection_spectral_widths(
        jnp.asarray(rdm), r_idx, -15.0, shifted_input=False
    )[0])
    want = _col_width_oracle(rdm[:, 3], -15.0, shifted=False)
    assert got == want
    # without the shift the straddling lobe would span nearly the full axis
    wrong = float(detection_spectral_widths(jnp.asarray(rdm), r_idx, -15.0)[0])
    assert wrong > got


def test_motion_parameters_optional_spectral_width(rng):
    """spectral_width_db threads K12 widths through the measurement stage."""
    from radar_signal_process_tpu.ops.measure import (
        extract_detections,
        motion_parameters,
    )
    from radar_signal_process_tpu.ops.spectrum import detection_spectral_widths

    nv, nr = 40, 32
    rdm = rng.random((nv, nr)).astype(np.float32) * 0.1
    rdm[18:23, 12] += np.hanning(5) * 9.0
    flags = np.zeros((nv, nr), dtype=bool)
    flags[20, 12] = True
    dets = extract_detections(jnp.asarray(flags), jnp.asarray(rdm), 4)
    common = dict(
        r_scale=np.arange(nr) * 6.0, delta_r=6.0,
        v_scale=np.linspace(-20, 20, nv), delta_v=1.0, k_value=1.0,
        beam_pos=0, beam_angle_step=5.0, n_clutter=2,
    )
    base = motion_parameters(jnp.asarray(rdm), jnp.asarray(rdm) * 0.1, dets,
                             **common)
    assert base.spectral_width is None
    meas = motion_parameters(jnp.asarray(rdm), jnp.asarray(rdm) * 0.1, dets,
                             spectral_width_db=-20.0, **common)
    want = np.asarray(detection_spectral_widths(
        jnp.asarray(rdm), dets.r_idx, -20.0
    ))
    np.testing.assert_array_equal(np.asarray(meas.spectral_width), want)
    assert float(want[0]) == _col_width_oracle(rdm[:, 12], -20.0)
    # the original estimates are untouched
    np.testing.assert_array_equal(
        np.asarray(meas.range_m), np.asarray(base.range_m)
    )


def test_load_measured_pulse_robustness(tmp_path, rng):
    """Loader guards: 2-D tables rejected, case-insensitive extensions,
    empty waveforms rejected by the override builder."""
    import pytest

    from radar_signal_process_tpu.ops.waveforms import (
        load_measured_pulse,
        pulses_with_overrides,
    )

    wf = rng.standard_normal(20) + 1j * rng.standard_normal(20)
    # singleton dims squeeze away (MATLAB vectors load as (1, n))
    p = tmp_path / "ok.npz"
    np.savez(p, refData=wf[None, :])
    np.testing.assert_array_equal(load_measured_pulse(str(p)), wf)

    # a genuine 2-D table must be rejected, not raveled
    p2 = tmp_path / "table.npz"
    np.savez(p2, refData=np.stack([wf, wf]))
    with pytest.raises(ValueError, match="1-D complex vector"):
        load_measured_pulse(str(p2))

    # upper-case extensions route to the right parser
    import scipy.io as sio

    p3 = tmp_path / "WF.MAT"
    sio.savemat(p3, {"refData": wf})
    np.testing.assert_allclose(load_measured_pulse(str(p3), "refData"), wf)

    # empty waveforms fail loud before corrupting segment widths
    with pytest.raises(ValueError, match="empty"):
        pulses_with_overrides(G2_PROFILE, {1: np.zeros(0, complex)})


def test_motion_parameters_interpolated_width(rng):
    """spectral_width_interp threads the reference's sub-bin width mode."""
    from radar_signal_process_tpu.ops.measure import (
        extract_detections,
        motion_parameters,
    )

    nv, nr = 40, 16
    rdm = rng.random((nv, nr)).astype(np.float32) * 0.01
    rdm[18:23, 5] += np.hanning(5) * 9.0
    flags = np.zeros((nv, nr), dtype=bool)
    flags[20, 5] = True
    dets = extract_detections(jnp.asarray(flags), jnp.asarray(rdm), 2)
    common = dict(
        r_scale=np.arange(nr) * 6.0, delta_r=6.0,
        v_scale=np.linspace(-20, 20, nv), delta_v=1.0, k_value=1.0,
        beam_pos=0, beam_angle_step=5.0, n_clutter=2,
        spectral_width_db=-20.0,
    )
    coarse = motion_parameters(jnp.asarray(rdm), jnp.asarray(rdm) * 0.1,
                               dets, **common)
    fine = motion_parameters(jnp.asarray(rdm), jnp.asarray(rdm) * 0.1, dets,
                             spectral_width_interp=4, **common)
    w_c = float(np.asarray(coarse.spectral_width)[0])
    w_f = float(np.asarray(fine.spectral_width)[0])
    assert w_c == float(int(w_c))          # whole bins without interp
    assert w_f % 1 in (0.0, 0.25, 0.5, 0.75)
    assert abs(w_f - w_c) < 2.0            # same lobe, sub-bin refined
