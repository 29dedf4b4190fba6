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
