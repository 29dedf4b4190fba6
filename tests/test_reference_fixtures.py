"""Validation against the reference's own measured data fixtures.

The reference snapshot ships real fixtures (SURVEY.md S5): the measured
matched-filter reference waveforms (``refDDCDataMF1.mat`` /
``refDBFDataMF1.mat``, loaded at ``DMX_SignalProcessing_main_xzr.m:156-159``),
the precomputed Kaiser window (``kaiser_win.mat``, the commented equivalent of
``kaiser(N, 8)`` at ``fun_Process_MTD.m:19``), and a real I/Q capture subset.
These tests run the framework against those exact artifacts (skipped when the
reference mount is absent).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

REF_DIR = "/root/reference/MatlabProcess_xuzerui"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference snapshot not mounted"
)


def _load(name):
    import scipy.io as sio

    return sio.loadmat(os.path.join(REF_DIR, name))


@needs_ref
def test_kaiser_window_matches_reference_fixture():
    """kaiser_win.mat is MATLAB kaiser(1536, 8); ours must match it."""
    from radar_signal_process_tpu.ops import make_window

    ref = _load("kaiser_win.mat")["kaiser_win"].ravel()
    ours = make_window("kaiser", 1536, 8.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)


@needs_ref
@pytest.mark.parametrize("fixture", ["refDDCDataMF1.mat", "refDBFDataMF1.mat"])
def test_g0_chain_with_measured_match_waveform(fixture, rng):
    """The G0 chain accepts the measured matched-filter waveform and the PC
    peak lands at the echo's range cell (peak-at-leading-edge convention)."""
    from radar_signal_process_tpu.config import G0_PROFILE
    from radar_signal_process_tpu.models.g0_chain import G0Chain

    ref_waveform = _load(fixture)["refData"].ravel().astype(np.complex128)
    assert ref_waveform.shape == (67,)

    chain = G0Chain(match_waveform=ref_waveform, freq_index=5, beam_pos=0)
    prof = G0_PROFILE
    n = prof.prt_per_frame
    d = 77  # long-segment range cell
    echo = np.zeros((n, prof.point_prt), dtype=np.complex128)
    s1 = prof.segment_starts[1]
    echo[:, s1 + d : s1 + d + 67] = ref_waveform[None, :]
    short_mf, long_mf = chain._pc(jnp.asarray(echo), jnp.asarray(echo))
    pc_row = np.abs(np.asarray(long_mf[0, 0]))
    assert int(np.argmax(pc_row)) == d


@needs_ref
def test_real_iq_subset_through_ops(rng):
    """Real measured I/Q rows run through matched filtering + Doppler cleanly."""
    from radar_signal_process_tpu.ops import doppler_process, make_window
    from radar_signal_process_tpu.ops.pulse_compression import (
        matched_filter_compress,
    )
    from radar_signal_process_tpu.ops.waveforms import reference_pulses
    from radar_signal_process_tpu.config import G1_PROFILE

    d = _load("data_iq_subset.mat")["data_subset"]  # (100, 500, 2)
    iq = d[..., 0] + 1j * d[..., 1]
    pulse2 = reference_pulses(G1_PROFILE)[1]
    pc = np.asarray(matched_filter_compress(jnp.asarray(iq), pulse2))
    assert pc.shape == iq.shape
    assert np.isfinite(pc).all()
    rdm = np.asarray(doppler_process(jnp.asarray(pc), make_window("kaiser", 100, 8.0)))
    assert np.isfinite(rdm).all()
    assert rdm.max() > 0


@needs_ref
def test_mtd_chain_with_measured_match_waveform(rng):
    """The measured G0 waveform flows through the stage-2 MTD chain
    (fun_MTD_produce.m:72-78 hook): pulse compression uses it and the RDM
    peak lands at the echo's range cell."""
    import dataclasses

    from radar_signal_process_tpu.config import G2_PROFILE
    from radar_signal_process_tpu.models.mtd_pipeline import mtd_produce
    from radar_signal_process_tpu.ops.pulse_compression import (
        segmented_pulse_compression,
    )
    from radar_signal_process_tpu.ops.waveforms import (
        load_measured_pulse,
        pulses_with_overrides,
    )

    wf = load_measured_pulse(
        os.path.join(REF_DIR, "refDDCDataMF1.mat"), "refData"
    )
    assert wf.shape == (67,)
    prof = dataclasses.replace(
        G2_PROFILE, prt_per_frame=32, point_prt=344,
        segment_points=(24, 80, 240),
        cfar_segments=((0, 24), (24, 104), (104, 344)),
    )
    pulses = pulses_with_overrides(prof, {2: wf})
    np.testing.assert_array_equal(pulses[2], wf)

    # echo: measured waveform at long-segment cell d with a Doppler ramp
    n, d = prof.prt_per_frame, 50
    ramp = np.exp(1j * 2 * np.pi * (-8 / n) * np.arange(n))
    echo = np.zeros((n, prof.point_prt), dtype=np.complex128)
    s2 = prof.segment_starts[2]
    echo[:, s2 + d : s2 + d + 67] = ramp[:, None] * wf[None, :]

    rdm = np.asarray(mtd_produce(jnp.asarray(echo), prof, pulses=pulses))
    v, r = np.unravel_index(np.argmax(rdm), rdm.shape)
    assert r == s2 + d
    # matches the composed ops bit-for-bit
    from radar_signal_process_tpu.ops.mtd import (
        doppler_process,
        zero_velocity_notch,
    )
    from radar_signal_process_tpu.ops.windows import make_window

    pc = segmented_pulse_compression(jnp.asarray(echo), prof, pulses)
    window = make_window(prof.mtd.window, n, prof.mtd.window_beta)
    want = zero_velocity_notch(
        doppler_process(pc, window), divisor=prof.mtd.notch_divisor
    )
    np.testing.assert_array_equal(rdm, np.asarray(want))
    # and the synthesized-pulse chain puts its peak elsewhere (the measured
    # waveform is not the ideal LFM) or at least differs numerically
    rdm_syn = np.asarray(mtd_produce(jnp.asarray(echo), prof))
    assert not np.array_equal(rdm, rdm_syn)
