"""Golden chain tests: G0 end-to-end with monopulse measurement, G1 validation.

These are the automated versions of the reference's visual checks
(SURVEY.md §4): a synthetic target with known kinematics must be detected at
its known cells and measured within sub-bin accuracy.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from radar_signal_process_tpu.config import G0ChainConfig, G0_PROFILE, G1_PROFILE
from radar_signal_process_tpu.models.g0_chain import G0Chain
from radar_signal_process_tpu.models.g1_chain import g1_validation_chain
from radar_signal_process_tpu.ops.tables import angle_k_values
from radar_signal_process_tpu.ops.waveforms import reference_pulses
from radar_signal_process_tpu.sim import apply_scr, synthesize_target_echo, synthetic_clutter


def _g0_target(profile, doppler_hz, cell_short, cell_long, amp_left, amp_right, rng):
    """Two-beam G0 echo: pulses at given segment-local cells + phase ramp.

    The G0 chain's velocity sign convention is inverted (I/Q swap noted at
    ``DMX_SignalProcessing_main_xzr.m:10,172-174``): vScale = -lambda*f/2, so
    a *negative* Doppler ramp produces a *positive* measured velocity.
    """
    n = profile.prt_per_frame
    p_short, p_long = reference_pulses(profile)
    m = np.arange(n)
    ramp = np.exp(1j * 2 * np.pi * doppler_hz * m * profile.prt)
    base = np.zeros((n, profile.point_prt), dtype=np.complex128)
    s0, s1 = profile.segment_starts
    base[:, s0 + cell_short : s0 + cell_short + len(p_short)] += (
        ramp[:, None] * p_short[None, :]
    )
    span = min(len(p_long), profile.segment_points[1] - cell_long)
    base[:, s1 + cell_long : s1 + cell_long + span] += (
        ramp[:, None] * p_long[None, :span]
    )
    noise = 0.001 * (
        rng.standard_normal((2, n, profile.point_prt))
        + 1j * rng.standard_normal((2, n, profile.point_prt))
    )
    return amp_left * base + noise[0], amp_right * base + noise[1]


def test_g0_chain_detects_and_measures(rng):
    prof = G0_PROFILE
    chain_cfg = G0ChainConfig()
    chain = G0Chain(prof, chain_cfg, freq_index=5, beam_pos=2)

    # Doppler bin -60 of 2048 -> fd = -562.5 Hz -> vEst = -lambda*f/2 = +8.97 m/s
    delta_dop = prof.prf / chain_cfg.mtd_fft_length
    fd = -60 * delta_dop
    v_expected = -chain.wavelength * fd / 2.0
    cell_long = 100
    left, right = _g0_target(prof, fd, 20, cell_long, 1.0, 0.8, rng)

    res = chain.process_frame(left, right)

    flags = np.asarray(res.flags_long)
    v_hits, r_hits = np.nonzero(flags)
    assert len(v_hits) > 0
    # the unshifted Doppler bin for fd < 0 sits in the upper half
    assert (2048 - 60) in v_hits
    assert any(abs(r - cell_long) <= 1 for r in r_hits)

    meas = res.measurements_long
    valid = np.asarray(meas.valid)
    vels = np.asarray(meas.velocity_ms)[valid]
    assert any(abs(v - v_expected) < 0.2 for v in vels), (vels, v_expected)

    ranges = np.asarray(meas.range_m)[valid]
    r_expected = (
        cell_long * prof.delta_r
        + chain_cfg.r_sys_err_long
        - chain_cfg.r_measure_err_long
    )
    assert any(abs(r - r_expected) < prof.delta_r for r in ranges)

    # monopulse: ratio = (|R|-|L|)/(|L|+|R|) = -0.2/1.8; K from table
    k = angle_k_values(chain_cfg.sys_num)[5, 2]
    expected_ele = 2 * 5.0 + 2.5 - (-0.2 / 1.8) * k
    eles = np.asarray(meas.elevation_deg)[valid]
    assert any(abs(e - expected_ele) < 0.5 for e in eles), (eles, expected_ele)


def test_g0_angle_compensation():
    chain = G0Chain()
    # rem(angle + 29.01 + 5.9, 360)
    np.testing.assert_allclose(chain.compensate_angle(np.array([0.0])), [34.91])
    np.testing.assert_allclose(chain.compensate_angle(np.array([350.0])), [24.91])


def test_g1_validation_chain_recovers_target(rng):
    prof = G1_PROFILE
    v_true, r_true = -5.7, 320.0
    d = int(round(r_true / prof.delta_r))  # 53

    target = synthesize_target_echo(prof, v_true, r_true, n_pulses=prof.prt_per_frame)
    clutter = synthetic_clutter(prof, seed=7)
    echo = apply_scr(target, clutter, 15.0, prof) + clutter

    rdm = np.asarray(g1_validation_chain(jnp.asarray(echo), prof))
    assert rdm.shape == (prof.prt_per_frame, 868)

    vi, ri = np.unravel_index(np.argmax(rdm), rdm.shape)
    v_axis = prof.velocity_axis(prof.prt_per_frame)
    assert abs(v_axis[vi] - v_true) < 0.3
    # mid-segment source col 82+53=135 maps to concat col 82+(135-89)=128
    # (fun_lss_range_concate.m, matched-filter peak-at-pulse-start
    # convention); the narrow FIR path peaks a few cells past the pulse
    # start (low-pass taps, not a matched filter — same in the reference,
    # cf. the "+12 points" remark at fun_lss_pulse_compression.m:54)
    assert ri == 128 or d <= ri <= d + 4, ri
    # the mid-segment matched-filter peak is at its exact cell regardless
    mid_peak = int(np.argmax(rdm[vi, 82:318])) + 82
    assert mid_peak == 128, mid_peak


def test_g1_chain_notch_suppresses_stationary(rng):
    prof = G1_PROFILE
    clutter = synthetic_clutter(prof, seed=1, scatterer_power=1e6)
    rdm = np.asarray(g1_validation_chain(jnp.asarray(clutter), prof))
    n = prof.prt_per_frame
    center = int(np.floor(n / 2 + 0.5)) - 1
    hw = int(np.floor(n / 150 + 0.5))
    assert np.all(rdm[center - hw : center + hw + 1, :] == 0)
    # stationary scatterer energy is confined to the notched band: outside it
    # the spectrum is noise-level
    outside = np.delete(rdm, np.s_[center - hw : center + hw + 1], axis=0)
    assert outside.max() < rdm.max() + 1  # sanity: no inf/nan



def test_g0_pc_and_mtd_match_numpy_oracle(rng):
    """G0 frequency-domain matched filter + slow-time FFT vs direct NumPy."""
    prof = G0_PROFILE
    chain = G0Chain(prof, G0ChainConfig(), freq_index=5, beam_pos=0)
    n, pts = prof.prt_per_frame, prof.point_prt
    left = rng.standard_normal((n, pts)) + 1j * rng.standard_normal((n, pts))
    right = rng.standard_normal((n, pts)) + 1j * rng.standard_normal((n, pts))

    short_mf, long_mf = chain._pc(jnp.asarray(left), jnp.asarray(right))

    # oracle: matchF2 = conj(fft(win*mf, 512)); per-row ifft(fft(echo)*matchF2)
    ts = prof.ts
    tau2 = prof.pulse_widths[1]
    n2 = int(round(tau2 / ts))
    t2 = np.arange(n2) * ts - tau2 / 2.0
    mf = np.exp(1j * np.pi * (prof.bandwidth / tau2) * t2**2)
    mf = mf / np.linalg.norm(mf)
    win = np.kaiser(n2, 4.5)
    match_spec = np.conj(np.fft.fft(mf * win, 512))
    long_echo = left[:, 62:]
    want = np.fft.ifft(np.fft.fft(long_echo, 512, axis=1) * match_spec[None, :], axis=1)
    np.testing.assert_allclose(np.asarray(long_mf[0]), want, rtol=1e-9, atol=1e-9)

    # oracle MTD: fft(mf * hamming(n), 2048, axis=0), unshifted
    w = np.hamming(n)
    mtd = chain._mtd(jnp.asarray(want[None]))
    want_mtd = np.fft.fft(want * w[:, None], 2048, axis=0)
    np.testing.assert_allclose(np.asarray(mtd[0]), want_mtd, rtol=1e-9, atol=1e-7)


def test_g0_split_path_matches_one_executable():
    """The CPU Python-composed G0 chain matches the single-jit chain.

    XLA CPU's threaded 2048-point padded FFT is nondeterministic ACROSS
    CALLS of one executable (two observed outcomes, ~1e-2 absolute spread
    on the |R|-|L| monopulse difference where cancellation amplifies it),
    so RDM fields are compared with tolerances sized to that spread, not
    bit-exactly.  The CFAR cascade IS bit-stable given the same RDM
    (lockstep contract), so the split path's flags must equal the cascade
    recomputed from its own returned RDM exactly.
    """
    from radar_signal_process_tpu.config import G0_PROFILE
    from radar_signal_process_tpu.models.g0_chain import G0Chain
    from radar_signal_process_tpu.ops.cfar import cascaded_cfar2d

    rng = np.random.default_rng(5)
    prof = G0_PROFILE
    shape = (prof.prt_per_frame, prof.point_prt)
    left = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        np.complex64
    )
    right = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        np.complex64
    )
    split_chain = G0Chain(prof, use_split=True)
    res_split = split_chain.process_frame(left, right)
    res_one = G0Chain(prof, use_split=False).process_frame(left, right)

    for name in ("rdm_sum_short", "rdm_sum_long", "rdm_diff_short",
                 "rdm_diff_long"):
        np.testing.assert_allclose(
            np.asarray(getattr(res_split, name)),
            np.asarray(getattr(res_one, name)),
            rtol=1e-3, atol=0.05, err_msg=name,
        )
    # flags: bit-exact against the one-exec cascade run on the SPLIT path's
    # own RDM (same-input bit-stability is the contract; cross-executable
    # RDM ULP differences can legally flip threshold-margin cells)
    want_f, want_v = cascaded_cfar2d(
        res_split.rdm_sum_short, prof.cfar, split_chain.n_clutter
    )
    np.testing.assert_array_equal(np.asarray(res_split.flags_short),
                                  np.asarray(want_f))
    np.testing.assert_array_equal(np.asarray(res_split.vflags_short),
                                  np.asarray(want_v))
    want_f, want_v = cascaded_cfar2d(
        res_split.rdm_sum_long, prof.cfar, split_chain.n_clutter
    )
    np.testing.assert_array_equal(np.asarray(res_split.flags_long),
                                  np.asarray(want_f))
    np.testing.assert_array_equal(np.asarray(res_split.vflags_long),
                                  np.asarray(want_v))
