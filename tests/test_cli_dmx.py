"""End-to-end DMX CLI test: G1-format capture -> G0 chain -> measurements."""

import json

import numpy as np

import radar_signal_process_tpu.cli as cli
from radar_signal_process_tpu.config import G0_PROFILE, G0ChainConfig
from radar_signal_process_tpu.models.g0_chain import G0Chain
from radar_signal_process_tpu.ops.waveforms import reference_pulses
from radar_signal_process_tpu.sim.packets_synth import write_g1_capture


def _g0_capture(tmp_path, rng, fd, cell_long):
    prof = G0_PROFILE
    n = prof.prt_per_frame
    p_short, p_long = reference_pulses(prof)
    m = np.arange(n)
    ramp = np.exp(1j * 2 * np.pi * fd * m * prof.prt)
    base = np.zeros((n, prof.point_prt), dtype=np.complex128)
    s0, s1 = prof.segment_starts
    base[:, s0 + 20 : s0 + 20 + len(p_short)] += ramp[:, None] * p_short[None, :]
    span = min(len(p_long), prof.segment_points[1] - cell_long)
    base[:, s1 + cell_long : s1 + cell_long + span] += ramp[:, None] * p_long[None, :span]
    noise = rng.standard_normal((2, n, prof.point_prt)) * 0.5
    scale = 5000.0
    left = np.round(scale * base.real + noise[0]) + 1j * np.round(scale * base.imag)
    right = np.round(0.8 * scale * base.real + noise[1]) + 1j * np.round(
        0.8 * scale * base.imag
    )
    write_g1_capture(
        str(tmp_path), left[None], right[None], frames_per_file=10, angle_deg=100.0
    )
    return prof


def test_dmx_cli_end_to_end(tmp_path, rng, capsys):
    prof = G0_PROFILE
    chain_cfg = G0ChainConfig()
    delta_dop = prof.prf / chain_cfg.mtd_fft_length
    fd = -60 * delta_dop
    cell_long = 100
    _g0_capture(tmp_path, rng, fd, cell_long)

    assert cli.main([
        "dmx", "--input", str(tmp_path), "--frames", "1",
        "--freq-index", "5", "--beam-pos", "2",
    ]) == 0
    out = json.loads(capsys.readouterr().out)
    frame = out["frames"][0]
    # azimuth: 100 deg + north compensation (29.01 + 5.9)
    assert abs(frame["azimuth_deg"] - (100.0 + 29.01 + 5.9)) < 0.2

    chain = G0Chain(prof, chain_cfg, 5, 2)
    v_expected = -chain.wavelength * fd / 2.0
    r_expected = (
        cell_long * prof.delta_r
        + chain_cfg.r_sys_err_long
        - chain_cfg.r_measure_err_long
    )
    vels = frame["long"]["velocity_ms"]
    rngs = frame["long"]["range_m"]
    assert any(abs(v - v_expected) < 0.3 for v in vels), (vels, v_expected)
    assert any(abs(r - r_expected) < 2 * prof.delta_r for r in rngs)


def test_dmx_cli_save_results(tmp_path, rng, capsys):
    """--save-results writes resultData_<clock>.mat with the config echo
    (DMX_SignalProcessing_main_xzr.m:603-612)."""
    import scipy.io as sio

    prof = G0_PROFILE
    chain_cfg = G0ChainConfig()
    fd = -60 * prof.prf / chain_cfg.mtd_fft_length
    _g0_capture(tmp_path, rng, fd, 100)
    results_dir = tmp_path / "results"

    assert cli.main([
        "dmx", "--input", str(tmp_path), "--frames", "1",
        "--freq-index", "5", "--beam-pos", "2",
        "--save-results", str(results_dir),
    ]) == 0
    out = json.loads(capsys.readouterr().out)
    m = sio.loadmat(out["result_mat"], squeeze_me=True)
    # config echo present (window type, CFAR-era knobs, interp factors)
    assert m["pc_window"] == "kaiser"
    assert m["mtd_fft_length"] == chain_cfg.mtd_fft_length
    assert m["r_interp_times"] == chain_cfg.r_interp_times
    assert str(m["orgDataFilePath"]) == str(tmp_path)
    # estimate series match the JSON output
    est = m["resultEst_Struct"]["long"].item()
    vels = np.atleast_1d(est["vEst"].item())
    assert sorted(np.round(vels, 6)) == sorted(
        np.round(out["frames"][0]["long"]["velocity_ms"], 6).tolist()
    )
