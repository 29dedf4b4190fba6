"""End-to-end CLI test: simulate -> ingest -> mtd -> detect over the file bus,
plus the fused in-memory e2e command, on a reduced G2 geometry."""

import dataclasses
import json

import numpy as np
import pytest

import radar_signal_process_tpu.cli as cli
from radar_signal_process_tpu.config import G2_PROFILE, PROFILES
from radar_signal_process_tpu.utils import load_frame

# reduced geometry: 32 PRT x 344 samples x 2 channels, segments scaled down
TINY = dataclasses.replace(
    G2_PROFILE,
    prt_per_frame=32,
    point_prt=344,
    segment_points=(24, 80, 240),
    n_channels=2,
    n_beams=2,
)


@pytest.fixture(autouse=True)
def tiny_profile(monkeypatch):
    monkeypatch.setitem(PROFILES, "TINY", TINY)
    yield


def test_cli_pipeline_roundtrip(tmp_path, capsys):
    cap = str(tmp_path / "capture")
    frames_dir = str(tmp_path / "frames")
    rdm_dir = str(tmp_path / "rdm")
    det_dir = str(tmp_path / "det")

    # target at 60 m -> segment-local cell 10 (delta_r = 6 m)
    assert cli.main([
        "simulate", "--output", cap, "--profile", "TINY", "--frames", "3",
        "--velocity", "-5.7", "--range", "60", "--scr", "25",
        "--file-bytes", "40000",
    ]) == 0
    assert cli.main([
        "ingest", "--input", cap, "--output", frames_dir, "--profile", "TINY",
        "--frames", "3",
    ]) == 0
    arrays, prof, _ = load_frame(frames_dir, 0)
    assert prof == TINY
    assert arrays["iq"].shape == (32, 344, 2)

    assert cli.main([
        "mtd", "--input", frames_dir, "--output", rdm_dir, "--profile", "TINY",
        "--frames", "2", "--win-size", "2",
    ]) == 0
    arrays, _, meta = load_frame(rdm_dir, 0)
    assert arrays["rdm"].shape == (2, 2, 32, 344)
    assert meta["win_size"] == 2

    assert cli.main([
        "detect", "--input", rdm_dir, "--output", det_dir, "--profile", "TINY",
        "--frames", "2", "--threshold", "5",
    ]) == 0
    arrays, _, _ = load_frame(det_dir, 0)
    assert arrays["flags"].shape == (2, 2, 32, 344)

    # detections include the target's mid-segment cell (col 24+10) in beam 0
    valid = arrays["det_valid"][0, 0]
    cols = set(arrays["det_r"][0, 0][valid].tolist())
    assert any(abs(c - 34) <= 1 or abs(c - (104 + 10)) <= 1 for c in cols), cols

    # optional K12 per-detection Doppler widths (--spectral-width-db)
    width_dir = str(tmp_path / "det_w")
    assert cli.main([
        "detect", "--input", rdm_dir, "--output", width_dir, "--profile",
        "TINY", "--frames", "1", "--threshold", "5",
        "--spectral-width-db", "-15.0",
    ]) == 0
    w_arrays, _, _ = load_frame(width_dir, 0)
    assert w_arrays["det_width"].shape == w_arrays["det_amp"].shape
    import jax.numpy as jnp

    from radar_signal_process_tpu.ops.spectrum import detection_spectral_widths

    rdm0 = load_frame(rdm_dir, 0)[0]["rdm"]
    want = np.asarray(detection_spectral_widths(
        jnp.asarray(rdm0), jnp.asarray(w_arrays["det_r"]), -15.0,
    ))
    np.testing.assert_array_equal(w_arrays["det_width"], want)


def test_cli_e2e_json(tmp_path, capsys):
    cap = str(tmp_path / "capture")
    cli.main([
        "simulate", "--output", cap, "--profile", "TINY", "--frames", "3",
        "--velocity", "4.0", "--range", "60", "--scr", "25",
    ])
    capsys.readouterr()
    assert cli.main([
        "e2e", "--input", cap, "--profile", "TINY", "--frames", "2",
        "--win-size", "2",
    ]) == 0
    out = json.loads(capsys.readouterr().out)
    assert len(out["frames"]) == 2
    assert all(len(f["detections"]) > 0 for f in out["frames"])
    # detection rows are [beam, win, v, r, amp] over EVERY (beam, slice)
    # (main_cfar.m:85-96); the injected target appears in both beams and
    # in a slice != 0
    rows = out["frames"][0]["detections"]
    assert all(len(r) == 5 for r in rows)
    assert {r[0] for r in rows} == {0, 1}
    assert any(r[1] == 1 for r in rows)


def test_cli_ingest_idempotent(tmp_path, capsys):
    cap = str(tmp_path / "capture")
    frames_dir = str(tmp_path / "frames")
    cli.main(["simulate", "--output", cap, "--profile", "TINY", "--frames", "2"])
    assert cli.main([
        "ingest", "--input", cap, "--output", frames_dir, "--profile", "TINY",
        "--frames", "2",
    ]) == 0
    before = load_frame(frames_dir, 0)[0]["iq"]
    # second run skips existing frames (frame-keyed resume)
    assert cli.main([
        "ingest", "--input", cap, "--output", frames_dir, "--profile", "TINY",
        "--frames", "2",
    ]) == 0
    after = load_frame(frames_dir, 0)[0]["iq"]
    np.testing.assert_array_equal(before, after)


def test_cli_e2e_mesh_matches_single_device(tmp_path, capsys, monkeypatch):
    """`e2e --mesh dpxsp` (sharded window) == the single-device e2e output."""
    tinym = dataclasses.replace(
        TINY, cfar_segments=((0, 24), (24, 104), (104, 344))
    )
    monkeypatch.setitem(PROFILES, "TINYM", tinym)
    cap = str(tmp_path / "capture")
    assert cli.main([
        "simulate", "--output", cap, "--profile", "TINYM", "--frames", "3",
        "--velocity", "-5.7", "--range", "60", "--scr", "25",
    ]) == 0

    def run(extra):
        assert cli.main([
            "e2e", "--input", cap, "--profile", "TINYM", "--frames", "2",
            "--beam", "0", "--win-slice", "1", *extra,
        ]) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    plain = run([])
    # dp=2 pads the 2-beam batch evenly; sp=2 shards the 344-pt range axis
    meshed = run(["--mesh", "2x2"])
    # the mesh path processes one window slice; compare against the plain
    # output filtered to that slice
    for fp, fm in zip(plain["frames"], meshed["frames"]):
        assert fm["frame"] == fp["frame"]
        want = [r for r in fp["detections"] if r[1] == 1]
        assert sorted(fm["detections"]) == sorted(want)
    assert any(f["detections"] for f in plain["frames"])


def test_cli_ingest_g1_roundtrip(tmp_path, capsys, monkeypatch):
    """`cli ingest --profile G1` (VERDICT r2 item 3): stage-1 artifacts are
    bit-equal to the packet reader's output, and the G1 artifacts flow on
    through mtd and detect (the reference's G1 stage-1 driver
    ``MatlabProcess_xuzerui/bin_to_mat_xzr.m`` + downstream stages)."""
    from radar_signal_process_tpu.config import G1_PROFILE
    from radar_signal_process_tpu.ingest import native_available
    from radar_signal_process_tpu.ingest.packets import G1FrameReader
    from radar_signal_process_tpu.sim.packets_synth import write_g1_capture
    from radar_signal_process_tpu.utils import matbus

    tg1 = dataclasses.replace(
        G1_PROFILE,
        prt_per_frame=32,
        point_prt=344,
        segment_points=(24, 80, 240),
        cfar_segments=((0, 24), (24, 104), (104, 344)),
    )
    monkeypatch.setitem(PROFILES, "TG1", tg1)

    rng = np.random.default_rng(7)
    shape = (3, 32, 344)
    left = rng.integers(-60000, 60000, shape) + 1j * rng.integers(-60000, 60000, shape)
    right = rng.integers(-60000, 60000, shape) + 1j * rng.integers(-60000, 60000, shape)
    cap = tmp_path / "capture"
    write_g1_capture(str(cap), left, right, frames_per_file=2, angle_deg=33.0)

    frames_dir = str(tmp_path / "frames")
    assert cli.main([
        "ingest", "--input", str(cap), "--output", frames_dir,
        "--profile", "TG1", "--frames", "3", "--frames-per-file", "2",
    ]) == 0

    # bit-equality with the packet reader the CLI used (native or NumPy)
    reader_cls = G1FrameReader
    if native_available():
        from radar_signal_process_tpu.ingest.native_loader import NativeG1FrameReader

        reader_cls = NativeG1FrameReader
    reader = reader_cls(str(cap), prt_num=32, point_prt=344, frames_per_file=2)
    for f in range(3):
        l_ref, r_ref, ang_ref, meta_ref = reader.read_frame(f + 1)
        arrays, prof, meta = load_frame(frames_dir, f)
        assert prof == tg1
        np.testing.assert_array_equal(arrays["iq"][..., 0], l_ref)
        np.testing.assert_array_equal(arrays["iq"][..., 1], r_ref)
        np.testing.assert_array_equal(arrays["servo_angle"], ang_ref)
        assert meta["freq_index"] == meta_ref["freq_index"]

    # the MATLAB-bus form writes the reference's echoData_Frame_0/1 contract
    mat_dir = str(tmp_path / "frames_mat")
    assert cli.main([
        "ingest", "--input", str(cap), "--output", mat_dir,
        "--profile", "TG1", "--frames", "1", "--frames-per-file", "2",
        "--format", "mat",
    ]) == 0
    iq_mat, ang_mat = matbus.load_frame_mat(matbus.mat_frame_path(mat_dir, 0))
    l_ref, r_ref, ang_ref, _ = reader.read_frame(1)
    np.testing.assert_array_equal(iq_mat[..., 0], l_ref)
    np.testing.assert_array_equal(ang_mat, ang_ref)

    # downstream stages consume the G1 artifacts unchanged
    rdm_dir = str(tmp_path / "rdm")
    det_dir = str(tmp_path / "det")
    assert cli.main([
        "mtd", "--input", frames_dir, "--output", rdm_dir, "--profile", "TG1",
        "--frames", "2", "--win-size", "2",
    ]) == 0
    arrays, _, _ = load_frame(rdm_dir, 0)
    assert arrays["rdm"].shape == (2, 2, 32, 344)
    assert cli.main([
        "detect", "--input", rdm_dir, "--output", det_dir, "--profile", "TG1",
        "--frames", "2", "--threshold", "5",
    ]) == 0
    arrays, _, _ = load_frame(det_dir, 0)
    assert arrays["flags"].shape == (2, 2, 32, 344)


def test_stc_curve_loader(tmp_path):
    """textread('%f') contract (fun_iSTC.m:5-6): whitespace-separated
    floats load; the reference's shipped binary flight log fails loud."""
    import os

    import pytest

    from radar_signal_process_tpu.utils.dataset import load_stc_curve

    p = tmp_path / "stcCurve.txt"
    p.write_text("0.0 -1.5\n-3.0\t-4.5\n  -6.0\n")
    np.testing.assert_array_equal(
        load_stc_curve(str(p)), [0.0, -1.5, -3.0, -4.5, -6.0]
    )
    bad = tmp_path / "bad.txt"
    bad.write_text("1.0 oops 2.0")
    with pytest.raises(ValueError, match="non-numeric"):
        load_stc_curve(str(bad))

    dji = ("/root/reference/MatlabProcess_xuzerui/"
           "DJIFlightRecord_2022-04-20_[10-31-47].txt")
    if os.path.exists(dji):
        # the snapshot's fixture is a binary DJI log, not a float curve —
        # MATLAB's textread errors on it too; we document and fail loud
        with pytest.raises(ValueError, match="binary"):
            load_stc_curve(dji)


def test_cli_mtd_istc_changes_rdm(tmp_path, capsys):
    """`mtd --istc curve.txt` applies fun_iSTC.m:12-15 gain before
    compression; output matches the batched processor with the same curve
    and differs from the uncompensated run."""
    import jax.numpy as jnp

    from radar_signal_process_tpu.models.mtd_pipeline import make_frame_processor

    cap = str(tmp_path / "capture")
    frames_dir = str(tmp_path / "frames")
    cli.main(["simulate", "--output", cap, "--profile", "TINY", "--frames", "3"])
    cli.main(["ingest", "--input", cap, "--output", frames_dir,
              "--profile", "TINY", "--frames", "3"])
    curve = tmp_path / "stcCurve.txt"
    curve_db = np.linspace(20.0, 0.0, 40)
    curve.write_text("\n".join(f"{v:.6f}" for v in curve_db))

    plain_dir = str(tmp_path / "rdm_plain")
    istc_dir = str(tmp_path / "rdm_istc")
    assert cli.main(["mtd", "--input", frames_dir, "--output", plain_dir,
                     "--profile", "TINY", "--frames", "1", "--win-size", "2"]) == 0
    assert cli.main(["mtd", "--input", frames_dir, "--output", istc_dir,
                     "--profile", "TINY", "--frames", "1", "--win-size", "2",
                     "--istc", str(curve)]) == 0
    plain, _, meta0 = load_frame(plain_dir, 0)
    comp, _, meta1 = load_frame(istc_dir, 0)
    assert meta0["istc"] is False and meta1["istc"] is True
    assert not np.array_equal(plain["rdm"], comp["rdm"])

    # golden: batched jitted processor with the istc profile; compare with
    # the curve as LOADED (the %.6f text round-trip perturbs the values)
    from radar_signal_process_tpu.utils.dataset import load_stc_curve

    curve_db = load_stc_curve(str(curve))
    prof = dataclasses.replace(
        TINY, mtd=dataclasses.replace(TINY.mtd, istc=True)
    )
    a, _, _ = load_frame(frames_dir, 0)
    b, _, _ = load_frame(frames_dir, 1)
    proc = make_frame_processor(prof, win_size=2, stc_curve_db=curve_db)
    want = np.asarray(proc(
        jnp.asarray(np.moveaxis(a["iq"], -1, 0), jnp.complex64),
        jnp.asarray(np.moveaxis(b["iq"], -1, 0), jnp.complex64),
    ))
    np.testing.assert_array_equal(comp["rdm"], want)


def test_cli_analyze_animations(tmp_path, capsys):
    """`analyze --animate all` writes the V1 animation artifacts
    (fun_plot_visualizations.m:33-63) alongside the dashboard."""
    import os

    cap = str(tmp_path / "capture")
    frames_dir = str(tmp_path / "frames")
    rdm_dir = str(tmp_path / "rdm")
    out_dir = str(tmp_path / "viz")
    cli.main(["simulate", "--output", cap, "--profile", "TINY", "--frames", "3"])
    cli.main(["ingest", "--input", cap, "--output", frames_dir,
              "--profile", "TINY", "--frames", "3"])
    cli.main(["mtd", "--input", frames_dir, "--output", rdm_dir,
              "--profile", "TINY", "--frames", "1", "--win-size", "2"])
    capsys.readouterr()
    assert cli.main([
        "analyze", "--input", rdm_dir, "--output", out_dir, "--profile", "TINY",
        "--frame", "0", "--animate", "all", "--stage1-input", frames_dir,
        "--animate-step", "16", "--animate-frames", "3",
    ]) == 0
    outs = capsys.readouterr().out.strip().splitlines()
    assert len(outs) == 3  # dashboard + doppler gif + pc gif
    assert outs[1].endswith("doppler_anim.gif") and os.path.getsize(outs[1]) > 500
    assert outs[2].endswith("pc_anim.gif") and os.path.getsize(outs[2]) > 500


def test_cli_ingest_g1_debug_plots(tmp_path, monkeypatch):
    """--debug-plots writes the Show_Read-style I/Q panel per frame
    (Show_Read.m:127-136)."""
    import os

    from radar_signal_process_tpu.config import G1_PROFILE
    from radar_signal_process_tpu.sim.packets_synth import write_g1_capture

    tg1 = dataclasses.replace(
        G1_PROFILE, prt_per_frame=8, point_prt=64,
        segment_points=(16, 16, 32), cfar_segments=((0, 64),),
    )
    monkeypatch.setitem(PROFILES, "TG1D", tg1)
    rng = np.random.default_rng(3)
    shape = (2, 8, 64)
    left = rng.integers(-100, 100, shape) + 1j * rng.integers(-100, 100, shape)
    cap = tmp_path / "cap"
    write_g1_capture(str(cap), left, left * 2, frames_per_file=5)
    dbg = tmp_path / "dbg"
    assert cli.main([
        "ingest", "--input", str(cap), "--output", str(tmp_path / "fr"),
        "--profile", "TG1D", "--frames", "2", "--frames-per-file", "5",
        "--debug-plots", str(dbg),
    ]) == 0
    assert sorted(os.listdir(dbg)) == ["iq_frame_0.png", "iq_frame_1.png"]


def test_cli_stream(tmp_path, capsys, monkeypatch):
    """`cli stream` drives the StreamingPipeline: all-beam detections,
    per-frame hit counters and latency stats."""
    # segments that actually tile the reduced 344-pt range extent (the
    # sharded path drops non-tiling segment tables; the host path must run
    # the same split for the mesh comparison below)
    tinys = dataclasses.replace(
        TINY, cfar_segments=((0, 24), (24, 104), (104, 344))
    )
    monkeypatch.setitem(PROFILES, "TINYS", tinys)
    cap = str(tmp_path / "capture")
    cli.main(["simulate", "--output", cap, "--profile", "TINYS", "--frames", "4",
              "--velocity", "4.0", "--range", "60", "--scr", "25"])
    capsys.readouterr()
    assert cli.main([
        "stream", "--input", cap, "--profile", "TINYS", "--frames", "4",
        "--win-size", "2",
    ]) == 0
    out = json.loads(capsys.readouterr().out)
    assert [f["frame"] for f in out["frames"]] == [0, 1, 2]
    assert out["counters"]["frames_ingested"] == 4
    assert out["counters"]["windows_processed"] == 3
    for f in out["frames"]:
        assert f["cfar_hits"] > 0
        assert len(f["detections_per_beam"]) == 2  # per-beam counts

    # --emit detections: no RDM/flag stacks materialize, but the hit
    # counters and detection counts are identical (VERDICT r5 item 1)
    assert cli.main([
        "stream", "--input", cap, "--profile", "TINYS", "--frames", "4",
        "--win-size", "2", "--emit", "detections",
    ]) == 0
    out_det = json.loads(capsys.readouterr().out)
    for fd, fh in zip(out_det["frames"], out["frames"]):
        assert fd["cfar_hits"] == fh["cfar_hits"]
        assert fd["detections_per_beam"] == fh["detections_per_beam"]

    # --mesh: dp over beams, sp slow-time->range, on-device PC-reuse carry;
    # the per-frame hit counts match the host streaming path
    assert cli.main([
        "stream", "--input", cap, "--profile", "TINYS", "--frames", "4",
        "--win-size", "2", "--mesh", "2x4",
    ]) == 0
    out_mesh = json.loads(capsys.readouterr().out)
    assert [f["frame"] for f in out_mesh["frames"]] == [0, 1, 2]
    for fm, fh in zip(out_mesh["frames"], out["frames"]):
        assert fm["cfar_hits"] == fh["cfar_hits"]
        assert fm["detections_per_beam"] == fh["detections_per_beam"]


def test_cli_mtd_g1_two_beam_mat_contract(tmp_path, monkeypatch):
    """G1 stage-2 --format mat writes the MTD_0/MTD_1 variable pair
    (MTD/main_produce_dataset_win_xzr.m:37-42)."""
    import scipy.io as sio

    from radar_signal_process_tpu.config import G1_PROFILE
    from radar_signal_process_tpu.sim.packets_synth import write_g1_capture
    from radar_signal_process_tpu.utils import matbus

    tg1 = dataclasses.replace(
        G1_PROFILE, prt_per_frame=16, point_prt=344,
        segment_points=(24, 80, 240), cfar_segments=((0, 24), (24, 104), (104, 344)),
    )
    monkeypatch.setitem(PROFILES, "TG1M", tg1)
    rng = np.random.default_rng(5)
    shape = (2, 16, 344)
    left = rng.integers(-500, 500, shape) + 1j * rng.integers(-500, 500, shape)
    cap = tmp_path / "cap"
    write_g1_capture(str(cap), left, 2 * left, frames_per_file=5)
    fr, rdm = str(tmp_path / "fr"), str(tmp_path / "rdm")
    assert cli.main(["ingest", "--input", str(cap), "--output", fr,
                     "--profile", "TG1M", "--frames", "2",
                     "--frames-per-file", "5"]) == 0
    assert cli.main(["mtd", "--input", fr, "--output", rdm,
                     "--profile", "TG1M", "--frames", "1", "--win-size", "2",
                     "--format", "mat"]) == 0
    m = sio.loadmat(matbus.mat_frame_path(rdm, 0))
    assert "MTD_0" in m and "MTD_1" in m and "MTD_win_all_beams" not in m
    # and the generic loader reads the pair back as a (2, ...) stack
    stack = matbus.load_mtd_mat(matbus.mat_frame_path(rdm, 0))
    assert stack.shape == (2, 2, 16, 344)


def test_cli_ingest_g1_eos_stops_cleanly(tmp_path, monkeypatch):
    """Requesting more frames than the capture holds ends the run cleanly
    with both the native (IOError rc) and NumPy (FileNotFoundError)
    readers — regression for the round-3 EOS handling."""
    import os

    from radar_signal_process_tpu.config import G1_PROFILE
    from radar_signal_process_tpu.sim.packets_synth import write_g1_capture
    from radar_signal_process_tpu.utils.manifest import frame_path

    tg1 = dataclasses.replace(
        G1_PROFILE, prt_per_frame=8, point_prt=64,
        segment_points=(16, 16, 32), cfar_segments=((0, 64),),
    )
    monkeypatch.setitem(PROFILES, "TG1E", tg1)
    rng = np.random.default_rng(9)
    l = rng.integers(-100, 100, (3, 8, 64)) + 0j
    cap = tmp_path / "cap"
    write_g1_capture(str(cap), l, l, frames_per_file=2)
    for native in ("--native", "--no-native"):
        out = str(tmp_path / f"fr{native}")
        assert cli.main([
            "ingest", "--input", str(cap), "--output", out,
            "--profile", "TG1E", "--frames", "6", "--frames-per-file", "2",
            native,
        ]) == 0
        assert os.path.exists(frame_path(out, 2))
        assert not os.path.exists(frame_path(out, 3))


def test_cli_detect_threshold_sweep(tmp_path, capsys):
    """`detect --thresholds ...` (main_cfar.m:40): one output dir per
    threshold, flags at any T bit-equal to the single-threshold run."""
    import os

    cap = str(tmp_path / "capture")
    frames_dir = str(tmp_path / "frames")
    rdm_dir = str(tmp_path / "rdm")
    cli.main(["simulate", "--output", cap, "--profile", "TINY", "--frames", "3",
              "--velocity", "-5.7", "--range", "60", "--scr", "25"])
    cli.main(["ingest", "--input", cap, "--output", frames_dir,
              "--profile", "TINY", "--frames", "3"])
    cli.main(["mtd", "--input", frames_dir, "--output", rdm_dir,
              "--profile", "TINY", "--frames", "2", "--win-size", "2"])

    single_dir = str(tmp_path / "det_single")
    assert cli.main(["detect", "--input", rdm_dir, "--output", single_dir,
                     "--profile", "TINY", "--frames", "2",
                     "--threshold", "5"]) == 0
    sweep_base = str(tmp_path / "det")
    assert cli.main(["detect", "--input", rdm_dir, "--output", sweep_base,
                     "--profile", "TINY", "--frames", "2",
                     "--thresholds", "3", "5", "8"]) == 0
    for t in ("3", "5", "8"):
        assert os.path.isdir(f"{sweep_base}_T{t}"), t
    for f in range(2):
        want = load_frame(single_dir, f)[0]
        got = load_frame(f"{sweep_base}_T5", f)[0]
        np.testing.assert_array_equal(got["flags"], want["flags"])
        np.testing.assert_array_equal(got["vflags"], want["vflags"])
        np.testing.assert_array_equal(got["det_r"], want["det_r"])
    # lower threshold flags a superset of cells
    f3 = load_frame(f"{sweep_base}_T3", 0)[0]["flags"]
    f8 = load_frame(f"{sweep_base}_T8", 0)[0]["flags"]
    assert f3.sum() >= f8.sum()

    # MATLAB-bus form writes the reference's cfarFlag{win}_T{t} directories
    mat_base = str(tmp_path / "det_mat")
    assert cli.main(["detect", "--input", rdm_dir, "--output", mat_base,
                     "--profile", "TINY", "--frames", "1",
                     "--thresholds", "5", "--format", "mat"]) == 0
    assert os.path.isdir(os.path.join(mat_base, "cfarFlag2_T5"))


def test_cli_mtd_match_waveform(tmp_path, capsys):
    """--match-waveform feeds measured pulses into stage 2 (both CPU
    stream and jitted paths produce the overridden RDMs)."""
    import jax.numpy as jnp

    from radar_signal_process_tpu.models.mtd_pipeline import mtd_window_produce
    from radar_signal_process_tpu.ops.waveforms import pulses_with_overrides

    cap = str(tmp_path / "capture")
    frames_dir = str(tmp_path / "frames")
    rdm_dir = str(tmp_path / "rdm_mw")
    assert cli.main([
        "simulate", "--output", cap, "--profile", "TINY", "--frames", "3",
        "--velocity", "-5.7", "--range", "60", "--scr", "25",
    ]) == 0
    assert cli.main([
        "ingest", "--input", cap, "--output", frames_dir, "--profile", "TINY",
        "--frames", "3",
    ]) == 0

    # a measured mid-segment waveform (synthesized LFM with a known tweak)
    rng = np.random.default_rng(3)
    wf = (np.exp(1j * np.pi * np.linspace(-1, 1, 40) ** 2)
          * (1.0 + 0.05 * rng.standard_normal(40)))
    wf_path = str(tmp_path / "mw.npz")
    np.savez(wf_path, refData=wf)

    assert cli.main([
        "mtd", "--input", frames_dir, "--output", rdm_dir, "--profile",
        "TINY", "--frames", "1", "--win-size", "2",
        "--match-waveform", f"1={wf_path}:refData",
    ]) == 0
    arrays, _, _ = load_frame(rdm_dir, 0)

    f0, _, _ = load_frame(frames_dir, 0)
    f1, _, _ = load_frame(frames_dir, 1)
    win = np.concatenate(
        [np.moveaxis(f0["iq"], -1, 0), np.moveaxis(f1["iq"], -1, 0)], axis=-2
    )
    pulses = pulses_with_overrides(TINY, {1: wf})
    want = np.asarray(mtd_window_produce(
        jnp.asarray(win, jnp.complex64), TINY, 2, pulses=pulses
    ))
    np.testing.assert_array_equal(arrays["rdm"], want)
    # and differs from the synthesized-pulse output
    base = np.asarray(mtd_window_produce(jnp.asarray(win, jnp.complex64), TINY, 2))
    assert not np.array_equal(arrays["rdm"], base)


def test_cli_stream_istc_and_match_waveform(tmp_path, capsys, monkeypatch):
    """stream threads the stage-2 hooks (--istc / --match-waveform): the
    streamed RDM-derived hit counts change accordingly and match the mtd
    stage run with the same hooks."""
    import jax.numpy as jnp

    from radar_signal_process_tpu.models.mtd_pipeline import mtd_window_produce
    from radar_signal_process_tpu.models.host_parallel import make_cpu_flags
    from radar_signal_process_tpu.ops.waveforms import pulses_with_overrides
    from radar_signal_process_tpu.utils import load_frame

    tinys = dataclasses.replace(
        TINY, cfar_segments=((0, 24), (24, 104), (104, 344))
    )
    monkeypatch.setitem(PROFILES, "TINYS2", tinys)
    cap = str(tmp_path / "capture")
    cli.main(["simulate", "--output", cap, "--profile", "TINYS2", "--frames",
              "3", "--velocity", "4.0", "--range", "60", "--scr", "25"])
    capsys.readouterr()

    stc_path = tmp_path / "stc.txt"
    np.savetxt(stc_path, np.linspace(0, 6, 50))
    wf = np.exp(1j * np.pi * np.linspace(-1, 1, 40) ** 2) * 1.2
    wf_path = str(tmp_path / "mw.npz")
    np.savez(wf_path, refData=wf)

    assert cli.main([
        "stream", "--input", cap, "--profile", "TINYS2", "--frames", "3",
        "--win-size", "2", "--istc", str(stc_path),
        "--match-waveform", f"1={wf_path}:refData",
    ]) == 0
    out = json.loads(capsys.readouterr().out)
    assert len(out["frames"]) == 2

    # expected hits: the batched stage-2 chain with the same hooks
    frames_dir = str(tmp_path / "frames")
    assert cli.main([
        "ingest", "--input", cap, "--output", frames_dir, "--profile",
        "TINYS2", "--frames", "3",
    ]) == 0
    import dataclasses as dc

    prof_istc = dc.replace(tinys, mtd=dc.replace(tinys.mtd, istc=True))
    stc = np.loadtxt(stc_path)
    pulses = pulses_with_overrides(tinys, {1: wf})
    f0 = np.moveaxis(load_frame(frames_dir, 0)[0]["iq"], -1, 0)
    f1 = np.moveaxis(load_frame(frames_dir, 1)[0]["iq"], -1, 0)
    win = np.concatenate([f0, f1], axis=-2)
    rdms = mtd_window_produce(jnp.asarray(win, jnp.complex64), prof_istc, 2,
                              stc_curve_db=stc, pulses=pulses)
    from radar_signal_process_tpu.models.detect import clutter_cells

    nc = clutter_cells(tinys, tinys.prt_per_frame, 3.0)
    flags, _ = make_cpu_flags(tinys, nc)(rdms)
    assert out["frames"][0]["cfar_hits"] == int(flags.sum())


def test_cli_detect_mat_spectral_width_warns_once(tmp_path, capsys, caplog):
    """--format mat cannot persist widths: one warning, computation skipped,
    the cfarFlag variables still written."""
    import logging

    import scipy.io as sio

    from radar_signal_process_tpu.utils import matbus

    cap = str(tmp_path / "capture")
    frames_dir = str(tmp_path / "frames")
    rdm_dir = str(tmp_path / "rdm")
    det_dir = str(tmp_path / "det")
    cli.main(["simulate", "--output", cap, "--profile", "TINY", "--frames",
              "3", "--velocity", "4.0", "--range", "60", "--scr", "25"])
    cli.main(["ingest", "--input", cap, "--output", frames_dir,
              "--profile", "TINY", "--frames", "3"])
    cli.main(["mtd", "--input", frames_dir, "--output", rdm_dir,
              "--profile", "TINY", "--frames", "2", "--win-size", "2"])
    with caplog.at_level(logging.WARNING, logger="radar_tpu.cli"):
        assert cli.main([
            "detect", "--input", rdm_dir, "--output", det_dir, "--profile",
            "TINY", "--frames", "2", "--threshold", "5", "--format", "mat",
            "--spectral-width-db", "-15.0",
        ]) == 0
    warnings = [r for r in caplog.records if "spectral widths" in r.message]
    assert len(warnings) == 1
    m = sio.loadmat(matbus.mat_frame_path(det_dir, 0))
    assert any(k.startswith("cfarFlag_win_") for k in m)
