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
    assert meshed == plain
    assert any(f["detections"] for f in plain["frames"])
