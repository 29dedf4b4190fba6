"""Tests: manifest roundtrip, counters, evaluation metrics."""

import numpy as np

from radar_signal_process_tpu.config import G2_PROFILE
from radar_signal_process_tpu.evalx import (
    TruthGate,
    accuracy,
    detection_rate,
    evaluate_frames,
    false_alarm_rate,
    localization_pcf,
)
from radar_signal_process_tpu.utils import Counters, load_frame, save_frame, frame_exists


def test_manifest_roundtrip_with_profile(tmp_path, rng):
    arrays = {
        "rdm": rng.standard_normal((8, 16)).astype(np.float32),
        "flags": (rng.random((8, 16)) > 0.9),
    }
    path = save_frame(str(tmp_path), 3, arrays, G2_PROFILE, meta={"servo": 12.5})
    assert frame_exists(str(tmp_path), 3)
    got, profile, meta = load_frame(str(tmp_path), 3)
    np.testing.assert_array_equal(got["rdm"], arrays["rdm"])
    np.testing.assert_array_equal(got["flags"], arrays["flags"])
    assert profile == G2_PROFILE  # embedded config fixes the reference's flaw
    assert meta == {"servo": 12.5}
    assert path.endswith("frame_3.npz")


def test_counters():
    c = Counters()
    c.add("frames")
    c.add("frames")
    c.add("prts", 332)
    assert c.get("frames") == 2
    assert c.snapshot()["prts"] == 332


def _frame_with_hit(nv, nr, v_idx, r_idx):
    flags = np.zeros((nv, nr), dtype=bool)
    flags[v_idx, r_idx] = True
    rdm = np.ones((nv, nr))
    rdm[v_idx, r_idx] = 100.0
    return flags, rdm


def test_metrics_gated_detection():
    nv, nr = 64, 128
    r_axis = np.arange(nr) * 12.0   # 0..1524 m
    v_axis = np.linspace(-25, 25, nv)
    r_true, v_true = 600.0, 10.0    # inside the gate
    r_idx = int(np.argmin(np.abs(r_axis - r_true)))
    v_idx = int(np.argmin(np.abs(v_axis - v_true)))

    flags, rdm = _frame_with_hit(nv, nr, v_idx, r_idx)
    # fa excludes the truth window -> zero false alarms
    assert false_alarm_rate(flags, r_true, v_true, r_axis, v_axis) == 0.0
    assert detection_rate([flags], [r_true], [v_true], r_axis, v_axis) == 1.0
    assert accuracy([flags], [r_true], [v_true], r_axis, v_axis) == 1.0
    pcf = localization_pcf([flags], [rdm], [r_true], [v_true], r_axis, v_axis)
    assert pcf == 1.0  # peak exactly at truth

    # a miss: hit far from truth
    flags2, rdm2 = _frame_with_hit(nv, nr, 5, 5)
    assert detection_rate([flags2], [r_true], [v_true], r_axis, v_axis) == 0.0
    fa = false_alarm_rate(flags2, r_true, v_true, r_axis, v_axis)
    assert fa == 1.0 / (nv * nr)


def test_metrics_ungated_frame():
    nv, nr = 32, 64
    r_axis = np.arange(nr) * 12.0
    v_axis = np.linspace(-25, 25, nv)
    flags, rdm = _frame_with_hit(nv, nr, 10, 10)
    # truth outside the gate (|V| < 3): every hit counts as a false alarm,
    # accuracy counts any-hit frames as "correct" (as written in reference)
    fa = false_alarm_rate(flags, 600.0, 1.0, r_axis, v_axis)
    assert fa == 1.0 / (nv * nr)
    assert accuracy([flags], [600.0], [1.0], r_axis, v_axis) == 1.0
    assert np.isnan(detection_rate([flags], [600.0], [1.0], r_axis, v_axis))


def test_evaluate_frames_batch():
    nv, nr = 64, 128
    r_axis = np.arange(nr) * 12.0
    v_axis = np.linspace(-25, 25, nv)
    frames = []
    rdms = []
    rts, vts = [], []
    for k in range(4):
        rt, vt = 600.0 + 24 * k, 10.0
        r_idx = int(np.argmin(np.abs(r_axis - rt)))
        v_idx = int(np.argmin(np.abs(v_axis - vt)))
        f, m = _frame_with_hit(nv, nr, v_idx, r_idx)
        frames.append(f)
        rdms.append(m)
        rts.append(rt)
        vts.append(vt)
    out = evaluate_frames(frames, rdms, rts, vts, r_axis, v_axis)
    assert out["detection_rate"] == 1.0
    assert out["false_alarm_rate"] == 0.0
    assert out["accuracy"] == 1.0
    assert out["localization_pcf"] == 1.0
