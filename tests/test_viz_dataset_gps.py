"""Tests: visualization outputs, dataset utilities, GPS comparison."""

import numpy as np
import pytest

from radar_signal_process_tpu.config import G1_PROFILE, G2_PROFILE
from radar_signal_process_tpu.evalx.gps import (
    compare_estimates,
    drop_invalid,
    gps_frame_indices,
    read_gps_track,
)
from radar_signal_process_tpu.utils import save_frame
from radar_signal_process_tpu.utils.dataset import (
    crop_velocity_band,
    extract_angle_series,
    sinc2d,
    velocity_band_rows,
)
from radar_signal_process_tpu.viz import (
    plot_mtd_dashboard,
    plot_rdm_image,
    rdm_to_db,
)


def test_rdm_to_db_normalizes():
    rdm = np.array([[1.0, 10.0], [100.0, 0.0]])
    db = rdm_to_db(rdm)
    assert db.max() == 0.0
    assert db[0, 0] == -40.0


def test_velocity_band_matches_reference_clip():
    """clip.m crops rows 691:845 of the 1536-row G1 RDM as the ~+-21 m/s band
    at the C-band carrier used by main_cfar.m (fc = 5500 MHz, :28)."""
    import dataclasses

    cband = dataclasses.replace(G1_PROFILE, fc=5500e6)
    v = cband.velocity_axis(1536)
    # 1-based MATLAB rows 691..845 -> 0-based 690..844
    lo, hi = velocity_band_rows(cband, 1536, v[690], v[844])
    assert lo == 690
    assert hi == 845


def test_crop_velocity_band(rng):
    rdm = rng.standard_normal((332, 64))
    out, (lo, hi) = crop_velocity_band(rdm, G2_PROFILE, -20, 20)
    assert out.shape == (hi - lo, 64)
    np.testing.assert_array_equal(out, rdm[lo:hi])


def test_extract_angle_series(tmp_path):
    for i in range(3):
        save_frame(
            str(tmp_path), i,
            {"iq": np.zeros((2, 2)), "servo_angle": np.full(4, 10.0 * i)},
            G2_PROFILE,
        )
    series = extract_angle_series(str(tmp_path))
    assert series.shape == (12,)
    np.testing.assert_array_equal(series[4:8], 10.0)


def test_sinc2d():
    s = sinc2d(51)
    assert s.shape == (51, 51)
    assert abs(s[25, 25] - 1.0) < 1e-12


def test_plots_write_files(tmp_path, rng):
    rdm = np.abs(rng.standard_normal((64, 128))) + 0.1
    rdm[40, 80] = 50.0
    p1 = plot_rdm_image(rdm, G2_PROFILE, save_path=str(tmp_path / "rdm.png"))
    p2 = plot_mtd_dashboard(rdm, G2_PROFILE, save_path=str(tmp_path / "dash.png"))
    assert (tmp_path / "rdm.png").stat().st_size > 5000
    assert (tmp_path / "dash.png").stat().st_size > 10000


def test_gps_roundtrip(tmp_path):
    path = tmp_path / "gps.txt"
    lines = ["header line one", "header two"]
    t0 = 1000.0
    for k in range(10):
        r = 500.0 + 10 * k if k != 4 else 0.0  # one invalid row
        lines.append(f"{t0 + k * 0.5} {r} {-6.0} {120.0} {55.0}")
    path.write_text("\n".join(lines))

    track = read_gps_track(str(path), start_line=3)
    assert len(track.time_s) == 10
    idx = gps_frame_indices(track, prt=52.08e-6, prt_num=1536, frames_shift=100)
    assert idx[0] == 100
    track2, idx2 = drop_invalid(track, idx)
    assert len(track2.time_s) == 9

    # radar estimates match GPS exactly at interpolated frames -> rmse 0
    est = np.interp(idx2, idx2, track2.range_m)
    out = compare_estimates(idx2, est, idx2, track2.range_m)
    assert out["n"] == 9
    assert out["rmse"] < 1e-9


def test_plot_estimate_series_with_gps_overlay(tmp_path):
    """R/V/elevation series scatter + GPS overlay PNG
    (DMX_SignalProcessing_main_xzr.m:534-559,592-599)."""
    from radar_signal_process_tpu.viz import plot_estimate_series

    pytest.importorskip("matplotlib")
    rng = np.random.default_rng(0)
    n = 40
    fr = np.repeat(np.arange(10), 4).astype(float)
    out = plot_estimate_series(
        fr,
        500 + 10 * fr + rng.standard_normal(n),
        -6 + 0.1 * rng.standard_normal(n),
        12 + rng.standard_normal(n),
        gps_frames=np.arange(10, dtype=float),
        gps_range_m=500 + 10 * np.arange(10),
        gps_velocity_ms=np.full(10, -6.0),
        save_path=str(tmp_path / "series.png"),
    )
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_v1_animations(tmp_path):
    """Reference V1 animation modes (fun_plot_visualizations.m:33-63):
    animated .gif and frame-stepped PNG-sequence variants."""
    from radar_signal_process_tpu.viz import (
        plot_doppler_animation,
        plot_pc_animation,
    )

    pytest.importorskip("matplotlib")
    import os

    rng = np.random.default_rng(1)
    pc = rng.standard_normal((16, 64)) + 1j * rng.standard_normal((16, 64))
    gif = plot_pc_animation(pc, str(tmp_path / "pc.gif"), step=4, max_frames=3)
    assert os.path.getsize(gif) > 1000

    rdm = np.abs(rng.standard_normal((32, 24))) + 0.1
    v_axis = np.linspace(-10, 10, 32)
    seq_dir = plot_doppler_animation(
        rdm, v_axis, str(tmp_path / "dop_seq"), step=8, max_frames=3
    )
    frames = sorted(os.listdir(seq_dir))
    assert frames == ["frame_0000.png", "frame_0001.png", "frame_0002.png"]
