"""MATLAB .mat file-bus interop: variable-contract roundtrips and a full
mat-format CLI pipeline that must produce results identical to the npz bus.

The reference's stage bus is directories of per-frame .mat files with exact
variable names (`sig_data_DBF_allprts`/`servo_angle` from bin_to_mat_xzr.m:66,
`MTD_win_all_beams` cells from main_produce_dataset_win_xzr_v2.m:162,
`cfarFlag_win_{b}` from main_cfar.m:97); these tests pin that contract.
"""

import dataclasses

import numpy as np
import pytest

import radar_signal_process_tpu.cli as cli
from radar_signal_process_tpu.config import G2_PROFILE, PROFILES
from radar_signal_process_tpu.utils import load_frame, matbus

sio = pytest.importorskip("scipy.io")

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


def test_frame_mat_roundtrip(tmp_path, rng):
    iq = (rng.standard_normal((8, 16, 3)) + 1j * rng.standard_normal((8, 16, 3)))
    servo = rng.uniform(0, 360, 8)
    path = matbus.save_frame_mat(str(tmp_path / "frame_0.mat"), iq, servo)
    iq2, servo2 = matbus.load_frame_mat(path)
    np.testing.assert_array_equal(iq2, iq)
    np.testing.assert_allclose(servo2, servo)
    # the exact MATLAB variable names are present
    raw = sio.loadmat(path)
    assert "sig_data_DBF_allprts" in raw and "servo_angle" in raw


def test_frame_mat_single_beam_regains_axis(tmp_path, rng):
    """MATLAB squeezes trailing singletons; the loader restores the beam axis."""
    iq = rng.standard_normal((8, 16)) + 0j
    sio.savemat(str(tmp_path / "frame_0.mat"),
                {"sig_data_DBF_allprts": iq, "servo_angle": np.zeros((1, 8))})
    iq2, _ = matbus.load_frame_mat(str(tmp_path / "frame_0.mat"))
    assert iq2.shape == (8, 16, 1)


def test_mtd_mat_cell_roundtrip(tmp_path, rng):
    rdms = rng.random((3, 2, 16, 24))
    path = matbus.save_mtd_mat(str(tmp_path / "frame_1.mat"), rdms)
    back = matbus.load_mtd_mat(path)
    np.testing.assert_array_equal(back, rdms)
    # stored as a (beam, 1) cell array, the reference's exact shape
    raw = sio.loadmat(path)
    assert raw["MTD_win_all_beams"].shape == (3, 1)
    assert raw["MTD_win_all_beams"][0, 0].shape == (2, 16, 24)


def test_mtd_mat_g1_variables(tmp_path, rng):
    """The G1 stage-2 form (MTD_0/MTD_1 matrices) loads as a 2-beam stack."""
    m0, m1 = rng.random((4, 8, 10)), rng.random((4, 8, 10))
    sio.savemat(str(tmp_path / "frame_2.mat"), {"MTD_0": m0, "MTD_1": m1})
    back = matbus.load_mtd_mat(str(tmp_path / "frame_2.mat"))
    np.testing.assert_array_equal(back, np.stack([m0, m1]))


def test_cfar_mat_roundtrip(tmp_path, rng):
    flags = rng.random((2, 4, 16, 24)) > 0.8
    path = matbus.save_cfar_mat(str(tmp_path / "frame_0.mat"), flags)
    back = matbus.load_cfar_mat(path)
    np.testing.assert_array_equal(back, flags)
    raw = sio.loadmat(path)
    assert "cfarFlag_win_0" in raw and "cfarFlag_win_1" in raw


def test_missing_variables_raise(tmp_path):
    sio.savemat(str(tmp_path / "frame_0.mat"), {"other": np.zeros(3)})
    with pytest.raises(KeyError):
        matbus.load_frame_mat(str(tmp_path / "frame_0.mat"))
    with pytest.raises(KeyError):
        matbus.load_mtd_mat(str(tmp_path / "frame_0.mat"))
    with pytest.raises(KeyError):
        matbus.load_cfar_mat(str(tmp_path / "frame_0.mat"))


def test_reference_directory_names(tmp_path):
    assert matbus.baseband_dir("/d").endswith("BasebandRawData_mat")
    assert matbus.mtd_dir("/d", 4).endswith("MTD_data_win4")
    assert matbus.cfar_dir("/d", 4, 5.0).endswith("cfarFlag4_T5")
    assert matbus.cfar_dir("/d", 4, 4.5).endswith("cfarFlag4_T4.5")


def test_cli_mat_bus_matches_npz(tmp_path):
    """simulate -> ingest -> mtd -> detect through BOTH buses; identical data."""
    cap = str(tmp_path / "capture")
    assert cli.main([
        "simulate", "--output", cap, "--profile", "TINY", "--frames", "3",
        "--velocity", "-5.7", "--range", "60", "--scr", "25",
    ]) == 0

    dirs = {fmt: {s: str(tmp_path / f"{s}_{fmt}") for s in ("f", "r", "d")}
            for fmt in ("npz", "mat")}
    for fmt in ("npz", "mat"):
        assert cli.main([
            "ingest", "--input", cap, "--output", dirs[fmt]["f"],
            "--profile", "TINY", "--frames", "3", "--format", fmt,
        ]) == 0
        assert cli.main([
            "mtd", "--input", dirs[fmt]["f"], "--output", dirs[fmt]["r"],
            "--profile", "TINY", "--frames", "2", "--win-size", "2",
            "--format", fmt,
        ]) == 0
        assert cli.main([
            "detect", "--input", dirs[fmt]["r"], "--output", dirs[fmt]["d"],
            "--profile", "TINY", "--frames", "2", "--threshold", "5.0",
            "--format", fmt,
        ]) == 0

    iq_npz = load_frame(dirs["npz"]["f"], 0)[0]["iq"]
    iq_mat, _ = matbus.load_frame_mat(matbus.mat_frame_path(dirs["mat"]["f"], 0))
    np.testing.assert_array_equal(iq_mat, iq_npz)

    rdm_npz = load_frame(dirs["npz"]["r"], 0)[0]["rdm"]
    rdm_mat = matbus.load_mtd_mat(matbus.mat_frame_path(dirs["mat"]["r"], 0))
    np.testing.assert_array_equal(rdm_mat, rdm_npz)

    fl_npz = load_frame(dirs["npz"]["d"], 0)[0]["flags"]
    fl_mat = matbus.load_cfar_mat(matbus.mat_frame_path(dirs["mat"]["d"], 0))
    np.testing.assert_array_equal(fl_mat, fl_npz.astype(bool))


def test_cli_cross_format(tmp_path):
    """A MATLAB-produced stage-1 bus feeds the npz MTD stage directly."""
    cap = str(tmp_path / "capture")
    matdir = str(tmp_path / "matframes")
    rdm_dir = str(tmp_path / "rdm")
    assert cli.main([
        "simulate", "--output", cap, "--profile", "TINY", "--frames", "3",
    ]) == 0
    assert cli.main([
        "ingest", "--input", cap, "--output", matdir, "--profile", "TINY",
        "--frames", "3", "--format", "mat",
    ]) == 0
    assert cli.main([
        "mtd", "--input", matdir, "--output", rdm_dir, "--profile", "TINY",
        "--frames", "2", "--win-size", "2",
    ]) == 0
    arrays, _, _ = load_frame(rdm_dir, 0)
    assert arrays["rdm"].shape == (2, 2, 32, 344)
