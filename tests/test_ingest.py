"""Ingest tests: byte-level roundtrips, cross-file splicing fuzz, error paths."""

import dataclasses

import numpy as np
import pytest

from radar_signal_process_tpu.config import G2_PROFILE
from radar_signal_process_tpu.ingest import (
    FileStream,
    G1FrameReader,
    G2FrameReader,
    native_available,
)
from radar_signal_process_tpu.ingest.native_loader import (
    NativeG2FrameReader,
    native_g1_read_frame,
)
from radar_signal_process_tpu.ingest.paths import g2_file_name, g2_file_path
from radar_signal_process_tpu.sim.packets_synth import (
    write_g1_capture,
    write_g2_capture,
)

# a small profile so tests stay fast: 8 PRT x 64 samples x 4 channels
SMALL = dataclasses.replace(
    G2_PROFILE, prt_per_frame=8, point_prt=64, segment_points=(16, 20, 28),
    n_channels=4,
)


def _rand_iq(rng, n_frames, profile, scale=1000):
    shape = (n_frames, profile.prt_per_frame, profile.point_prt, profile.n_channels)
    return (
        rng.integers(-scale, scale, shape) + 1j * rng.integers(-scale, scale, shape)
    ).astype(np.complex128)


def test_g2_file_name_format():
    # DataFullPathGen.m:10-16: 1.00000N.bin zero-padded
    assert g2_file_name(5) == "1.000005.bin"
    assert g2_file_name(50) == "1.000050.bin"
    assert g2_file_name(500) == "1.000500.bin"


def test_file_stream_cross_boundary(tmp_path, rng):
    blob = bytes(rng.integers(0, 256, 10_000, dtype=np.uint8))
    sizes = [1234, 777, 4001, 2000]
    pos = 0
    for i, s in enumerate(sizes, start=1):
        (tmp_path / g2_file_name(i)).write_bytes(blob[pos : pos + s])
        pos += s
    (tmp_path / g2_file_name(len(sizes) + 1)).write_bytes(blob[pos:])

    stream = FileStream(str(tmp_path), g2_file_path)
    out = bytearray()
    while True:
        chunk, eos = stream.read(int(rng.integers(1, 700)))
        out += chunk
        if eos:
            break
    assert bytes(out) == blob


@pytest.mark.parametrize("data_type", [0, 1, 2], ids=["ADC", "DDC", "DBF"])
def test_g2_roundtrip(tmp_path, rng, data_type):
    iq = _rand_iq(rng, 2, SMALL, scale=30000 if data_type != 2 else 2**22)
    if data_type == 0:
        iq = np.real(iq).astype(np.complex128)
    write_g2_capture(str(tmp_path), iq, SMALL, data_type=data_type)
    reader = G2FrameReader(str(tmp_path), SMALL)
    for f in range(2):
        res = reader.read_frame(f)
        assert res.frame_completed and not res.eos
        np.testing.assert_array_equal(res.iq, iq[f].astype(np.complex64))
        np.testing.assert_array_equal(res.servo_angle, 100 + np.arange(8))


def test_g2_roundtrip_across_file_boundaries(tmp_path, rng):
    """Fuzz: split the byte stream at random places incl. mid-header."""
    iq = _rand_iq(rng, 3, SMALL)
    total = None
    for trial in range(4):
        d = tmp_path / f"t{trial}"
        sizes = list(rng.integers(100, 5000, size=12))
        write_g2_capture(str(d), iq, SMALL, data_type=1, file_sizes=sizes)
        reader = G2FrameReader(str(d), SMALL)
        for f in range(3):
            res = reader.read_frame(f)
            assert res.frame_completed, f"trial {trial} frame {f}"
            np.testing.assert_array_equal(res.iq, iq[f].astype(np.complex64))


def test_g2_truncated_stream_reports_eos(tmp_path, rng):
    iq = _rand_iq(rng, 1, SMALL)
    write_g2_capture(str(tmp_path), iq, SMALL, data_type=1)
    # chop the single file mid-way through the last PRT's payload
    p = tmp_path / g2_file_name(1)
    blob = p.read_bytes()
    p.write_bytes(blob[: len(blob) - 200])
    reader = G2FrameReader(str(tmp_path), SMALL)
    res = reader.read_frame(0)
    assert not res.frame_completed
    assert res.eos
    # the PRTs before the truncation parsed fine
    np.testing.assert_array_equal(res.iq[:7], iq[0, :7].astype(np.complex64))


def test_g2_midframe_resume_after_retry(tmp_path, rng):
    """Reference retry loop: more data arrives, the same frame resumes."""
    iq = _rand_iq(rng, 1, SMALL)
    d = tmp_path / "cap"
    write_g2_capture(str(d), iq, SMALL, data_type=1)
    full = (d / g2_file_name(1)).read_bytes()
    half = len(full) // 2
    (d / g2_file_name(1)).write_bytes(full[:half])

    reader = G2FrameReader(str(d), SMALL)
    res = reader.read_frame(0)
    assert not res.frame_completed and res.eos
    prts_done = int(np.sum(np.abs(res.iq).sum(axis=(1, 2)) > 0))

    # remainder arrives as the next numbered file; stream picks it up
    (d / g2_file_name(2)).write_bytes(full[half:])
    # NOTE: the splicer already consumed a partial tail of file 1; rewriting
    # the capture is the honest scenario — new reader, same logical retry.
    reader2 = G2FrameReader(str(d), SMALL)
    res2 = reader2.read_frame(0)
    assert res2.frame_completed
    np.testing.assert_array_equal(res2.iq, iq[0].astype(np.complex64))
    assert prts_done < SMALL.prt_per_frame


def test_g2_corrupt_header_bails(tmp_path, rng):
    iq = _rand_iq(rng, 1, SMALL)
    write_g2_capture(str(tmp_path), iq, SMALL, data_type=1)
    p = tmp_path / g2_file_name(1)
    blob = bytearray(p.read_bytes())
    blob[24:28] = b"\x00\x00\x00\x00"  # pulse_data_num = 0 in first header
    p.write_bytes(bytes(blob))
    reader = G2FrameReader(str(tmp_path), SMALL)
    res = reader.read_frame(0)
    assert res.eos and not res.frame_completed


def test_g1_roundtrip(tmp_path, rng):
    n_frames, n_prt, pts = 3, 4, 50
    shape = (n_frames, n_prt, pts)
    left = (rng.integers(-2**22, 2**22, shape) + 1j * rng.integers(-2**22, 2**22, shape)).astype(np.complex128)
    right = (rng.integers(-2**22, 2**22, shape) + 1j * rng.integers(-2**22, 2**22, shape)).astype(np.complex128)
    write_g1_capture(str(tmp_path), left, right, frames_per_file=2, angle_deg=45.0)

    reader = G1FrameReader(str(tmp_path), prt_num=n_prt, point_prt=pts, frames_per_file=2)
    for f in range(n_frames):
        lt, rt, angles, meta = reader.read_frame(f + 1)
        np.testing.assert_array_equal(lt, left[f])
        np.testing.assert_array_equal(rt, right[f])
        assert abs(angles[0] - 45.0) < 360.0 / 16384.0 * 128  # a2 encodes 2^7 steps
        assert meta["frame_no"] == f


def test_g1_bad_sync_raises(tmp_path, rng):
    left = right = np.ones((1, 2, 10), dtype=np.complex128)
    write_g1_capture(str(tmp_path), left, right)
    p = tmp_path / "000001.bin"
    blob = bytearray(p.read_bytes())
    blob[0] = 0x00
    p.write_bytes(bytes(blob))
    reader = G1FrameReader(str(tmp_path), prt_num=2, point_prt=10)
    with pytest.raises(ValueError):
        reader.read_frame(1)


# ------------------------------------------------------------------- native
needs_native = pytest.mark.skipif(
    not native_available(), reason="C++ toolchain unavailable"
)


@needs_native
@pytest.mark.parametrize("data_type", [0, 1, 2], ids=["ADC", "DDC", "DBF"])
def test_native_g2_matches_numpy(tmp_path, rng, data_type):
    iq = _rand_iq(rng, 2, SMALL, scale=30000 if data_type != 2 else 2**22)
    if data_type == 0:
        iq = np.real(iq).astype(np.complex128)
    sizes = list(rng.integers(500, 3000, size=8))
    write_g2_capture(str(tmp_path), iq, SMALL, data_type=data_type, file_sizes=sizes)

    py_reader = G2FrameReader(str(tmp_path), SMALL)
    c_reader = NativeG2FrameReader(str(tmp_path), SMALL)
    for f in range(2):
        py = py_reader.read_frame(f)
        cc = c_reader.read_frame(f)
        assert py.frame_completed and cc.frame_completed
        np.testing.assert_array_equal(cc.iq, py.iq)
        np.testing.assert_array_equal(cc.servo_angle, py.servo_angle)


@needs_native
def test_native_g2_truncation_matches_numpy(tmp_path, rng):
    iq = _rand_iq(rng, 1, SMALL)
    write_g2_capture(str(tmp_path), iq, SMALL, data_type=1)
    p = tmp_path / g2_file_name(1)
    p.write_bytes(p.read_bytes()[:-150])
    py = G2FrameReader(str(tmp_path), SMALL).read_frame(0)
    cc = NativeG2FrameReader(str(tmp_path), SMALL).read_frame(0)
    assert py.eos and cc.eos
    assert not py.frame_completed and not cc.frame_completed


@needs_native
def test_native_g1_matches_numpy(tmp_path, rng):
    n_prt, pts = 3, 40
    shape = (2, n_prt, pts)
    left = (rng.integers(-1000, 1000, shape) + 1j * rng.integers(-1000, 1000, shape)).astype(np.complex128)
    right = (rng.integers(-1000, 1000, shape) + 1j * rng.integers(-1000, 1000, shape)).astype(np.complex128)
    write_g1_capture(str(tmp_path), left, right, frames_per_file=10)
    py_reader = G1FrameReader(str(tmp_path), prt_num=n_prt, point_prt=pts)
    for f in (1, 2):
        lt, rt, ang, meta = py_reader.read_frame(f)
        nl, nr, nang, nmeta = native_g1_read_frame(
            str(tmp_path / "000001.bin"), f, n_prt, pts
        )
        np.testing.assert_array_equal(nl, lt.astype(np.complex64))
        np.testing.assert_array_equal(nr, rt.astype(np.complex64))
        np.testing.assert_allclose(nang, ang)
        assert nmeta["frame_no"] == meta["frame_no"]


def test_native_mt_parse_matches_single_thread(tmp_path):
    """The two-phase threaded G2 parser == the interleaved single-pass one."""
    import numpy as np

    from radar_signal_process_tpu.config import G2_PROFILE
    from radar_signal_process_tpu.ingest import native_available
    from radar_signal_process_tpu.sim.packets_synth import write_g2_capture

    if not native_available():
        import pytest

        pytest.skip("native ingest unavailable")
    from radar_signal_process_tpu.ingest.native_loader import NativeG2FrameReader

    prof = G2_PROFILE
    rng = np.random.default_rng(11)
    iq = (
        rng.integers(-2000, 2000, size=(2, prof.prt_per_frame, prof.point_prt,
                                        prof.n_channels)).astype(np.float32)
        + 1j * rng.integers(-2000, 2000, size=(2, prof.prt_per_frame,
                                               prof.point_prt,
                                               prof.n_channels)).astype(np.float32)
    )
    write_g2_capture(str(tmp_path), iq, prof, data_type=1)
    r1 = NativeG2FrameReader(str(tmp_path), prof)            # single-pass
    r2 = NativeG2FrameReader(str(tmp_path), prof, n_threads=2)  # two-phase mt
    for f in range(2):
        a = r1.read_frame(f)
        b = r2.read_frame(f)
        assert a.frame_completed and b.frame_completed
        np.testing.assert_array_equal(a.iq, b.iq)
        np.testing.assert_array_equal(a.servo_angle, b.servo_angle)
