"""Streaming pipeline test: capture -> overlapped ingest/compute -> detections."""

import dataclasses

import numpy as np

from radar_signal_process_tpu.config import G2_PROFILE
from radar_signal_process_tpu.ingest import G2FrameReader
from radar_signal_process_tpu.models.streaming import StreamingPipeline
from radar_signal_process_tpu.sim.packets_synth import write_g2_capture

SMALL = dataclasses.replace(
    G2_PROFILE, prt_per_frame=16, point_prt=128, segment_points=(24, 40, 64),
    n_channels=2, n_beams=2,
)


def test_streaming_pipeline(tmp_path, rng):
    n_frames = 4
    shape = (n_frames, SMALL.prt_per_frame, SMALL.point_prt, SMALL.n_channels)
    iq = (rng.integers(-500, 500, shape) + 1j * rng.integers(-500, 500, shape)).astype(
        np.complex128
    )
    # a strong pulse at a fixed cell in every PRT -> stationary target
    iq[:, :, 40, :] += 20000.0
    write_g2_capture(str(tmp_path), iq, SMALL, data_type=1)

    pipe = StreamingPipeline(
        G2FrameReader(str(tmp_path), SMALL),
        SMALL,
        win_size=2,
        max_frames=n_frames,
        clutter_v=1e-6,  # tiny clutter region for the small geometry
        max_detections=8,
    )
    results = list(pipe)
    # n_frames frames -> n_frames-1 consecutive pairs
    assert [r.frame_idx for r in results] == [0, 1, 2]
    for r in results:
        assert r.rdms.shape == (2, 2, 16, 128)
    assert pipe.counters.get("frames_ingested") == n_frames
    assert pipe.counters.get("windows_processed") == n_frames - 1
