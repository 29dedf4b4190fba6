"""CPU host-parallel pipeline == batched jitted pipeline, exactly."""

import dataclasses

import numpy as np

import jax.numpy as jnp

from radar_signal_process_tpu.config import CFARConfig, G2_PROFILE, MTDConfig
from radar_signal_process_tpu.models.detect import detect_rdm
from radar_signal_process_tpu.models.host_parallel import (
    make_cpu_flags,
    make_cpu_frame_processor,
)
from radar_signal_process_tpu.models.mtd_pipeline import make_frame_processor

SMALL = dataclasses.replace(
    G2_PROFILE, prt_per_frame=32, point_prt=344, segment_points=(24, 80, 240),
    cfar_segments=((0, 24), (24, 104), (104, 344)), n_beams=3,
)


def test_cpu_frame_processor_matches_batched(rng):
    for prof in (SMALL, dataclasses.replace(SMALL, mtd=MTDConfig(mti_lag=5))):
        shape = (prof.n_beams, prof.prt_per_frame, prof.point_prt)
        a = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
            np.complex64
        )
        b = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
            np.complex64
        )
        got = make_cpu_frame_processor(prof, 4)(a, b)
        want = np.asarray(make_frame_processor(prof, 4)(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_array_equal(got, want)


def test_cpu_flags_match_batched(rng):
    prof = SMALL
    rdms = (rng.standard_normal((3, 4, 32, 344)).astype(np.float32)) ** 2
    cfg = CFARConfig(ref_cells=3, guard_cells=4, threshold=4.0)
    got_f, got_v = make_cpu_flags(prof, 4, cfg=cfg)(rdms)
    want_f, want_v = detect_rdm(jnp.asarray(rdms), prof, 4, cfg=cfg)
    np.testing.assert_array_equal(got_f, np.asarray(want_f))
    np.testing.assert_array_equal(got_v, np.asarray(want_v))


def test_two_phase_beam_map_error_propagates_without_deadlock():
    """A failing item re-raises after join; the barrier never deadlocks."""
    import numpy as np
    import pytest

    from radar_signal_process_tpu.models.host_parallel import two_phase_beam_map

    parts = [np.zeros((2, 4)), np.zeros((2, 4))]

    def pc_fn(p):
        return p

    def item(acc, pc, ci, b, w, start):
        if ci == 1 and b == 1:
            raise RuntimeError("boom")
        return (acc or 0) + 1

    with pytest.raises(RuntimeError, match="boom"):
        two_phase_beam_map(parts, pc_fn, [0, 3], item, n_threads=2)

    # phase-1 failure: the other worker must not hang on the barrier
    def pc_bad(p):
        raise ValueError("pc failed")

    with pytest.raises((ValueError, TypeError)):
        two_phase_beam_map(parts, pc_bad, [0], item, n_threads=2)


def test_cpu_stream_processor_matches_frame_processor(rng):
    """Per-frame PC reuse across consecutive windows is bit-identical to
    the per-window processor, on both the cache-miss and cache-hit paths
    (and with MTI enabled)."""
    from radar_signal_process_tpu.models.host_parallel import (
        make_cpu_frame_processor,
        make_cpu_stream_processor,
    )

    for prof in (SMALL, dataclasses.replace(SMALL, mtd=MTDConfig(mti_lag=3))):
        shape = (prof.n_beams, prof.prt_per_frame, prof.point_prt)
        frames = [
            jnp.asarray(
                (rng.standard_normal(shape) + 1j * rng.standard_normal(shape))
                .astype(np.complex64)
            )
            for _ in range(3)
        ]
        ref = make_cpu_frame_processor(prof, win_size=2)
        stream = make_cpu_stream_processor(prof, win_size=2)
        for w in range(2):  # w=1 hits the PC cache from w=0
            want = ref(frames[w], frames[w + 1])
            got = stream(frames[w], frames[w + 1], frame_idx=w)
            np.testing.assert_array_equal(got, want, err_msg=f"window {w}")
        # non-sequential call (cache miss) still correct
        got = stream(frames[0], frames[1], frame_idx=7)
        np.testing.assert_array_equal(got, ref(frames[0], frames[1]))


def test_pipelined_window_map_fuzz(rng):
    """Dependency-aware cross-frame queue: random (frames, threads, chunks)
    geometries all produce exactly the per-window reference results and
    free every compressed chunk."""
    from radar_signal_process_tpu.models.host_parallel import (
        pipelined_window_map,
    )

    starts = (0, 3, 6)
    for _ in range(6):
        n_frames = int(rng.integers(1, 6))
        n_beams = int(rng.integers(1, 5))
        n_threads = int(rng.integers(1, 5))
        n_chunks = int(rng.integers(1, n_beams + 1))
        frames = [rng.standard_normal((n_beams, 9, 4)) for _ in range(n_frames)]

        def pc_fn(chunk):
            return chunk * 2.0

        got = {}

        def item(acc, pc_a, pc_b, c, b, w, s, start):
            row = np.concatenate(
                [pc_a[b, start:], pc_b[b, :start]], axis=0
            )
            got[(w, c, b, s)] = row.copy()
            return (acc or 0) + 1

        out = pipelined_window_map(frames, pc_fn, starts, item, n_threads,
                                   n_chunks=n_chunks)
        n_windows = n_frames - 1
        total = sum(o for o in out if o is not None)
        assert total == max(0, n_windows) * n_beams * len(starts)
        # verify every item saw the right rows of the right frames
        k = -(-n_beams // n_chunks)
        for (w, c, b, s), row in got.items():
            start = starts[s]
            lo = c * k
            want = np.concatenate(
                [2.0 * frames[w][lo + b, start:],
                 2.0 * frames[w + 1][lo + b, :start]], axis=0,
            )
            np.testing.assert_array_equal(row, want)


def test_cpu_stream_processor_probe_rejects_stale_cache(rng):
    """Passing a DIFFERENT frame under the cached index must not reuse the
    stale compression (the content probe forces a recompute)."""
    from radar_signal_process_tpu.models.host_parallel import (
        make_cpu_frame_processor,
        make_cpu_stream_processor,
    )

    prof = SMALL
    shape = (prof.n_beams, prof.prt_per_frame, prof.point_prt)
    mk = lambda: jnp.asarray(
        (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
            np.complex64
        )
    )
    a, b, c, d = mk(), mk(), mk(), mk()
    stream = make_cpu_stream_processor(prof, win_size=2)
    ref = make_cpu_frame_processor(prof, win_size=2)
    stream(a, b, frame_idx=0)           # caches PC(b) under index 1
    got = stream(c, d, frame_idx=1)     # c != b: probe must reject cache
    np.testing.assert_array_equal(got, ref(c, d))
