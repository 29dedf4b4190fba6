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


def test_cpu_stream_detector_matches_composed_path(rng):
    """The fused stream detector (CFAR + extraction in the work queue)
    reproduces the composed processor + detect + extract path exactly."""
    import functools

    import jax

    from radar_signal_process_tpu.models.host_parallel import (
        make_cpu_stream_detector,
        make_cpu_stream_processor,
    )
    from radar_signal_process_tpu.ops.measure import extract_detections

    prof = SMALL
    shape = (prof.n_beams, prof.prt_per_frame, prof.point_prt)
    frames = [
        (rng.standard_normal(shape) + 1j * rng.standard_normal(shape))
        .astype(np.complex64)
        for _ in range(3)
    ]
    n_clutter = 4
    det = make_cpu_stream_detector(prof, 4, n_clutter, max_detections=8)
    proc = make_cpu_stream_processor(prof, 4)
    flags_fn = make_cpu_flags(prof, n_clutter)
    extract = jax.jit(functools.partial(extract_detections, max_detections=8))

    for w in range(2):
        rdms, flags, dets = det(frames[w], frames[w + 1], frame_idx=w)
        want_rdm = proc(frames[w], frames[w + 1], frame_idx=w)
        np.testing.assert_array_equal(rdms, want_rdm)
        want_flags, _ = flags_fn(want_rdm)
        np.testing.assert_array_equal(flags, want_flags)
        want_dets = extract(jnp.asarray(want_flags), jnp.asarray(want_rdm))
        for b in range(prof.n_beams):
            for s in range(4):
                got = {
                    (int(v), int(r), float(a))
                    for v, r, a, ok in zip(
                        dets.v_idx[b, s], dets.r_idx[b, s],
                        dets.amplitude[b, s], dets.valid[b, s],
                    )
                    if ok
                }
                wv = np.asarray(want_dets.valid)[b, s]
                want = {
                    (int(v), int(r), float(a))
                    for v, r, a in zip(
                        np.asarray(want_dets.v_idx)[b, s][wv],
                        np.asarray(want_dets.r_idx)[b, s][wv],
                        np.asarray(want_dets.amplitude)[b, s][wv],
                    )
                }
                assert got == want, (b, s)


def test_pipelined_window_map_lazy_frames(rng):
    """Callable (lazily-ingested) frame entries produce the same results as
    materialized arrays, and each getter is invoked exactly once."""
    from radar_signal_process_tpu.models.host_parallel import (
        pipelined_window_map,
    )
    from radar_signal_process_tpu.models.mtd_pipeline import window_slice_starts
    from radar_signal_process_tpu.ops.pulse_compression import (
        segmented_pulse_compression,
    )
    from radar_signal_process_tpu.ops.waveforms import reference_pulses

    import jax
    import jax.numpy as jnp

    prof = SMALL
    pulses = reference_pulses(prof)
    pc_fn = jax.jit(lambda b: segmented_pulse_compression(b, prof, pulses))
    starts = window_slice_starts(prof.prt_per_frame, 2)
    frames = [
        jnp.asarray(
            (rng.standard_normal((3, prof.prt_per_frame, prof.point_prt))
             + 1j * rng.standard_normal(
                 (3, prof.prt_per_frame, prof.point_prt))).astype(np.complex64)
        )
        for _ in range(4)
    ]

    def item(acc, pc_a, pc_b, c, b, w, s, start):
        if start == 0:
            v = jnp.sum(jnp.abs(pc_a[b]))
        else:
            v = jnp.sum(jnp.abs(pc_a[b])) + jnp.sum(jnp.abs(pc_b[b]))
        v = float(v)
        return v if acc is None else acc + v

    want = pipelined_window_map(frames, pc_fn, starts, item, 2)
    calls = [0] * len(frames)

    def getter(f):
        def get():
            calls[f] += 1
            return frames[f]

        return get

    got = pipelined_window_map(
        [getter(f) for f in range(len(frames))], pc_fn, starts, item, 2
    )
    assert calls == [1] * len(frames)
    total_w = sum(o for o in want if o is not None)
    total_g = sum(o for o in got if o is not None)
    np.testing.assert_allclose(total_g, total_w, rtol=1e-6)


def test_cpu_stream_pipeline_matches_detector(rng):
    """The block-pipelined runner emits exactly the window-at-a-time
    detector's outputs (completion-order emission reordered by w)."""
    from radar_signal_process_tpu.models.host_parallel import (
        make_cpu_stream_detector,
        make_cpu_stream_pipeline,
    )

    prof = SMALL
    shape = (prof.n_beams, prof.prt_per_frame, prof.point_prt)
    frames = [
        (rng.standard_normal(shape) + 1j * rng.standard_normal(shape))
        .astype(np.complex64)
        for _ in range(4)
    ]
    run = make_cpu_stream_pipeline(prof, 4, 4, max_detections=8)
    got = {}

    def emit(w, rdms, flags, dets, hits):
        got[w] = (rdms, flags, dets)
        assert hits == int(flags.sum())

    run([jnp.asarray(f) for f in frames], emit)
    assert sorted(got) == [0, 1, 2]

    det = make_cpu_stream_detector(prof, 4, 4, max_detections=8)
    for w in range(3):
        rdms, flags, dets = det(frames[w], frames[w + 1], frame_idx=w)
        g_rdms, g_flags, g_dets = got[w]
        np.testing.assert_array_equal(g_rdms, rdms)
        np.testing.assert_array_equal(g_flags, flags)
        for b in range(prof.n_beams):
            for s in range(4):
                want = {
                    (int(v), int(r), float(a))
                    for v, r, a, ok in zip(
                        dets.v_idx[b, s], dets.r_idx[b, s],
                        dets.amplitude[b, s], dets.valid[b, s],
                    ) if ok
                }
                have = {
                    (int(v), int(r), float(a))
                    for v, r, a, ok in zip(
                        g_dets.v_idx[b, s], g_dets.r_idx[b, s],
                        g_dets.amplitude[b, s], g_dets.valid[b, s],
                    ) if ok
                }
                assert have == want, (w, b, s)


def test_cpu_stream_pipeline_lazy_frames_and_callback_errors(rng):
    """Lazy later frames work; an emit exception aborts the run."""
    import pytest

    from radar_signal_process_tpu.models.host_parallel import (
        make_cpu_stream_pipeline,
    )

    prof = SMALL
    shape = (prof.n_beams, prof.prt_per_frame, prof.point_prt)
    frames = [
        jnp.asarray((rng.standard_normal(shape)
                     + 1j * rng.standard_normal(shape)).astype(np.complex64))
        for _ in range(3)
    ]
    run = make_cpu_stream_pipeline(prof, 4, 4, max_detections=4)
    seen = []
    run([frames[0]] + [lambda f=f: f for f in frames[1:]],
        lambda w, *a: seen.append(w))
    assert sorted(seen) == [0, 1]

    def boom(w, *a):
        raise RuntimeError("emit failed")

    with pytest.raises(RuntimeError, match="emit failed"):
        run(frames, boom)


def test_stream_detector_probe_rejects_corner_identical_frames(rng):
    """Frames identical in their leading samples but different in the body
    must NOT reuse stale pulse-compression results (ADVICE r4: the old
    16-sample corner probe missed exactly this class)."""
    from radar_signal_process_tpu.models.host_parallel import (
        make_cpu_stream_detector,
    )

    prof = SMALL
    shape = (prof.n_beams, prof.prt_per_frame, prof.point_prt)

    def frame():
        return (rng.standard_normal(shape)
                + 1j * rng.standard_normal(shape)).astype(np.complex64)

    f0, f1, f2 = frame(), frame(), frame()
    # f1_bad: identical leading corner (beam 0, first rows/samples), body
    # differs everywhere else
    f1_bad = frame()
    f1_bad[:1, :4, :16] = f1[:1, :4, :16]

    det = make_cpu_stream_detector(prof, 4, 4, max_detections=8)
    det(f0, f1, frame_idx=0)             # caches f1's compression as idx 1
    got = det(f1_bad, f2, frame_idx=1)   # must detect the content mismatch
    fresh = make_cpu_stream_detector(prof, 4, 4, max_detections=8)
    want = fresh(f1_bad, f2)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_cpu_stream_pipeline_emission_modes_parity(rng):
    """'detections' and 'flags' modes emit bit-identical detections and hit
    counts to 'full' (VERDICT r5 item 1: the device compute is unchanged,
    only the numpy materialization differs)."""
    from radar_signal_process_tpu.models.host_parallel import (
        make_cpu_stream_pipeline,
    )

    prof = SMALL
    shape = (prof.n_beams, prof.prt_per_frame, prof.point_prt)
    frames = [
        jnp.asarray((rng.standard_normal(shape)
                     + 1j * rng.standard_normal(shape)).astype(np.complex64))
        for _ in range(4)
    ]

    def collect(emit_mode):
        run = make_cpu_stream_pipeline(prof, 4, 4, max_detections=8,
                                       emit=emit_mode)
        got = {}
        run(frames, lambda w, r, f, d, h: got.__setitem__(w, (r, f, d, h)))
        return got

    full = collect("full")
    for mode in ("flags", "detections"):
        got = collect(mode)
        assert sorted(got) == sorted(full) == [0, 1, 2]
        for w in full:
            r_f, f_f, d_f, h_f = full[w]
            r_m, f_m, d_m, h_m = got[w]
            assert r_m is None
            if mode == "detections":
                assert f_m is None
            else:
                np.testing.assert_array_equal(f_m, f_f)
            assert h_m == h_f == int(f_f.sum())
            np.testing.assert_array_equal(d_m.v_idx, d_f.v_idx)
            np.testing.assert_array_equal(d_m.r_idx, d_f.r_idx)
            np.testing.assert_array_equal(d_m.amplitude, d_f.amplitude)
            np.testing.assert_array_equal(d_m.valid, d_f.valid)


def test_cpu_stream_pipeline_rejects_bad_emit():
    import pytest

    from radar_signal_process_tpu.models.host_parallel import (
        make_cpu_stream_pipeline,
    )

    with pytest.raises(ValueError, match="emit"):
        make_cpu_stream_pipeline(SMALL, 4, 4, emit="rdm")
