"""Host-thread parallel CPU execution of the per-frame pipeline.

XLA's CPU backend executes the thunks of one executable sequentially and
re-computes fused elementwise producers into every CFAR consumer (see
``docs/tpu_design.md`` — "CPU-backend execution findings"), so on CPU the
frame pipeline runs fastest as SEPARATE jitted stage executables dispatched
from host threads over beam chunks.  Outputs are identical to the batched
jitted path (per-row FFTs and elementwise chains are deterministic and
row-independent); ``tests/test_host_parallel.py`` pins that.

These helpers are used by the CLI when the backend is CPU; TPU paths keep
the single batched jit (`make_frame_processor` / `make_detector`).
"""

from __future__ import annotations

import heapq
import os
import threading
from typing import Callable, List

import jax
import jax.numpy as jnp
import numpy as np

from radar_signal_process_tpu.config import CFARConfig, RadarProfile
from radar_signal_process_tpu.ops.mtd import doppler_process, zero_velocity_notch
from radar_signal_process_tpu.ops.pulse_compression import segmented_pulse_compression
from radar_signal_process_tpu.ops.waveforms import reference_pulses
from radar_signal_process_tpu.ops.windows import make_window


def _thread_map(fn: Callable[[int], None], n: int) -> None:
    """Run ``fn(i)`` for i in range(n) across threads; re-raise failures."""
    errors: List[BaseException] = []

    def run(i: int) -> None:
        try:
            fn(i)
        except BaseException as e:  # noqa: BLE001 — re-raised below
            errors.append(e)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]


def two_phase_beam_map(
    parts,
    pc_fn: Callable,
    starts,
    item_fn: Callable,
    n_threads: int,
) -> list:
    """Shared threaded driver for the per-frame chain (bench + CLI).

    Phase 1: each thread runs ``pc_fn`` on its chunk (one compression call
    per chunk, compress-once-per-window semantics).  Phase 2: all threads
    pull ``(chunk, beam, slice)`` work items from one GIL-atomic iterator —
    static per-thread chunks leave a beam imbalance plus OS-scheduling
    variance; the dynamic queue keeps every worker busy to within one slice
    of the end.

    ``item_fn(acc, pc_chunk, chunk_index, beam, w, start) -> acc`` runs per
    item with a per-thread accumulator starting at ``None``; the per-thread
    final accumulators are returned (entries may be ``None``).  Failures
    from any thread re-raise after join; the phase barrier is released in a
    ``finally`` so an error can never deadlock the other workers.
    """
    import itertools

    if len(parts) > n_threads:
        raise ValueError(
            f"{len(parts)} chunks need {len(parts)} phase-1 workers but "
            f"n_threads={n_threads}; chunk by -(-n // n_threads)"
        )
    pcs = [None] * len(parts)
    out: list = [None] * n_threads
    counter = itertools.count()
    items = [
        (ci, b, w, start)
        for ci, p in enumerate(parts)
        for b in range(p.shape[0])
        for w, start in enumerate(starts)
    ]
    barrier = threading.Barrier(n_threads)

    def work(t: int) -> None:
        try:
            if t < len(parts):
                pcs[t] = pc_fn(parts[t])
        finally:
            barrier.wait()
        acc = None
        while True:
            j = next(counter)  # GIL-atomic
            if j >= len(items):
                break
            ci, b, w, start = items[j]
            acc = item_fn(acc, pcs[ci], ci, b, w, start)
        out[t] = acc

    _thread_map(work, n_threads)
    return out


def pipelined_window_map(
    frames,
    pc_fn: Callable,
    starts,
    item_fn: Callable,
    n_threads: int,
    n_chunks: int | None = None,
    on_window_done: Callable[[int], None] | None = None,
) -> list:
    """Cross-frame pipelined driver with per-frame pulse-compression reuse.

    In steady-state streaming, window ``w`` spans frames ``w`` and ``w+1``,
    so every frame's PRT rows are consumed by TWO windows.  Compression is
    per-row and window-independent, so compressing each FRAME once (instead
    of each 2-frame window, as the reference's driver structure implies)
    halves the PC work bit-identically — the Doppler stage re-assembles its
    CPI slice from the two frames' compressed rows.

    Scheduling: one dependency-aware work queue shared by all threads.  PC
    jobs are per (frame, beam-chunk); slice items for (window w, chunk c)
    become ready when frames w and w+1 both have chunk c compressed.  Ready
    items are preferred and drawn lowest-window-first (a min-heap), so
    windows complete in index order — early windows emit early instead of
    riding to the end of the block (A/B vs the earlier LIFO stack: equal
    or slightly better throughput, far better streaming latency); a thread
    with no ready item pulls the next PC job, so frame w+1's compression
    overlaps window w-1's Doppler/CFAR items and no phase barrier ever
    idles a worker.  Compressed chunks are freed as soon as their last
    dependent item completes.

    ``item_fn(acc, pc_a, pc_b, chunk_index, beam, w, slice_idx, start) ->
    acc`` runs per item with a per-thread accumulator starting at ``None``;
    per-thread final accumulators are returned.  Exceptions from any thread
    re-raise after all workers stop.

    A ``frames`` entry may be a CALLABLE returning the frame array — the
    hook for live ingest: a producer thread materializes frames while the
    queue works, and a PC job whose frame is not yet ready blocks only that
    worker (ready Doppler/CFAR items keep the other workers busy).  The
    callable is invoked once, by the first PC job needing it.

    ``on_window_done(w)`` (optional) fires exactly once per window, from
    the worker that completes its last item, outside the queue lock —
    the hook for incremental result emission (windows may complete out of
    index order; callers reorder).  A callback exception aborts the run
    like an item failure.
    """
    n_frames = len(frames)
    frames = list(frames)
    frame_locks = [threading.Lock() for _ in range(n_frames)]

    def _frame(f):
        if callable(frames[f]):
            with frame_locks[f]:
                if callable(frames[f]):
                    frames[f] = frames[f]()
        return frames[f]
    n_windows = n_frames - 1
    if n_windows <= 0:
        return [None] * n_threads
    n_beams = _frame(0).shape[0]
    k = -(-n_beams // (n_chunks or n_threads))
    bounds = [(i, min(i + k, n_beams)) for i in range(0, n_beams, k)]
    n_chunks = len(bounds)
    n_slices = len(starts)

    cond = threading.Condition()
    pcs: dict = {}                      # (f, c) -> compressed chunk
    pc_jobs = [(f, c) for f in range(n_frames) for c in range(n_chunks)]
    next_pc = [0]
    ready: list = []                    # ready-item min-heap on (w, c, b, s)
    items_left = [n_windows * n_beams * n_slices]
    # remaining items per (w, c) and pc refcounts for freeing
    win_chunk_left = {
        (w, c): (bounds[c][1] - bounds[c][0]) * n_slices
        for w in range(n_windows)
        for c in range(n_chunks)
    }
    pc_refs = {
        (f, c): (1 if f > 0 else 0) + (1 if f < n_windows else 0)
        for f in range(n_frames)
        for c in range(n_chunks)
    }
    # raw-frame release: once every chunk of frame f is compressed, the raw
    # frame is dead — without this a live-ingest stream would retain every
    # materialized frame for the whole call
    frame_chunks_left = [n_chunks] * n_frames
    win_items_left = [n_beams * n_slices] * n_windows
    out: list = [None] * n_threads
    errors: List[BaseException] = []

    def work(t: int) -> None:
        acc = None
        # Look-ahead: while the ready stack holds enough work to keep every
        # other worker busy, spend a worker on the next PC job instead —
        # otherwise all workers drain the stack together and then stall in
        # a PC-only bubble before new items exist (measured ~9% idle).
        # The live-chunk cap (~3 frames compressed) stops the look-ahead
        # from degenerating into compress-everything-first, which would
        # blow memory and consume chunks cold.
        pc_cap = 3 * n_chunks

        try:
            while True:
                with cond:
                    job = None
                    while job is None:
                        if errors:       # abort fast; partial results die
                            out[t] = acc
                            return
                        have_pc = (
                            next_pc[0] < len(pc_jobs) and len(pcs) < pc_cap
                        )
                        if ready and not (
                            have_pc and len(ready) > 2 * n_threads
                        ):
                            job = ("item", heapq.heappop(ready))
                        elif have_pc:
                            job = ("pc", pc_jobs[next_pc[0]])
                            next_pc[0] += 1
                        elif items_left[0] == 0:
                            out[t] = acc
                            return
                        else:
                            cond.wait()
                if job[0] == "pc":
                    f, c = job[1]
                    lo, hi = bounds[c]
                    pc = pc_fn(_frame(f)[lo:hi])
                    with cond:
                        pcs[(f, c)] = pc
                        frame_chunks_left[f] -= 1
                        if frame_chunks_left[f] == 0:
                            frames[f] = None  # raw frame dead once compressed
                        for w in (f - 1, f):
                            if (
                                0 <= w < n_windows
                                and (w, c) in pcs
                                and (w + 1, c) in pcs
                            ):
                                for b in range(hi - lo):
                                    for s in range(n_slices):
                                        heapq.heappush(ready, (w, c, b, s))
                        cond.notify_all()
                else:
                    w, c, b, s = job[1]
                    acc = item_fn(
                        acc, pcs[(w, c)], pcs[(w + 1, c)], c, b, w, s, starts[s]
                    )
                    with cond:
                        items_left[0] -= 1
                        win_chunk_left[(w, c)] -= 1
                        if win_chunk_left[(w, c)] == 0:
                            for f in (w, w + 1):
                                pc_refs[(f, c)] -= 1
                                if pc_refs[(f, c)] == 0:
                                    pcs.pop((f, c), None)
                        win_items_left[w] -= 1
                        window_complete = win_items_left[w] == 0
                        cond.notify_all()
                    if window_complete and on_window_done is not None:
                        on_window_done(w)   # outside the lock; may raise
        except BaseException as e:  # noqa: BLE001 — re-raised below
            with cond:
                errors.append(e)
                cond.notify_all()
            out[t] = acc

    _thread_map(work, n_threads)
    if errors:
        raise errors[0]
    return out


def _frame_probe(frame) -> np.ndarray:
    """Strided content sample of a frame for the frame_idx PC-reuse cache.

    Spans every beam and the full PRT/range extent (a few KB), so frames
    that agree only in their leading samples — e.g. blanked/zero leading
    range cells, common in real captures — cannot silently reuse stale
    pulse-compression results (ADVICE r4: the old 16-sample corner probe
    missed bodies differing beyond the first samples).
    """
    f = jnp.asarray(frame)
    sp = max(1, f.shape[-2] // 7)
    ss = max(1, f.shape[-1] // 23)
    return np.asarray(f[..., ::sp, ::ss])


def make_cpu_frame_processor(
    profile: RadarProfile, win_size: int = 4, stc_curve_db=None, pulses=None
):
    """CPU-threaded equivalent of ``make_frame_processor``.

    Returns ``process(frame_now, frame_next) -> np.ndarray`` of shape
    (n_beams, win_size, n_prt, n_points) — the same RDM stack, computed
    with compression-once-per-window semantics and per-slice Doppler+notch,
    beam chunks fanned out over host threads.
    """
    import functools

    from radar_signal_process_tpu.models.mtd_pipeline import window_slice_starts

    window = make_window(
        profile.mtd.window, profile.prt_per_frame, profile.mtd.window_beta
    )
    n_threads = max(1, min(os.cpu_count() or 1, profile.n_beams))
    starts = window_slice_starts(profile.prt_per_frame, win_size)
    # shared PC stage (the fn is row-count agnostic: this processor feeds
    # it the full 2*prt doubled window)
    pc_fn = make_stream_stage_fns(
        profile, stc_curve_db=stc_curve_db, pulses=pulses
    )["pc_fn"]

    # beam index traced + static slice start: the CPI slice stays inside
    # the Doppler executable, so neither the stacked slice tensor nor an
    # eager per-slice copy is ever materialized (the copies contended for
    # memory bandwidth with both worker threads; see bench.py)
    @functools.partial(jax.jit, static_argnums=(2,))
    def rdm_fn(pc, b, start):                    # -> (prt, pts)
        sl = jax.lax.dynamic_slice_in_dim(pc, b, 1, axis=0)[0]
        sl = jax.lax.slice_in_dim(
            sl, start, start + profile.prt_per_frame, axis=-2
        )
        if profile.mtd.mti_lag:
            from radar_signal_process_tpu.ops.mtd import mti_cancel

            sl = mti_cancel(sl, lag=profile.mtd.mti_lag)
        rdm = doppler_process(sl, window, shift=profile.mtd.fftshift)
        if profile.mtd.notch_divisor:
            rdm = zero_velocity_notch(rdm, divisor=profile.mtd.notch_divisor)
        return rdm

    def process(frame_now, frame_next) -> np.ndarray:
        win = jnp.concatenate(
            [jnp.asarray(frame_now), jnp.asarray(frame_next)], axis=-2
        )
        n_beams, total_prt, n_pts = win.shape
        prt = total_prt // 2
        k = -(-n_beams // n_threads)
        bounds = [(i, min(i + k, n_beams)) for i in range(0, n_beams, k)]
        parts = [win[lo:hi] for lo, hi in bounds]
        offsets = [lo for lo, _ in bounds]
        real_dtype = np.float64 if win.dtype == jnp.complex128 else np.float32
        out = np.empty((n_beams, win_size, prt, n_pts), dtype=real_dtype)

        def item(acc, pc, ci, b, w, start):
            out[offsets[ci] + b, w] = np.asarray(
                rdm_fn(pc, jnp.int32(b), start)
            )
            return acc

        two_phase_beam_map(parts, pc_fn, starts, item, n_threads)
        return out

    return process


def make_cpu_stream_processor(
    profile: RadarProfile, win_size: int = 4, stc_curve_db=None, pulses=None
):
    """Sequential-frame variant of ``make_cpu_frame_processor`` with
    per-frame pulse-compression reuse.

    ``process(frame_now, frame_next, frame_idx=None)`` returns the same
    (n_beams, win_size, n_prt, n_points) RDM stack bit-identically, but
    when called over consecutive ``frame_idx`` values each frame is
    compressed ONCE and reused for both windows it feeds (PC is per-row
    and window-independent) — half the steady-state compression work of
    the per-window form.  The Doppler executable re-assembles each CPI
    slice from the two frames' compressed rows.
    """
    import functools

    from radar_signal_process_tpu.models.mtd_pipeline import window_slice_starts

    window = make_window(
        profile.mtd.window, profile.prt_per_frame, profile.mtd.window_beta
    )
    n_threads = max(1, min(os.cpu_count() or 1, profile.n_beams))
    n_prt = profile.prt_per_frame
    starts = window_slice_starts(n_prt, win_size)
    # shared PC stage (iSTC applied per frame before compression — per-row
    # along fast time, fun_iSTC.m:12-15, so bit-equal to the window form);
    # the standard-layout Doppler fns below are this processor's own
    # contract (the detector/bench chains use the range-major forms)
    pc_fn = make_stream_stage_fns(
        profile, stc_curve_db=stc_curve_db, pulses=pulses
    )["pc_fn"]

    def _doppler(sl):
        if profile.mtd.mti_lag:
            from radar_signal_process_tpu.ops.mtd import mti_cancel

            sl = mti_cancel(sl, lag=profile.mtd.mti_lag)
        rdm = doppler_process(sl, window, shift=profile.mtd.fftshift)
        if profile.mtd.notch_divisor:
            rdm = zero_velocity_notch(rdm, divisor=profile.mtd.notch_divisor)
        return rdm

    @jax.jit
    def rdm_first_fn(pc_a, b):                   # slice start == 0
        return _doppler(jax.lax.dynamic_slice_in_dim(pc_a, b, 1, axis=0)[0])

    @functools.partial(jax.jit, static_argnums=(3,))
    def rdm_pair_fn(pc_a, pc_b, b, start):
        a = jax.lax.dynamic_slice_in_dim(pc_a, b, 1, axis=0)[0]
        bb = jax.lax.dynamic_slice_in_dim(pc_b, b, 1, axis=0)[0]
        ra = jax.lax.slice_in_dim(a, start, n_prt, axis=-2)
        rb = jax.lax.slice_in_dim(bb, 0, start, axis=-2)
        return _doppler(jnp.concatenate([ra, rb], axis=-2))

    cache: dict = {}

    def process(frame_now, frame_next, frame_idx=None) -> np.ndarray:
        now = jnp.asarray(frame_now)
        nxt = jnp.asarray(frame_next)
        n_beams, _, n_pts = now.shape
        k = -(-n_beams // n_threads)
        bounds = [(i, min(i + k, n_beams)) for i in range(0, n_beams, k)]
        offsets = [lo for lo, _ in bounds]
        real_dtype = np.float64 if now.dtype == jnp.complex128 else np.float32
        out = np.empty((n_beams, win_size, n_prt, n_pts), dtype=real_dtype)

        # the cache trusts frame_idx to mean "the same frame data as last
        # call's frame_next"; a strided content probe guards against callers
        # reusing indices for different data (silent wrong results)
        probe = _frame_probe(now)
        hit = cache.pop(frame_idx, None) if frame_idx is not None else None
        if hit is not None and np.array_equal(hit[1], probe):
            pcs_now = hit[0]
            need_now = False
        else:
            pcs_now = [None] * len(bounds)
            need_now = True
        pcs_nxt = [None] * len(bounds)

        def pc_phase(ci):
            lo, hi = bounds[ci]
            if need_now:
                pcs_now[ci] = pc_fn(now[lo:hi])
            pcs_nxt[ci] = pc_fn(nxt[lo:hi])

        # phase 1: compress missing frames per chunk (threaded); phase 2:
        # dynamic queue over (chunk, beam, slice) items
        _thread_map(pc_phase, len(bounds))
        import itertools

        counter = itertools.count()
        items = [
            (ci, b, w, start)
            for ci, (lo, hi) in enumerate(bounds)
            for b in range(hi - lo)
            for w, start in enumerate(starts)
        ]

        def work(t):
            while True:
                j = next(counter)  # GIL-atomic
                if j >= len(items):
                    return
                ci, b, w, start = items[j]
                if start == 0:
                    rdm = rdm_first_fn(pcs_now[ci], jnp.int32(b))
                else:
                    rdm = rdm_pair_fn(
                        pcs_now[ci], pcs_nxt[ci], jnp.int32(b), start
                    )
                out[offsets[ci] + b, w] = np.asarray(rdm)

        _thread_map(work, n_threads)
        if frame_idx is not None:
            cache.clear()
            cache[frame_idx + 1] = (pcs_nxt, _frame_probe(nxt))
        return out

    return process


def make_stream_stage_fns(
    profile: RadarProfile, stc_curve_db=None, pulses=None
):
    """Shared jitted per-item stages of the CPU streaming chains.

    ONE definition of the bit-parity-critical stage math (PC with optional
    iSTC; range-major windowed Doppler spectrum with optional MTI, for a
    whole frame or a cross-frame CPI slice; magnitude + fftshift + notch)
    used by both the benchmark chain (``bench._make_cpu_stage_fns``) and
    the production stream detector — keeping the chains in lockstep is a
    standing parity hazard (CLAUDE.md).

    Returns ``dict(pc_fn, spec_first_fn, spec_pair_fn, mag_fn)``:

    * ``pc_fn(beams)``: (b, n_rows, pts) -> compressed, same shape;
    * ``spec_first_fn(pc_a, b)`` / ``spec_pair_fn(pc_a, pc_b, b, start)``:
      traced beam index + static slice start -> (pts, n_prt) complex
      range-major spectrum (the CPI slice never materializes eagerly);
    * ``mag_fn(spec_t)``: magnitude + fftshift + MTD notch, range-major.
    """
    import functools

    pulses = reference_pulses(profile) if pulses is None else pulses
    n_prt = profile.prt_per_frame
    window = make_window(profile.mtd.window, n_prt, profile.mtd.window_beta)
    w_col = jnp.asarray(window)[:, None]

    @jax.jit
    def pc_fn(beams):                            # (b, n_rows, pts)
        if profile.mtd.istc and stc_curve_db is not None:
            from radar_signal_process_tpu.ops.mtd import istc_compensate

            beams = istc_compensate(beams, stc_curve_db)
        return segmented_pulse_compression(beams, profile, pulses)

    def _spec(sl):
        # windowed slow-time FFT emitted range-major (internally free)
        if profile.mtd.mti_lag:
            from radar_signal_process_tpu.ops.mtd import mti_cancel

            sl = mti_cancel(sl, lag=profile.mtd.mti_lag)
        w = w_col.astype(jnp.real(sl).dtype)
        return jnp.matrix_transpose(jnp.fft.fft(sl * w, axis=-2))

    @jax.jit
    def spec_first_fn(pc_a, b):                  # slice start == 0
        return _spec(jax.lax.dynamic_slice_in_dim(pc_a, b, 1, axis=0)[0])

    @functools.partial(jax.jit, static_argnums=(3,))
    def spec_pair_fn(pc_a, pc_b, b, start):
        a = jax.lax.dynamic_slice_in_dim(pc_a, b, 1, axis=0)[0]
        bb = jax.lax.dynamic_slice_in_dim(pc_b, b, 1, axis=0)[0]
        ra = jax.lax.slice_in_dim(a, start, n_prt, axis=-2)
        rb = jax.lax.slice_in_dim(bb, 0, start, axis=-2)
        return _spec(jnp.concatenate([ra, rb], axis=-2))

    @jax.jit
    def mag_fn(spec_t):                          # (pts, prt) -> notched |.|
        mag = jnp.abs(spec_t)
        if profile.mtd.fftshift:
            mag = mag[:, np.fft.fftshift(np.arange(n_prt))]
        if profile.mtd.notch_divisor:
            mag = zero_velocity_notch(
                mag, divisor=profile.mtd.notch_divisor, velocity_axis=-1
            )
        return mag

    return dict(
        pc_fn=pc_fn, spec_first_fn=spec_first_fn, spec_pair_fn=spec_pair_fn,
        mag_fn=mag_fn,
    )


def _make_detect_item(fns, split_det, extract):
    """Shared per-item detect compute of the two stream paths: CPI-slice
    spectrum -> magnitude -> split cascade -> extraction, all range-major.
    ONE definition so the paths cannot desynchronize."""
    spec_first_fn, spec_pair_fn = fns["spec_first_fn"], fns["spec_pair_fn"]
    mag_fn = fns["mag_fn"]

    def compute(pc_a, pc_b, b, start):
        if start == 0:
            spec_t = spec_first_fn(pc_a, jnp.int32(b))
        else:
            spec_t = spec_pair_fn(pc_a, pc_b, jnp.int32(b), start)
        rdm_t = mag_fn(spec_t)
        flags_t, _ = split_det(rdm_t)
        dets = extract(flags_t, rdm_t)
        return rdm_t, flags_t, dets

    return compute


EMIT_MODES = ("detections", "flags", "full")

# per-plane cascade-hit count, summed ON DEVICE so reduced emission modes
# never materialize the bool plane host-side
_flags_hits = jax.jit(lambda f: jnp.sum(f, dtype=jnp.int32))


def _alloc_detect_buffers(n_beams, win_size, n_prt, n_pts, kd, real_dtype,
                          emit="full"):
    """Per-window numpy result buffers for the requested emission mode.

    ``full`` materializes the RDM + flag stacks (~290 MB of numpy writes
    per window at G2 geometry); ``flags`` drops the RDM planes;
    ``detections`` drops both and keeps only the per-(beam, slice)
    DetectionList plus a per-plane CFAR-hit counter.  The reference's
    stage 3 persists only flag matrices (``main_cfar.m:97``) — RDM
    persistence is a stage-2 choice (``main_produce_dataset_win_xzr_v2.m:
    160-162``) — so a live detections-first chain need not pay the
    full-stack materialization.
    """
    buf = dict(
        det_v=np.zeros((n_beams, win_size, kd), np.int32),
        det_r=np.zeros((n_beams, win_size, kd), np.int32),
        det_amp=np.zeros((n_beams, win_size, kd), real_dtype),
        det_valid=np.zeros((n_beams, win_size, kd), bool),
    )
    if emit == "full":
        buf["rdm"] = np.empty((n_beams, win_size, n_prt, n_pts), real_dtype)
    if emit in ("full", "flags"):
        buf["flags"] = np.empty((n_beams, win_size, n_prt, n_pts), bool)
    else:
        buf["hits"] = np.zeros((n_beams, win_size), np.int64)
    return buf


def _write_detect_outputs(buf, gb, s, rdm_t, flags_t, dets):
    """Transposed-layout result writes, incl. the parity-critical index
    swap (extraction ran on the (range, velocity) layout).  Only the
    planes the emission mode allocated are materialized; reduced modes
    replace the flag plane with its on-device hit count."""
    if "rdm" in buf:
        buf["rdm"][gb, s] = np.asarray(rdm_t).T
    if "flags" in buf:
        buf["flags"][gb, s] = np.asarray(flags_t).T
    else:
        buf["hits"][gb, s] = int(_flags_hits(flags_t))
    buf["det_v"][gb, s] = np.asarray(dets.r_idx)
    buf["det_r"][gb, s] = np.asarray(dets.v_idx)
    buf["det_amp"][gb, s] = np.asarray(dets.amplitude)
    buf["det_valid"][gb, s] = np.asarray(dets.valid)


def make_cpu_stream_detector(
    profile: RadarProfile,
    win_size: int = 4,
    n_clutter: int = 14,
    cfg: CFARConfig | None = None,
    max_detections: int = 64,
    stc_curve_db=None,
    renotch_divisor: int | None = 20,
    pulses=None,
):
    """Streaming frame processor with CFAR + detection folded into the queue.

    The WINDOW-AT-A-TIME form: like :func:`make_cpu_stream_processor`
    (per-frame PC reuse across consecutive windows), but every
    (chunk, beam, slice) work item ALSO runs the split CFAR cascade and the
    per-RDM detection extraction right after its Doppler transform — one
    threaded pass produces RDMs, flags and detections with no second
    dispatch sweep over a materialized 72 MB stack.  The production stream
    path is the block-pipelined :func:`make_cpu_stream_pipeline`, which
    adds cross-window overlap; use this form when exactly one window is
    needed per call.

    Per-item compute runs in the range-major layout (the FFT emits it free;
    the velocity-dim CFAR then walks the contiguous axis — see CLAUDE.md),
    transposed back only at the numpy write.

    Returns ``process(frame_now, frame_next, frame_idx=None) ->
    (rdms, flags, DetectionList)`` with rdms/flags
    (n_beams, win_size, n_prt, n_points) in standard (velocity, range)
    layout and the DetectionList batched over (n_beams, win_size).
    """
    import functools
    import itertools

    from radar_signal_process_tpu.models.detect import make_cascade_detector
    from radar_signal_process_tpu.models.mtd_pipeline import window_slice_starts
    from radar_signal_process_tpu.ops.measure import extract_detections

    cfg = cfg or profile.cfar
    n_threads = max(1, min(os.cpu_count() or 1, profile.n_beams))
    n_prt = profile.prt_per_frame
    starts = window_slice_starts(n_prt, win_size)
    fns = make_stream_stage_fns(profile, stc_curve_db=stc_curve_db,
                                pulses=pulses)
    pc_fn = fns["pc_fn"]

    split_det = make_cascade_detector(
        profile, n_clutter, cfg=cfg, renotch_divisor=renotch_divisor,
        transposed=True,
    )
    extract = jax.jit(
        functools.partial(extract_detections, max_detections=max_detections)
    )
    compute_item = _make_detect_item(fns, split_det, extract)

    cache: dict = {}

    def process(frame_now, frame_next, frame_idx=None):
        now = jnp.asarray(frame_now)
        nxt = jnp.asarray(frame_next)
        n_beams, _, n_pts = now.shape
        k = -(-n_beams // n_threads)
        bounds = [(i, min(i + k, n_beams)) for i in range(0, n_beams, k)]
        offsets = [lo for lo, _ in bounds]
        real_dtype = np.float64 if now.dtype == jnp.complex128 else np.float32
        kd = min(max_detections, n_prt * n_pts)
        buf = _alloc_detect_buffers(n_beams, win_size, n_prt, n_pts, kd,
                                    real_dtype)

        probe = _frame_probe(now)
        hit = cache.pop(frame_idx, None) if frame_idx is not None else None
        if hit is not None and np.array_equal(hit[1], probe):
            pcs_now = hit[0]
            need_now = False
        else:
            pcs_now = [None] * len(bounds)
            need_now = True
        pcs_nxt = [None] * len(bounds)

        def pc_phase(ci):
            lo, hi = bounds[ci]
            if need_now:
                pcs_now[ci] = pc_fn(now[lo:hi])
            pcs_nxt[ci] = pc_fn(nxt[lo:hi])

        _thread_map(pc_phase, len(bounds))
        counter = itertools.count()
        items = [
            (ci, b, w, start)
            for ci, (lo, hi) in enumerate(bounds)
            for b in range(hi - lo)
            for w, start in enumerate(starts)
        ]

        def work(t):
            while True:
                j = next(counter)  # GIL-atomic
                if j >= len(items):
                    return
                ci, b, w, start = items[j]
                rdm_t, flags_t, dets = compute_item(
                    pcs_now[ci], pcs_nxt[ci], b, start
                )
                _write_detect_outputs(buf, offsets[ci] + b, w, rdm_t,
                                      flags_t, dets)

        _thread_map(work, n_threads)
        if frame_idx is not None:
            cache.clear()
            cache[frame_idx + 1] = (pcs_nxt, _frame_probe(nxt))
        from radar_signal_process_tpu.ops.measure import DetectionList

        dets_all = DetectionList(
            v_idx=buf["det_v"], r_idx=buf["det_r"],
            amplitude=buf["det_amp"], valid=buf["det_valid"],
        )
        return buf["rdm"], buf["flags"], dets_all

    return process


def make_cpu_stream_pipeline(
    profile: RadarProfile,
    win_size: int = 4,
    n_clutter: int = 14,
    cfg: CFARConfig | None = None,
    max_detections: int = 64,
    stc_curve_db=None,
    renotch_divisor: int | None = 20,
    pulses=None,
    n_chunks: int | None = None,
    emit: str = "full",
):
    """Block-pipelined stream runner: windows emit as they complete.

    The throughput form of :func:`make_cpu_stream_detector`: a whole block
    of consecutive frames runs through ONE :func:`pipelined_window_map`
    call (per-frame PC reuse, cross-window overlap, queue look-ahead, the
    fused per-item CFAR + extraction), and each finished window is emitted
    through a callback instead of materializing at a per-window barrier.

    ``emit`` selects the emission mode (see :func:`_alloc_detect_buffers`):
    ``"full"`` materializes RDM + flag stacks, ``"flags"`` drops the RDMs,
    ``"detections"`` materializes neither — detections and hit counts are
    bit-identical across modes (the device-side compute is unchanged; only
    the numpy writes differ).

    Returns ``run(frames, emit_cb)``: ``frames`` is a list of per-frame
    beam cubes (``frames[0]`` must be materialized; later entries may be
    callables for live ingest), ``emit_cb(w, rdms, flags, dets, hits)``
    fires once per window in COMPLETION order (callers reorder by ``w``)
    with the same array contracts as ``make_cpu_stream_detector``;
    ``rdms``/``flags`` are ``None`` when the mode drops them and ``hits``
    is the window's total cascade-flag count.  ``emit_cb`` may be invoked
    CONCURRENTLY from different worker threads (two windows can finish
    simultaneously) — hand off through a thread-safe sink such as
    ``queue.Queue``.
    """
    import functools

    from radar_signal_process_tpu.models.detect import make_cascade_detector
    from radar_signal_process_tpu.models.mtd_pipeline import window_slice_starts
    from radar_signal_process_tpu.ops.measure import (
        DetectionList,
        extract_detections,
    )

    if emit not in EMIT_MODES:
        raise ValueError(f"emit must be one of {EMIT_MODES}, got {emit!r}")
    cfg = cfg or profile.cfar
    n_threads = max(1, min(os.cpu_count() or 1, profile.n_beams))
    n_prt = profile.prt_per_frame
    starts = window_slice_starts(n_prt, win_size)
    fns = make_stream_stage_fns(profile, stc_curve_db=stc_curve_db,
                                pulses=pulses)
    pc_fn = fns["pc_fn"]
    split_det = make_cascade_detector(
        profile, n_clutter, cfg=cfg, renotch_divisor=renotch_divisor,
        transposed=True,
    )
    extract = jax.jit(
        functools.partial(extract_detections, max_detections=max_detections)
    )
    compute_item = _make_detect_item(fns, split_det, extract)
    emit_mode = emit

    def run(frames, emit_cb) -> None:
        first = frames[0]
        if callable(first):
            raise ValueError("frames[0] must be a materialized array")
        n_beams, _, n_pts = first.shape
        chunks = n_chunks if n_chunks is not None else n_beams
        # the queue's chunk bounds, reproduced (same formula) for the
        # global-beam mapping of each (chunk, local-beam) item
        k = -(-n_beams // chunks)
        offsets = [lo for lo in range(0, n_beams, k)]
        real_dtype = (
            np.float64 if np.asarray(first[:1, :1, :1]).dtype == np.complex128
            else np.float32
        )
        kd = min(max_detections, n_prt * n_pts)
        buffers: dict = {}
        buf_lock = threading.Lock()

        def _buf(w):
            with buf_lock:
                b = buffers.get(w)
                if b is None:
                    b = _alloc_detect_buffers(
                        n_beams, win_size, n_prt, n_pts, kd, real_dtype,
                        emit=emit_mode,
                    )
                    buffers[w] = b
                return b

        def item(acc, pc_a, pc_b, c, b, w, s, start):
            rdm_t, flags_t, dets = compute_item(pc_a, pc_b, b, start)
            _write_detect_outputs(_buf(w), offsets[c] + b, s, rdm_t,
                                  flags_t, dets)
            return acc

        def on_done(w):
            with buf_lock:
                b = buffers.pop(w)
            hits = (int(b["hits"].sum()) if "hits" in b
                    else int(b["flags"].sum()))
            emit_cb(
                w, b.get("rdm"), b.get("flags"),
                DetectionList(
                    v_idx=b["det_v"], r_idx=b["det_r"],
                    amplitude=b["det_amp"], valid=b["det_valid"],
                ),
                hits,
            )

        pipelined_window_map(
            frames, pc_fn, starts, item, n_threads, n_chunks=chunks,
            on_window_done=on_done,
        )

    return run


def make_cpu_flags(
    profile: RadarProfile,
    n_clutter: int,
    cfg: CFARConfig | None = None,
    renotch_divisor: int | None = 20,
):
    """CPU-threaded CFAR over an RDM stack (..., n_v, n_r) -> (flags, vflags).

    Fans the leading batch dimensions out over host threads, one jitted
    per-RDM detector executable; results match the batched ``detect_rdm``
    exactly.
    """
    n_threads = max(1, os.cpu_count() or 1)

    from radar_signal_process_tpu.models.detect import make_split_detector

    one = make_split_detector(
        profile, n_clutter, cfg=cfg, renotch_divisor=renotch_divisor
    )

    def flags_fn(rdms) -> tuple[np.ndarray, np.ndarray]:
        # host-side views, NOT device-array reshaping: eager indexing of a
        # device array dispatches a slice executable and copies per j
        # (CLAUDE.md round-2 finding); numpy views are free and the jitted
        # detector uploads each 2-D RDM exactly once either way
        rdms = np.asarray(rdms)
        batch_shape = rdms.shape[:-2]
        flat = rdms.reshape((-1,) + rdms.shape[-2:])
        n = flat.shape[0]
        flags = np.empty(flat.shape, dtype=bool)
        vflags = np.empty(flat.shape, dtype=bool)
        k = -(-n // n_threads)
        chunks = [(i, min(i + k, n)) for i in range(0, n, k)]

        def work(ci: int) -> None:
            lo, hi = chunks[ci]
            for j in range(lo, hi):
                f, v = one(flat[j])
                flags[j] = np.asarray(f)
                vflags[j] = np.asarray(v)

        _thread_map(work, len(chunks))
        shape = batch_shape + rdms.shape[-2:]
        return flags.reshape(shape), vflags.reshape(shape)

    return flags_fn
