"""Analytic HBM-traffic / FLOP models of the Pallas kernels.

Device timing is unobservable through the session TPU relay (CLAUDE.md), so
the v5e projections in the judged bench are DERIVED from each kernel's own
launch structure instead of hard-coded (VERDICT r4 item 4):

* HBM bytes follow the BlockSpec index maps — a block is (re)fetched
  whenever its index-map value changes between consecutive grid steps
  (grid iteration is row-major, last axis innermost), which is how Mosaic
  schedules block copies; DMA-streamed operands (``memory_space=ANY``)
  count once per explicit ``make_async_copy`` sweep.
* FLOPs come from the MXU matmul shapes (a complex matmul carried as four
  real ``jnp.dot``s of (m, k, n) costs ``8*m*k*n``) plus a per-element
  count of the VPU elementwise work.

The models mirror the tiling/chunk selection logic of the kernels they
describe (importing the same helpers), so a kernel-side retune moves the
projection automatically.  Scope: ``pallas_call`` traffic only — the XLA
glue around a kernel (reshapes, the CFAR edge scatter back into the full
RDM shape) is separate executables and excluded.

``tests/test_kernels.py`` pins these models against the roofline table in
``docs/tpu_design.md``.
"""

from __future__ import annotations

import math

from radar_signal_process_tpu.config import CFARConfig

# public v5e spec peaks, shared with bench.CHIP_PEAKS: 197 bf16 TFLOP/s
# halved for f32, 819 GB/s HBM, 1600 Gbps interchip interconnect per chip
V5E_PEAK_F32 = 197e12 / 2
V5E_HBM_BPS = 819e9
V5E_ICI_BPS = 1600e9 / 8


def sol_seconds(flops: float, hbm_bytes: float,
                peak_flops: float = V5E_PEAK_F32,
                hbm_bw: float = V5E_HBM_BPS) -> float:
    """Roofline speed-of-light time: max of compute and memory bounds."""
    return max(flops / peak_flops, hbm_bytes / hbm_bw)


def cascaded_cfar_cost(
    batch: int,
    n_velocity: int,
    n_range: int,
    n_clutter: int,
    cfg: CFARConfig,
    cfg_range: CFARConfig | None = None,
    max_chunk: int | None = None,
) -> dict:
    """Traffic/FLOP model of ``cfar_pallas.cascaded_cfar2d_pallas``.

    One grid program per (batch, range-chunk): the input block is read once
    and both f32 flag planes written once, all compute in VMEM — so HBM
    traffic is 3 f32 planes over the used rows, plus the re-read/re-written
    halo columns of chunked wide RDMs.  Chunk widths reproduce
    ``_auto_chunk`` exactly.
    """
    from radar_signal_process_tpu.kernels.cfar_pallas import _auto_chunk

    cfg_r = cfg_range or cfg
    lo, hi = n_clutter + 1, n_velocity - n_clutter
    nvu = hi - lo
    if max_chunk is None:
        max_chunk = _auto_chunk(cfg, cfg_r, nvu)
    if n_range <= max_chunk:
        cols = n_range
    else:
        halo = cfg_r.ref_cells + cfg_r.guard_cells + 2 * cfg.range_extend_cells
        cols = 0
        for start in range(0, n_range, max_chunk):
            stop = min(start + max_chunk, n_range)
            cols += min(n_range, stop + halo) - max(0, start - halo)
    hbm_bytes = batch * nvu * cols * 4 * 3       # 1 read + 2 f32 planes out

    # VPU work per element (see _make_cfar_kernel): the velocity and range
    # reference levels each cost (ref-1) running-sum adds + 2 mean scales +
    # 4 select/compare ops + 2 threshold ops; the cascade scans 2E+1
    # neighbor offsets twice (~10 ops each: roll-compare-select, then the
    # winner scatter)
    e = cfg.range_extend_cells
    per_elem = (cfg.ref_cells + 8) + (cfg_r.ref_cells + 8) + 10 * (2 * e + 1)
    flops = float(batch * nvu * n_range * per_elem)
    return {"hbm_bytes": float(hbm_bytes), "flops": flops,
            "sol_s": sol_seconds(flops, hbm_bytes)}


def rdm_former_cost(
    batch: int,
    n_pulses: int,
    n_range: int,
    n_fft: int | None = None,
    tile: int | None = None,
    chunk: int | None = None,
) -> dict:
    """Traffic/FLOP model of ``rdm_pallas.doppler_rdm_pallas``.

    Grid (batch, k_tiles, range-chunks), range innermost: the W tile
    (index ``(k, 0)``) is fetched once per (batch, k) and held across the
    range sweep; the PC block (index ``(i, 0, j)``) re-streams every step —
    the X-re-streamed-per-Doppler-tile cost the fused PC+RDM kernel
    removes; the magnitude tile is written once per step.  Tile selection
    comes from the kernel's own ``select_tiles`` (single 8-aligned Doppler
    tile when it fits — no power-of-two row padding waste).
    """
    from radar_signal_process_tpu.kernels.rdm_pallas import select_tiles

    n_fft = n_fft or n_pulses
    t, chunk = select_tiles(n_pulses, n_fft, tile, chunk,
                            n_range=n_range)
    k_tiles = -(-n_fft // t)
    n_chunks = -(-n_range // chunk)
    padded_k = k_tiles * t
    padded_r = n_chunks * chunk

    w_bytes = batch * k_tiles * (t * n_pulses * 4 * 2)
    x_bytes = batch * k_tiles * n_chunks * (n_pulses * chunk * 4 * 2)
    out_bytes = batch * padded_k * padded_r * 4
    hbm_bytes = float(w_bytes + x_bytes + out_bytes)
    # 4 real (t, n, chunk) dots per step + ~4 VPU ops/element of magnitude
    flops = float(
        batch * padded_k * n_pulses * padded_r * 8
        + batch * padded_k * padded_r * 4
    )
    return {"hbm_bytes": hbm_bytes, "flops": flops,
            "sol_s": sol_seconds(flops, hbm_bytes)}


def fused_pc_rdm_cost(
    batch: int,
    n_prt: int,
    n_in: int,
    n_out: int,
    n_fft: int,
    tile_k: int = 128,
    tile_r: int = 128,
) -> dict:
    """Traffic/FLOP model of ``pc_rdm_pallas.fused_pc_rdm_pallas``.

    Grid (batch, r_tiles, k_tiles), Doppler innermost: the echo planes DMA-
    stream through the VMEM slot once per (batch, range-tile) while
    P = X @ M accumulates in scratch (the compressed pulses never touch
    HBM — the round-trip the fusion removes); the PC-matrix tile loads once
    per (batch, range-tile); the Doppler plane W re-streams once per range
    tile; the magnitude tile writes once.
    """
    from radar_signal_process_tpu.kernels.pc_rdm_pallas import _stream_chunk

    n_in_pad = -(-n_in // tile_r) * tile_r
    n_out_pad = -(-n_out // tile_r) * tile_r
    n_prt_pad, _ = _stream_chunk(n_prt)
    r_tiles = n_out_pad // tile_r
    k_tiles = n_fft // tile_k

    x_bytes = batch * r_tiles * (n_prt_pad * n_in_pad * 4 * 2)
    m_bytes = batch * r_tiles * (n_in_pad * tile_r * 4 * 2)
    w_bytes = batch * r_tiles * k_tiles * (tile_k * n_prt_pad * 4 * 2)
    out_bytes = batch * n_fft * n_out_pad * 4
    hbm_bytes = float(x_bytes + m_bytes + w_bytes + out_bytes)
    flops = float(
        batch * n_prt_pad * n_in_pad * n_out_pad * 8      # P = X @ M
        + batch * n_fft * n_prt_pad * n_out_pad * 8       # W @ P
        + batch * n_fft * n_out_pad * 4                   # |.|
    )
    return {"hbm_bytes": hbm_bytes, "flops": flops,
            "sol_s": sol_seconds(flops, hbm_bytes)}


def sharded_stream_comm_cost(
    prof=None,
    dp: int = 1,
    sp: int = 2,
    win_size: int = 4,
    n_clutter: int = 14,
    cfg: CFARConfig | None = None,
    ici_bw: float = V5E_ICI_BPS,
) -> dict:
    """Per-window collective traffic of ``parallel.make_sharded_stream`` on
    a (dp, sp) mesh, and the projected multi-chip scaling efficiency.

    Real multi-chip timing is impossible on the single-chip session relay,
    so this is the analytic scaling proxy toward the BASELINE north star
    (>= 80% efficiency to 2 hosts): collective bytes per window counted
    from the sharded stream's actual program structure —

    * ONE ``all_to_all`` re-shards the freshly compressed frame from
      slow-time-sharded to range-sharded (``sharding.py::compress``): each
      chip sends ``(sp-1)/sp`` of its (beams/dp, n_prt/sp, n_points)
      complex64 shard;
    * ONE halo ``ppermute`` pair in the cascaded CFAR exchanges
      ``ref + guard + 2*extend`` edge columns per side over the used
      velocity rows and ``win_size`` slices;
    * ``dp`` is pure data parallelism — no per-window collective rides it,
      which is why dp is the axis to place across the DCN host boundary
      (sp and its collectives stay on intra-host ICI).

    Compute per chip is the v5e roofline of the per-window stages
    (memory-bound PC estimate + the RDM-former and fused-CFAR models)
    divided across the mesh; efficiency is the conservative no-overlap
    ratio ``compute / (compute + comm)``.
    """
    from radar_signal_process_tpu.config import G2_PROFILE

    prof = prof or G2_PROFILE
    cfg = cfg or CFARConfig(threshold=5.0)
    n_beams, n_prt, n_pts = prof.n_beams, prof.prt_per_frame, prof.point_prt
    n_chips = dp * sp

    # all_to_all: per-chip send volume (complex64 compressed frame shard)
    shard_elems = (n_beams / dp) * (n_prt / sp) * n_pts
    a2a_bytes_chip = shard_elems * 8 * (sp - 1) / sp if sp > 1 else 0.0
    # CFAR halo: h columns per side, both directions, f32 magnitude rows
    h = cfg.ref_cells + cfg.guard_cells + 2 * cfg.range_extend_cells
    nvu = (n_prt - n_clutter) - (n_clutter + 1)
    halo_bytes_chip = (
        (n_beams / dp) * win_size * nvu * h * 4 * 2 if sp > 1 else 0.0
    )
    comm_s = (a2a_bytes_chip + halo_bytes_chip) / ici_bw

    # single-chip per-window compute SOL: PC is memory-bound (frame in +
    # compressed out, complex64), then the RDM-former and fused-CFAR models
    pc_bytes = 2 * n_beams * n_prt * n_pts * 8
    pc_s = pc_bytes / V5E_HBM_BPS
    rdm_s = rdm_former_cost(n_beams * win_size, n_prt, n_pts)["sol_s"]
    cfar_s = cascaded_cfar_cost(n_beams * win_size, n_prt, n_pts,
                                n_clutter, cfg)["sol_s"]
    compute_chip_s = (pc_s + rdm_s + cfar_s) / n_chips
    eff = compute_chip_s / (compute_chip_s + comm_s)
    return {
        "n_chips": n_chips,
        "a2a_mb_per_chip": round(a2a_bytes_chip / 1e6, 2),
        "halo_mb_per_chip": round(halo_bytes_chip / 1e6, 3),
        "comm_ms": round(comm_s * 1e3, 4),
        "compute_ms_per_chip": round(compute_chip_s * 1e3, 3),
        "efficiency_pct": round(100.0 * eff, 1),
    }


def g2_frame_fused_cfar_projection(prof=None, n_clutter: int = 14,
                                   threshold: float = 5.0) -> dict:
    """v5e projection of the fused CFAR over one full G2 frame (13 beams x
    4 slices) — the judged bench's ``sol_ms_v5e_fused_kernel`` source."""
    from radar_signal_process_tpu.config import G2_PROFILE

    prof = prof or G2_PROFILE
    cfg = CFARConfig(threshold=threshold)
    return cascaded_cfar_cost(
        prof.n_beams * 4, prof.prt_per_frame, prof.point_prt, n_clutter, cfg
    )
