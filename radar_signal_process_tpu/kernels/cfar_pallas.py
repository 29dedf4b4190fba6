"""Fused cascaded 2-D CFAR as a single Pallas TPU kernel.

The whole cropped RDM tile (e.g. 332 x 3404 f32 = 4.5 MB) fits VMEM, so one
kernel invocation computes the velocity-dim CFAR, the dense range-dim CFAR,
and the cascade resolution entirely on-chip: the sliding reference sums are
``2*ref_cells`` static ``pltpu.roll`` shifts feeding the VPU, no intermediate
ever round-trips to HBM.  Semantics are bit-identical to
``ops.cfar.cascaded_cfar2d`` (same reference math as ``executeCFAR.m``);
``tests/test_kernels.py`` checks exact flag equality in interpreter mode.

The batch dimension (beams x slices) maps onto the Pallas grid, one RDM per
program.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radar_signal_process_tpu.config import CFARConfig


def _roll(x: jnp.ndarray, shift: int, axis: int) -> jnp.ndarray:
    """Circular shift via pltpu.roll (which requires a non-negative shift)."""
    return pltpu.roll(x, shift % x.shape[axis], axis=axis)


def _ref_level(x, r, g, method, axis, valid_lo, valid_hi):
    """GO/SO reference level along ``axis`` with index-validity fallback.

    One shared r-term running sum feeds both windows (same summation order
    as ops.cfar so all implementations stay bit-identical).
    """
    acc = x
    for k in range(1, r):
        acc = acc + _roll(x, k, axis)
    left_mean = _roll(acc, g + 1, axis) * (1.0 / r)
    right_mean = _roll(acc, -(g + r), axis) * (1.0 / r)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    left_used = jnp.where(idx >= valid_lo, left_mean, right_mean)
    right_used = jnp.where(idx <= valid_hi, right_mean, left_mean)
    if method == 0:
        return jnp.maximum(left_used, right_used)
    return jnp.minimum(left_used, right_used)


def _make_cfar_kernel(
    cfg: CFARConfig,
    cfg_r: CFARConfig,
    col_offset: int = 0,
    n_global: int | None = None,
):
    """Build the fused CFAR kernel with all parameters baked as Python ints/
    floats in a closure.

    NOTE (session-chip findings, kept for future rounds): masks must be kept
    as float32 — ``pltpu.roll`` on bool operands crashes the Mosaic TPU
    compiler; and this closure form with scalar constants is the variant
    verified to compile on hardware (the equivalent kwargs-dataclass form
    reproducibly failed the remote Mosaic compile — see tools/tpu jobs log).
    """
    rv, gv, mv = cfg.ref_cells, cfg.guard_cells, cfg.method
    tv = float(cfg.threshold)
    rr, gr, mr = cfg_r.ref_cells, cfg_r.guard_cells, cfg_r.method
    tr = float(cfg_r.threshold)
    e = cfg.range_extend_cells
    range_detect = cfg.range_detect
    # range-axis chunking support: local column i corresponds to global
    # column col_offset + i; validity bounds are global (n_global columns)
    p0 = col_offset

    def kernel(used_ref, flag_ref, vflag_ref):
        d = used_ref[0]
        nv, nr = d.shape

        # --- velocity-dim CFAR (axis 0) ---
        vf = d >= _ref_level(d, rv, gv, mv, 0, rv + gv, nv - 1 - (rv + gv)) * tv
        vflag_ref[0] = vf.astype(jnp.float32)
        if not range_detect:
            flag_ref[0] = vf.astype(jnp.float32)
            return

        # --- dense range-dim CFAR (axis 1) ---
        ng = nr if n_global is None else n_global
        rf = (
            d
            >= _ref_level(
                d, rr, gr, mr, 1, (rr + gr) - p0, (ng - 1 - (rr + gr)) - p0
            )
            * tr
        ).astype(d.dtype)

        # --- cascade: strongest confirmed neighbor within +-E ---
        col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        neg = jnp.float32(-jnp.inf)
        bv = jnp.full(d.shape, neg, d.dtype)
        bo = jnp.zeros(d.shape, jnp.int32)
        for dd in range(-e, e + 1):
            cf = _roll(rf, -dd, 1)
            cv = _roll(d, -dd, 1)
            inb = (col + dd >= -p0) & (col + dd <= (nr if n_global is None else n_global) - 1 - p0)
            val = jnp.where((cf > 0) & inb, cv, neg)
            take = val > bv  # strict: first max wins on ties (MATLAB max)
            bv = jnp.where(take, val, bv)
            bo = jnp.where(take, jnp.int32(dd), bo)
        winner = vf & (bv > neg)

        mark = jnp.zeros(d.shape, d.dtype)
        for dd in range(-e, e + 1):
            sel = jnp.where(winner & (bo == dd), jnp.float32(1.0), jnp.float32(0.0))
            mark = mark + _roll(sel, dd, 1)
        flag_ref[0] = (mark > 0).astype(jnp.float32)

    return kernel


def _auto_chunk(cfg: CFARConfig, cfg_r: CFARConfig, nvu: int) -> int:
    """Range-chunk width fitting the double-buffered Mosaic VMEM budget.

    The actual chunked block width is ``chunk + 2*halo`` (the overlap fed to
    the kernel), and 3 f32 blocks (input + two outputs) are double-buffered:
    keep ``2 * 3 * 4 B * nvu * (chunk + 2*halo)`` under ~12 MB.
    """
    budget = 12 * 1024 * 1024
    nvu = max(nvu, 1)
    halo = cfg_r.ref_cells + cfg_r.guard_cells + 2 * cfg.range_extend_cells
    avail_cols = budget // (2 * 3 * 4 * nvu) - 2 * halo
    return max(128, min(1024, avail_cols // 128 * 128))


def cascaded_cfar2d_pallas(
    rdm: jnp.ndarray,
    cfg: CFARConfig,
    n_clutter: int,
    cfg_range: CFARConfig | None = None,
    interpret: bool | None = None,
    max_chunk: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in fused replacement for ``ops.cfar.cascaded_cfar2d``.

    ``rdm``: (..., n_velocity, n_range) float32 magnitude.  Returns bool
    ``(flags, vflags)`` of the full shape.  ``interpret=None`` auto-selects
    interpreter mode off-TPU.

    Wide RDMs are processed in overlapping range chunks (+ a ``ref+guard+2E``
    halo): with a multi-program grid Pallas double-buffers every block, so
    whole-segment blocks would overflow VMEM; chunk validity is evaluated on
    *global* column indices, keeping results bit-identical.
    ``max_chunk=None`` sizes the chunk from the RDM height so the three
    f32 blocks (input + two outputs), double-buffered, stay under the
    Mosaic budget — tall G0-geometry RDMs (~2048 rows) get narrow chunks
    automatically.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cfg_r = cfg_range or cfg

    nv = rdm.shape[-2]
    nr = rdm.shape[-1]
    lo, hi = n_clutter + 1, nv - n_clutter
    if max_chunk is None:
        max_chunk = _auto_chunk(cfg, cfg_r, hi - lo)
    used = rdm[..., lo:hi, :].astype(jnp.float32)
    batch_shape = used.shape[:-2]
    nvu = used.shape[-2]
    used3 = used.reshape((-1, nvu, nr))

    def call_kernel(block, col_offset, n_global):
        bb, _, ncols = block.shape
        kernel = _make_cfar_kernel(cfg, cfg_r, col_offset, n_global)
        return pl.pallas_call(
            kernel,
            grid=(bb,),
            in_specs=[
                pl.BlockSpec(
                    (1, nvu, ncols), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                )
            ],
            out_specs=(
                pl.BlockSpec(
                    (1, nvu, ncols), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, nvu, ncols), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((bb, nvu, ncols), jnp.float32),
                jax.ShapeDtypeStruct((bb, nvu, ncols), jnp.float32),
            ),
            interpret=interpret,
        )(block)

    if nr <= max_chunk:
        flags3, vflags3 = call_kernel(used3, 0, nr)
    else:
        halo = cfg_r.ref_cells + cfg_r.guard_cells + 2 * cfg.range_extend_cells
        f_parts, v_parts = [], []
        for start in range(0, nr, max_chunk):
            stop = min(start + max_chunk, nr)
            p0 = max(0, start - halo)
            p1 = min(nr, stop + halo)
            ff, vv = call_kernel(used3[..., p0:p1], p0, nr)
            f_parts.append(ff[..., start - p0 : stop - p0])
            v_parts.append(vv[..., start - p0 : stop - p0])
        flags3 = jnp.concatenate(f_parts, axis=-1)
        vflags3 = jnp.concatenate(v_parts, axis=-1)

    flags_used = (flags3 > 0).reshape(batch_shape + (nvu, nr))
    vflags_used = (vflags3 > 0).reshape(batch_shape + (nvu, nr))
    flags = jnp.zeros(rdm.shape, dtype=bool).at[..., lo:hi, :].set(flags_used)
    vflags = jnp.zeros(rdm.shape, dtype=bool).at[..., lo:hi, :].set(vflags_used)
    return flags, vflags
