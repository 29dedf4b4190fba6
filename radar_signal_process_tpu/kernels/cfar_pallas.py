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

import functools
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


def _cfar_kernel(
    used_ref,
    flag_ref,
    vflag_ref,
    *,
    cfg: CFARConfig,
    cfg_r: CFARConfig,
):
    x = used_ref[0]
    nv, nr = x.shape
    rg_v = cfg.ref_cells + cfg.guard_cells
    rg_r = cfg_r.ref_cells + cfg_r.guard_cells

    # --- velocity-dim CFAR (axis 0) ---
    ref_v = _ref_level(x, cfg.ref_cells, cfg.guard_cells, cfg.method, 0,
                       rg_v, nv - 1 - rg_v)
    vflag = x >= ref_v * cfg.threshold
    vflag_ref[0] = vflag.astype(jnp.float32)

    if not cfg.range_detect:
        flag_ref[0] = vflag.astype(jnp.float32)
        return

    # --- dense range-dim CFAR (axis 1) ---
    ref_r = _ref_level(x, cfg_r.ref_cells, cfg_r.guard_cells, cfg_r.method, 1,
                       rg_r, nr - 1 - rg_r)
    rflag = x >= ref_r * cfg_r.threshold

    # --- cascade: strongest confirmed neighbor within +-E ---
    e = cfg.range_extend_cells
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    neg_inf = jnp.float32(-jnp.inf)
    best_val = jnp.full(x.shape, neg_inf, dtype=x.dtype)
    best_off = jnp.zeros(x.shape, dtype=jnp.int32)
    for d in range(-e, e + 1):
        # candidate at column c + d (circular roll; masked by bounds)
        cand_flag = _roll(rflag, -d, 1)
        cand_val = _roll(x, -d, 1)
        inb = (col + d >= 0) & (col + d <= nr - 1)
        val = jnp.where(cand_flag & inb, cand_val, neg_inf)
        take = val > best_val  # strict: first max wins on ties (MATLAB max)
        best_val = jnp.where(take, val, best_val)
        best_off = jnp.where(take, jnp.int32(d), best_off)
    winner = vflag & (best_val > neg_inf)

    mark = jnp.zeros(x.shape, dtype=jnp.bool_)
    for d in range(-e, e + 1):
        sel = winner & (best_off == d)
        mark = mark | _roll(sel, d, 1)
    flag_ref[0] = mark.astype(jnp.float32)


def cascaded_cfar2d_pallas(
    rdm: jnp.ndarray,
    cfg: CFARConfig,
    n_clutter: int,
    cfg_range: CFARConfig | None = None,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in fused replacement for ``ops.cfar.cascaded_cfar2d``.

    ``rdm``: (..., n_velocity, n_range) float32 magnitude.  Returns bool
    ``(flags, vflags)`` of the full shape.  ``interpret=None`` auto-selects
    interpreter mode off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cfg_r = cfg_range or cfg

    nv = rdm.shape[-2]
    nr = rdm.shape[-1]
    lo, hi = n_clutter + 1, nv - n_clutter
    used = rdm[..., lo:hi, :].astype(jnp.float32)
    batch_shape = used.shape[:-2]
    nvu = used.shape[-2]
    used3 = used.reshape((-1, nvu, nr))
    b = used3.shape[0]

    kernel = functools.partial(_cfar_kernel, cfg=cfg, cfg_r=cfg_r)
    flags3, vflags3 = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, nvu, nr), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((1, nvu, nr), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nvu, nr), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, nvu, nr), jnp.float32),
            jax.ShapeDtypeStruct((b, nvu, nr), jnp.float32),
        ),
        interpret=interpret,
    )(used3)

    flags_used = (flags3 > 0).reshape(batch_shape + (nvu, nr))
    vflags_used = (vflags3 > 0).reshape(batch_shape + (nvu, nr))
    flags = jnp.zeros(rdm.shape, dtype=bool).at[..., lo:hi, :].set(flags_used)
    vflags = jnp.zeros(rdm.shape, dtype=bool).at[..., lo:hi, :].set(vflags_used)
    return flags, vflags
