"""Fused RDM former: windowed Doppler DFT + magnitude + clutter notch.

The reference forms the RDM with a per-range-bin windowed FFT followed by
magnitude and a zero-velocity notch (``fun_Process_MTD.m`` +
``fun_0v_pressing.m``).  On TPU, the non-power-of-two CPI lengths make the
FFT a Bluestein fallback; this kernel instead contracts each range chunk
against a precomputed windowed/shifted DFT matrix on the MXU and applies
magnitude + notch in VMEM before anything returns to HBM — one fused pass,
complex arithmetic carried as separate re/im float32 planes (Mosaic has no
complex dtype).

The DFT plane is tiled over Doppler output rows, so any CPI length fits the
Mosaic VMEM budget (block bytes x 2 double-buffered copies, kept under
~12 MB — see CLAUDE.md); zero-padded transforms (``n_fft > n_pulses``, the
G0 chain's 1536 -> 2048-point MTD FFT, ``DMX_SignalProcessing_main_xzr.m:
120,413-418``) fold the padding into a rectangular plane instead of moving
padded zeros.

Bit-parity with ``ops.mtd.doppler_process(use_matmul=True)`` +
``zero_velocity_notch`` is checked in ``tests/test_kernels.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radar_signal_process_tpu.config import matlab_round
from radar_signal_process_tpu.ops.mtd import _dft_matrix_rect

VMEM_BLOCK_BUDGET = 12 * 1024 * 1024  # double-buffered block bytes (CLAUDE.md)


def _make_rdm_kernel(notch_lo: int, notch_hi: int, tile_k: int):
    """Kernel closure (scalar constants baked; see cfar_pallas notes)."""

    def kernel(wre_ref, wim_ref, xre_ref, xim_ref, out_ref):
        wre, wim = wre_ref[...], wim_ref[...]
        xre, xim = xre_ref[0], xim_ref[0]
        sre = jnp.dot(wre, xre, preferred_element_type=jnp.float32) - jnp.dot(
            wim, xim, preferred_element_type=jnp.float32
        )
        sim = jnp.dot(wre, xim, preferred_element_type=jnp.float32) + jnp.dot(
            wim, xre, preferred_element_type=jnp.float32
        )
        mag = jnp.sqrt(sre * sre + sim * sim)
        if notch_hi >= notch_lo:
            k0 = pl.program_id(1) * tile_k
            row = k0 + jax.lax.broadcasted_iota(jnp.int32, mag.shape, 0)
            keep = (row < notch_lo) | (row > notch_hi)
            mag = jnp.where(keep, mag, jnp.float32(0.0))
        out_ref[0] = mag

    return kernel


def _auto_tile(n: int, n_fft: int) -> int:
    """Largest square tile whose blocks fit the double-buffered VMEM budget."""
    for t in (1024, 512, 384, 256, 128, 64):
        # W tile (t, n) re+im, x block (n, t) re+im, out (t, t) f32
        block_bytes = t * n * 8 + n * t * 8 + t * t * 4
        if 2 * block_bytes <= VMEM_BLOCK_BUDGET and t <= max(n_fft, 128):
            return t
    return 64


def select_tiles(
    n: int,
    n_fft: int,
    tile_k: int | None = None,
    max_chunk: int | None = None,
    n_range: int | None = None,
) -> tuple[int, int]:
    """(Doppler tile, range chunk) for ``doppler_rdm_pallas``.

    Preference order: explicit arguments; else a SINGLE 8-aligned Doppler
    tile covering the whole (padded) n_fft extent when it fits the budget —
    the power-of-two tile list padded the G2 geometry's 332 Doppler rows to
    2 x 256 = 512, i.e. ~1.5x the real MXU flops AND a second full
    re-stream of the PC data (the X block re-fetches per k-tile); the
    single 336-row tile removes both.  The range chunk is then sized
    independently to the largest 128-multiple filling the budget.  Falls
    back to the square power-of-two tiling for large transforms (the G0
    2048 x 1536 plane cannot be one tile).

    Shared by the kernel and ``cost_model.rdm_former_cost`` so the bench
    projection always mirrors the launch the kernel would actually make.
    """
    if tile_k is not None:
        return min(tile_k, n_fft), (max_chunk or tile_k)
    if max_chunk is not None:
        return min(max_chunk, n_fft), max_chunk
    one = -(-n_fft // 8) * 8                  # sublane-aligned single tile
    base = one * n * 8                        # resident W re+im planes
    if 2 * (base + n * 128 * 8 + one * 128 * 4) <= VMEM_BLOCK_BUDGET:
        fits = [
            c for c in (1024, 512, 384, 256, 128)
            if 2 * (base + n * c * 8 + one * c * 4) <= VMEM_BLOCK_BUDGET
        ] or [128]
        if n_range is None:
            chunk = fits[0]
        else:
            # among fitting chunks, minimize range padding (each padded
            # column is wasted MXU work); ties go to the larger chunk
            chunk = min(fits, key=lambda c: (-(-n_range // c) * c, -c))
        return one, chunk
    t = _auto_tile(n, n_fft)
    return min(t, n_fft), t


def doppler_rdm_pallas(
    pc: jnp.ndarray,
    window: np.ndarray,
    notch_divisor: int | None = 150,
    shift: bool = True,
    n_fft: int | None = None,
    interpret: bool | None = None,
    max_chunk: int | None = None,
    tile_k: int | None = None,
) -> jnp.ndarray:
    """PC data (..., n_pulses, n_range) complex -> notched magnitude RDM.

    ``window`` is the slow-time taper; the DFT plane (window, zero-padding
    and fftshift folded in) is a host-precomputed constant.  The output is
    (..., n_fft, n_range) magnitude.  The grid tiles (batch, Doppler rows,
    range columns); all tiles are independent — no halos.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = pc.shape[-2]
    nr = pc.shape[-1]
    n_fft = n_fft or n
    if n_fft < n:
        raise ValueError(f"n_fft {n_fft} < n_pulses {n}")
    batch_shape = pc.shape[:-2]
    if window.shape[0] != n:
        raise ValueError("window length mismatch")

    dft = _dft_matrix_rect(n_fft, n, shift, tuple(np.asarray(window).tolist()))
    tile, chunk = select_tiles(n, n_fft, tile_k, max_chunk, n_range=nr)

    if notch_divisor:
        hw = matlab_round(n_fft / notch_divisor)
        center = matlab_round(n_fft / 2) - 1
        notch_lo, notch_hi = center - hw, center + hw
    else:
        notch_lo, notch_hi = 0, -1

    pc3 = pc.reshape((-1, n, nr))
    b = pc3.shape[0]
    xre = jnp.real(pc3).astype(jnp.float32)
    xim = jnp.imag(pc3).astype(jnp.float32)

    # pad the Doppler axis (DFT plane rows) and the range axis to tiles
    k_tiles = -(-n_fft // tile)
    padded_k = k_tiles * tile
    wre_np = dft.real.astype(np.float32)
    wim_np = dft.imag.astype(np.float32)
    if padded_k != n_fft:
        wre_np = np.pad(wre_np, ((0, padded_k - n_fft), (0, 0)))
        wim_np = np.pad(wim_np, ((0, padded_k - n_fft), (0, 0)))
    wre = jnp.asarray(wre_np)
    wim = jnp.asarray(wim_np)

    n_chunks = -(-nr // chunk)
    padded_r = n_chunks * chunk
    if padded_r != nr:
        pad = [(0, 0), (0, 0), (0, padded_r - nr)]
        xre = jnp.pad(xre, pad)
        xim = jnp.pad(xim, pad)

    kernel = _make_rdm_kernel(notch_lo, notch_hi, tile)
    out = pl.pallas_call(
        kernel,
        grid=(b, k_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((tile, n), lambda i, k, j: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n), lambda i, k, j: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, n, chunk), lambda i, k, j: (i, 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, n, chunk), lambda i, k, j: (i, 0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, chunk), lambda i, k, j: (i, k, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, padded_k, padded_r), jnp.float32),
        interpret=interpret,
    )(wre, wim, xre, xim)

    return out[:, :n_fft, :nr].reshape(batch_shape + (n_fft, nr))
