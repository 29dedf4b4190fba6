"""Fused RDM former: windowed Doppler DFT + magnitude + clutter notch.

The reference forms the RDM with a per-range-bin windowed FFT followed by
magnitude and a zero-velocity notch (``fun_Process_MTD.m`` +
``fun_0v_pressing.m``).  On TPU, the non-power-of-two CPI lengths make the
FFT a Bluestein fallback; this kernel instead contracts each range chunk
against a precomputed windowed/shifted DFT matrix on the MXU and applies
magnitude + notch in VMEM before anything returns to HBM — one fused pass,
complex arithmetic carried as separate re/im float32 planes (Mosaic has no
complex dtype).

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
from radar_signal_process_tpu.ops.mtd import _dft_matrix


def _make_rdm_kernel(notch_lo: int, notch_hi: int):
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
            row = jax.lax.broadcasted_iota(jnp.int32, mag.shape, 0)
            keep = (row < notch_lo) | (row > notch_hi)
            mag = jnp.where(keep, mag, jnp.float32(0.0))
        out_ref[0] = mag

    return kernel


def doppler_rdm_pallas(
    pc: jnp.ndarray,
    window: np.ndarray,
    notch_divisor: int | None = 150,
    shift: bool = True,
    interpret: bool | None = None,
    max_chunk: int = 512,
) -> jnp.ndarray:
    """PC data (..., n_pulses, n_range) complex -> notched magnitude RDM.

    ``window`` is the slow-time taper; the DFT matrix (window and fftshift
    folded in) is a host-precomputed constant.  The range axis is tiled in
    ``max_chunk`` columns per grid step (independent columns — no halo).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = pc.shape[-2]
    nr = pc.shape[-1]
    batch_shape = pc.shape[:-2]
    if window.shape[0] != n:
        raise ValueError("window length mismatch")

    dft = _dft_matrix(n, shift, tuple(np.asarray(window).tolist()))
    wre = jnp.asarray(dft.real, dtype=jnp.float32)
    wim = jnp.asarray(dft.imag, dtype=jnp.float32)

    if notch_divisor:
        hw = matlab_round(n / notch_divisor)
        center = matlab_round(n / 2) - 1
        notch_lo, notch_hi = center - hw, center + hw
    else:
        notch_lo, notch_hi = 0, -1

    pc3 = pc.reshape((-1, n, nr))
    b = pc3.shape[0]
    xre = jnp.real(pc3).astype(jnp.float32)
    xim = jnp.imag(pc3).astype(jnp.float32)

    # pad the range axis to a multiple of the chunk
    n_chunks = -(-nr // max_chunk)
    padded = n_chunks * max_chunk
    if padded != nr:
        pad = [(0, 0), (0, 0), (0, padded - nr)]
        xre = jnp.pad(xre, pad)
        xim = jnp.pad(xim, pad)

    kernel = _make_rdm_kernel(notch_lo, notch_hi)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((n, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, n, max_chunk), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, n, max_chunk), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n, max_chunk), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, padded), jnp.float32),
        interpret=interpret,
    )(wre, wim, xre, xim)

    return out[..., :nr].reshape(batch_shape + (n, nr))
