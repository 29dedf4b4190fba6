"""Fused pulse-compression + windowed-Doppler RDM former (SURVEY §7.1(a)).

The G0 chain's two hottest ops are one producer-consumer pair: per-PRT
frequency-domain matched filtering (``DMX_SignalProcessing_main_xzr.m:
348-353``: ``ifft(fft(x, 512) .* matchF2)``) feeding the slow-time
zero-padded MTD FFT (``:413-418``: ``fft(win .* y, 2048)``).  Run as separate
XLA stages, the compressed pulses round-trip HBM between them (~12 MB per
beam per frame).

This kernel fuses the whole ``echo -> |RDM|`` chain into one Pallas pass
built on two chained MXU matmuls:

* pulse compression is LTI per PRT row, so the FFT/scale/IFFT collapses into
  ONE precomputed complex matrix ``M`` (``(n_in, n_out)``): for the long
  pulse ``M = F_rect @ diag(matchF2) @ IDFT`` (512-pt pair), and for the
  short pulse the causal FIR (``:343-344``) is the Toeplitz matrix
  ``T[m, n] = taps[n - m]`` — one formulation serves both segments;
* the MTD transform is the windowed rectangular DFT plane ``W``
  (``(n_fft, n_prt)``, zero-padding folded) already used by
  ``rdm_pallas.py``.

Per (batch, range-tile, Doppler-tile) grid step the kernel computes
``|W_k @ (X @ M_j)|`` with the intermediate ``P = X @ M_j`` held in VMEM
scratch, computed once per range tile (Doppler is the innermost grid axis)
and reused by every Doppler tile — the compressed pulses never touch HBM.
Complex arithmetic is carried as separate re/im float32 planes (Mosaic has
no complex dtype); all scalar constants are baked via the closure factory
(kwargs-dataclass kernels fail the remote Mosaic compile, see CLAUDE.md).

Parity: bit-identical to the split-real jnp composition in interpreter mode
(tests/test_kernels.py), numerically equivalent (f32) to the XLA FFT path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pc_matrix_freq_domain(
    match_spec: np.ndarray, n_in: int, n_fft: int
) -> np.ndarray:
    """(n_in, n_fft) matrix reproducing ``ifft(fft(x, n_fft) .* match_spec)``.

    ``match_spec`` is the frequency-domain matched filter (the reference's
    ``matchF2 = conj(fft(win .* matchWaveform, 512))``, ``:200-202``).
    Host-built in float64, used as two f32 planes by the kernel.

    MATLAB ``fft(x, n)`` (and ``jnp.fft.fft(x, n)``) TRUNCATES to the first
    ``n`` samples when ``len(x) > n``; the forward-DFT rows for samples
    ``p >= n_fft`` are therefore zeroed rather than aliased (folding them
    would silently diverge for any profile with ``n_in > n_fft``).
    """
    p = np.arange(n_in)[:, None]
    k = np.arange(n_fft)[None, :]
    fwd = np.exp(-2j * np.pi * p * k / n_fft)          # (n_in, n_fft)
    fwd[n_fft:, :] = 0.0                               # fft(x, n) truncation
    n = np.arange(n_fft)[None, :]
    inv = np.exp(2j * np.pi * k.T * n / n_fft) / n_fft  # (n_fft, n_fft)
    return (fwd * np.asarray(match_spec)[None, :]) @ inv


def pc_matrix_fir(taps: np.ndarray, n_in: int) -> np.ndarray:
    """(n_in, n_in) causal-FIR Toeplitz matrix: ``y = x @ T`` == filter(b,1,x).

    ``T[m, n] = taps[n - m]`` for ``0 <= n - m < len(taps)`` (MATLAB
    ``filter(b, 1, x)``; the G0 chain uses the raw taps, ``:146,343-344``).
    """
    t = np.zeros((n_in, n_in), dtype=np.complex128)
    b = np.asarray(taps, dtype=np.float64)
    for d in range(min(len(b), n_in)):
        idx = np.arange(n_in - d)
        t[idx, idx + d] = b[d]
    return t


def _make_kernel(use_dma: bool, chunk: int, n_chunks: int):
    """Kernel closure (scalar constants baked — see CLAUDE.md).

    ``use_dma=True`` (TPU): the echo planes stay in HBM
    (``memory_space=ANY``) and stream through one small VMEM slot in
    ``n_chunks`` slow-time chunks while P = X @ M accumulates rows into
    scratch.  Mosaic's scoped-VMEM accounting charges BlockSpec-resident
    echo planes at ~2x (measured on the v5e: 17.62M > 16M limit for the G0
    long segment even with whole-plane DMA scratch), so only the chunked
    stream fits the 16 MB budget — and it costs nothing: P is computed once
    per range tile and the per-chunk matmuls are the same FLOPs.
    ``use_dma=False`` (interpreter parity tests): plain VMEM blocks, same
    arithmetic."""

    def doppler_tail(wre_ref, wim_ref, out_ref, pre_ref, pim_ref):
        wre, wim = wre_ref[...], wim_ref[...]
        pre, pim = pre_ref[...], pim_ref[...]
        sre = jnp.dot(wre, pre, preferred_element_type=jnp.float32) - jnp.dot(
            wim, pim, preferred_element_type=jnp.float32
        )
        sim = jnp.dot(wre, pim, preferred_element_type=jnp.float32) + jnp.dot(
            wim, pre, preferred_element_type=jnp.float32
        )
        out_ref[0] = jnp.sqrt(sre * sre + sim * sim)

    if not use_dma:
        def kernel(xre_ref, xim_ref, mre_ref, mim_ref, wre_ref, wim_ref,
                   out_ref, pre_ref, pim_ref):
            # P = X @ M once per range tile (Doppler axis k is innermost)
            @pl.when(pl.program_id(2) == 0)
            def _compute_pc():
                xre, xim = xre_ref[0], xim_ref[0]
                mre, mim = mre_ref[...], mim_ref[...]
                pre_ref[...] = jnp.dot(
                    xre, mre, preferred_element_type=jnp.float32
                ) - jnp.dot(xim, mim, preferred_element_type=jnp.float32)
                pim_ref[...] = jnp.dot(
                    xre, mim, preferred_element_type=jnp.float32
                ) + jnp.dot(xim, mre, preferred_element_type=jnp.float32)

            doppler_tail(wre_ref, wim_ref, out_ref, pre_ref, pim_ref)

        return kernel

    def kernel(xre_hbm, xim_hbm, mre_ref, mim_ref, wre_ref, wim_ref,
               out_ref, xslot_re, xslot_im, pre_ref, pim_ref,
               sem_re, sem_im):
        @pl.when(pl.program_id(2) == 0)
        def _compute_pc():
            mre, mim = mre_ref[...], mim_ref[...]
            i = pl.program_id(0)

            def one_chunk(c, carry):
                rows = pl.ds(c * chunk, chunk)
                cp_re = pltpu.make_async_copy(
                    xre_hbm.at[i, rows], xslot_re, sem_re
                )
                cp_im = pltpu.make_async_copy(
                    xim_hbm.at[i, rows], xslot_im, sem_im
                )
                cp_re.start()
                cp_im.start()
                cp_re.wait()
                cp_im.wait()
                xre, xim = xslot_re[...], xslot_im[...]
                pre_ref[rows, :] = jnp.dot(
                    xre, mre, preferred_element_type=jnp.float32
                ) - jnp.dot(xim, mim, preferred_element_type=jnp.float32)
                pim_ref[rows, :] = jnp.dot(
                    xre, mim, preferred_element_type=jnp.float32
                ) + jnp.dot(xim, mre, preferred_element_type=jnp.float32)
                return carry

            jax.lax.fori_loop(0, n_chunks, one_chunk, 0)

        doppler_tail(wre_ref, wim_ref, out_ref, pre_ref, pim_ref)

    return kernel


def _pad_to(x: np.ndarray, rows: int, cols: int) -> np.ndarray:
    return np.pad(x, ((0, rows - x.shape[0]), (0, cols - x.shape[1])))


def _stream_chunk(n_prt: int) -> tuple[int, int]:
    """(padded slow-time extent, DMA chunk rows) for the streaming P compute.

    The PRT axis pads up to a multiple of 8 (f32 sublane granule) and the
    chunk is the largest divisor <= 256 of the padded extent — so the VMEM
    slot can never degenerate to the whole echo plane, which OOMs the
    scoped-VMEM budget for large planes (ADVICE r4; e.g. the G2 332-row
    geometry now streams as 21 x 16-row chunks instead of one 332-row
    slot).  Zero slow-time rows compress to zero and the matching Doppler
    DFT columns are zeroed, so the padded contraction is exact.
    """
    n_prt_pad = -(-n_prt // 8) * 8
    chunk = next(c for c in (256, 128, 64, 32, 16, 8) if n_prt_pad % c == 0)
    return n_prt_pad, chunk


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "tile_k", "tile_r", "interpret"),
)
def _fused_call(xre, xim, wre, wim, mre, mim, n_fft, tile_k, tile_r,
                interpret):
    b, n_prt, _ = xre.shape
    n_out_pad = mre.shape[1]
    k_tiles = n_fft // tile_k
    r_tiles = n_out_pad // tile_r
    use_dma = not interpret
    if use_dma:
        # pad the PRT axis (exact — zero rows / zero DFT columns) so the
        # chunked DMA stream always fits the VMEM slot budget
        n_prt_pad, chunk = _stream_chunk(n_prt)
        if n_prt_pad != n_prt:
            pad_rows = ((0, 0), (0, n_prt_pad - n_prt), (0, 0))
            xre = jnp.pad(xre, pad_rows)
            xim = jnp.pad(xim, pad_rows)
            pad_cols = ((0, 0), (0, n_prt_pad - n_prt))
            wre = jnp.pad(wre, pad_cols)
            wim = jnp.pad(wim, pad_cols)
            n_prt = n_prt_pad
    else:
        chunk = n_prt  # interpreter parity path: no streaming, no padding
    kernel = _make_kernel(use_dma, chunk, n_prt // chunk)
    if use_dma:
        # echo planes stay in HBM, streamed chunkwise by the kernel
        x_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 2
        x_scratch = [
            pltpu.VMEM((chunk, xre.shape[2]), jnp.float32),  # echo re slot
            pltpu.VMEM((chunk, xre.shape[2]), jnp.float32),  # echo im slot
        ]
        sems = [pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]
    else:
        # interpreter: whole-array VMEM blocks, constant across (j, k)
        x_specs = [
            pl.BlockSpec((1, n_prt, xre.shape[2]), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_prt, xre.shape[2]), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        x_scratch, sems = [], []
    return pl.pallas_call(
        kernel,
        grid=(b, r_tiles, k_tiles),
        in_specs=x_specs + [
            # PC matrix: one range tile, constant across k
            pl.BlockSpec((xre.shape[2], tile_r), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((xre.shape[2], tile_r), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            # Doppler DFT plane: streamed by k
            pl.BlockSpec((tile_k, n_prt), lambda i, j, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, n_prt), lambda i, j, k: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_k, tile_r), lambda i, j, k: (i, k, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_fft, n_out_pad), jnp.float32),
        scratch_shapes=x_scratch + [
            pltpu.VMEM((n_prt, tile_r), jnp.float32),        # P re
            pltpu.VMEM((n_prt, tile_r), jnp.float32),        # P im
        ] + sems,
        interpret=interpret,
    )(xre, xim, mre, mim, wre, wim)


def fused_pc_rdm_pallas(
    echo: jnp.ndarray,
    pc_matrix: np.ndarray,
    window: np.ndarray,
    n_fft: int,
    shift: bool = False,
    tile_k: int = 128,
    tile_r: int = 128,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Echo (..., n_prt, n_in) complex -> (..., n_fft, n_out) magnitude RDM.

    One fused pass: ``|DFT_plane @ (echo @ pc_matrix)|``.  ``pc_matrix`` is
    the per-row pulse-compression operator (``pc_matrix_freq_domain`` /
    ``pc_matrix_fir``); ``window``/``n_fft``/``shift`` define the slow-time
    transform exactly as ``ops.mtd.doppler_process`` (G0: shift=False).
    """
    from radar_signal_process_tpu.ops.mtd import _dft_matrix_rect

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_prt, n_in = echo.shape[-2], echo.shape[-1]
    n_out = pc_matrix.shape[1]
    if pc_matrix.shape[0] != n_in:
        raise ValueError(
            f"pc_matrix rows {pc_matrix.shape[0]} != echo fast-time {n_in}"
        )
    if n_fft % tile_k:
        raise ValueError(f"n_fft {n_fft} not a multiple of tile_k {tile_k}")
    batch_shape = echo.shape[:-2]
    echo3 = echo.reshape((-1, n_prt, n_in))

    # pad the contraction (fast-time) and output (range) axes to tiles
    n_in_pad = -(-n_in // tile_r) * tile_r
    n_out_pad = -(-n_out // tile_r) * tile_r
    m_np = _pad_to(np.asarray(pc_matrix), n_in_pad, n_out_pad)
    mre = jnp.asarray(m_np.real, jnp.float32)
    mim = jnp.asarray(m_np.imag, jnp.float32)

    dft = _dft_matrix_rect(n_fft, n_prt, shift,
                           tuple(np.asarray(window).tolist()))
    wre = jnp.asarray(dft.real, jnp.float32)
    wim = jnp.asarray(dft.imag, jnp.float32)

    xre = jnp.real(echo3).astype(jnp.float32)
    xim = jnp.imag(echo3).astype(jnp.float32)
    if n_in_pad != n_in:
        pad = [(0, 0), (0, 0), (0, n_in_pad - n_in)]
        xre = jnp.pad(xre, pad)
        xim = jnp.pad(xim, pad)

    out = _fused_call(xre, xim, wre, wim, mre, mim, n_fft, tile_k, tile_r,
                      interpret)
    return out[:, :, :n_out].reshape(batch_shape + (n_fft, n_out))
