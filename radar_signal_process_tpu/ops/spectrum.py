"""Spectral-width estimation (``CFAR_WangCai/ampConstrWidthEst.m``).

Normalizes the shifted magnitude spectrum to dB, optionally spline-upsamples,
and measures the width (in original-sample units) of the region at or above an
amplitude constraint (``ampConstrWidthEst.m:6-41``).
"""

from __future__ import annotations

import jax.numpy as jnp

from radar_signal_process_tpu.ops.measure import spline_interp_notaknot


def amp_constrained_width(
    spec: jnp.ndarray,
    amp_constraint_db: float,
    interp: bool = False,
    interp_times: int = 4,
) -> jnp.ndarray:
    """Width (in samples) of the spectral region >= ``amp_constraint_db``.

    ``spec`` is a complex spectrum (last axis); magnitude is fftshift'ed,
    normalized to its peak, converted to dB, and thresholded.  Width is the
    index distance between the first and last super-threshold samples
    (0 when none).  Fully vectorized over leading batch dims.
    """
    mag = jnp.abs(jnp.fft.fftshift(spec, axes=-1))
    step = 1.0
    if interp:
        mag = spline_interp_notaknot(mag, interp_times)
        step = 1.0 / interp_times
    peak = jnp.max(mag, axis=-1, keepdims=True)
    db = 20.0 * jnp.log10(mag / peak)
    above = db >= amp_constraint_db
    n = above.shape[-1]
    idx = jnp.arange(n)
    big = jnp.asarray(n, dtype=idx.dtype)
    first = jnp.min(jnp.where(above, idx, big), axis=-1)
    last = jnp.max(jnp.where(above, idx, -1), axis=-1)
    any_above = jnp.any(above, axis=-1)
    width = (last - first).astype(db.dtype) * step
    return jnp.where(any_above, width, 0.0)
