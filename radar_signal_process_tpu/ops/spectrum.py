"""Spectral-width estimation (``CFAR_WangCai/ampConstrWidthEst.m``).

Normalizes the shifted magnitude spectrum to dB, optionally spline-upsamples,
and measures the width (in original-sample units) of the region at or above an
amplitude constraint (``ampConstrWidthEst.m:6-41``).

Two entry points:

* :func:`amp_constrained_width` — the standalone utility on a complex
  spectrum, matching the reference function signature;
* :func:`detection_spectral_widths` — the measurement-stage integration:
  per-detection Doppler (velocity-dim) widths read off the magnitude RDM at
  each detection's range cell (the reference ships K12 with no caller; a
  framework exposes it as an optional per-detection output).
"""

from __future__ import annotations

import jax.numpy as jnp

from radar_signal_process_tpu.ops.measure import spline_interp_notaknot


def _width_from_mag(
    mag: jnp.ndarray,
    amp_constraint_db: float,
    interp: bool,
    interp_times: int,
) -> jnp.ndarray:
    """Super-threshold width (original-sample units) of a magnitude spectrum.

    Shared core of ``ampConstrWidthEst.m:20-41``: normalize to the peak,
    convert to dB, and return the index distance between the first and last
    samples ``>= amp_constraint_db`` (0 when none).  ``mag`` is the last
    axis; leading batch dims are vectorized.
    """
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
    return _width_from_mag(mag, amp_constraint_db, interp, interp_times)


def detection_spectral_widths(
    rdm: jnp.ndarray,
    r_idx: jnp.ndarray,
    amp_constraint_db: float,
    shifted_input: bool = True,
    interp: bool = False,
    interp_times: int = 4,
) -> jnp.ndarray:
    """Per-detection Doppler spectral widths from a magnitude RDM.

    For each detection range cell in ``r_idx`` (``(..., K)`` int32), the full
    velocity column ``rdm[..., :, r]`` is treated as the detection's Doppler
    spectrum and measured with the ``ampConstrWidthEst.m`` width rule.  The
    RDM is already magnitude; ``shifted_input=False`` applies the
    reference's ``fftshift`` first (G0 spectra are stored unshifted,
    ``DMX_SignalProcessing_main_xzr.m:413-418``, while the G1/G2 RDMs are
    shifted by ``fun_Process_MTD.m:31``).

    Returns ``(..., K)`` widths in original velocity-bin units.
    """
    cols = jnp.take_along_axis(rdm, r_idx[..., None, :], axis=-1)
    cols = jnp.moveaxis(cols, -1, -2)  # (..., K, n_v)
    if not shifted_input:
        cols = jnp.fft.fftshift(cols, axes=-1)
    return _width_from_mag(cols, amp_constraint_db, interp, interp_times)
