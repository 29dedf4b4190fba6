"""Oracle motion-parameter measurement: scipy-spline transcription of
``motionParaMeasure.m`` (MATLAB interp1 'spline' == not-a-knot CubicSpline)."""

from __future__ import annotations

import numpy as np
from scipy.interpolate import CubicSpline


def spline_upsample(values: np.ndarray, upsample: int) -> np.ndarray:
    x = np.arange(len(values))
    xq = np.arange(0, (len(values) - 1) * upsample + 1) / upsample
    return CubicSpline(x, values, bc_type="not-a-knot")(xq)


def motion_para_measure(
    rdm_sum: np.ndarray,
    rdm_diff: np.ndarray,
    flags: np.ndarray,
    r_scale: np.ndarray,
    delta_r: float,
    v_scale: np.ndarray,
    delta_v: float,
    k_value: float,
    beam_pos: int,
    beam_angle_step: float,
    n_clutter: int,
    extra_dots: int = 2,
    r_interp: int = 8,
    v_interp: int = 4,
    ele_comp: float = 0.0,
    ele_sys_err: float = 0.0,
):
    """Per-hit estimates; returns dict keyed by (v_idx, r_idx) (0-based)."""
    nv, nr = rdm_sum.shape
    w = 2 * extra_dots + 1
    out = {}
    for v, r in zip(*np.nonzero(flags)):
        # ---- range (motionParaMeasure.m:22-46), 0-based contiguous clamp ----
        r_start = min(max(r - extra_dots, 0), nr - w)
        cells = np.arange(r_start, r_start + w)
        fine = spline_upsample(rdm_sum[v, cells], r_interp)
        i1 = int(np.argmax(fine))
        r_cell_max = r_start + i1 / r_interp
        r_est = r_scale[r] + (r_cell_max - r) * delta_r

        # ---- velocity (:49-73) ----
        v_lo = n_clutter + 1
        v_hi = nv - n_clutter - 1 - (w - 1)
        v_start = min(max(v - extra_dots, v_lo), v_hi)
        cells_v = np.arange(v_start, v_start + w)
        fine_v = spline_upsample(rdm_sum[cells_v, r], v_interp)
        i2 = int(np.argmax(fine_v))
        v_cell_max = v_start + i2 / v_interp
        v_int = int(np.floor(v_cell_max))
        v_est = v_scale[v_int] - (v_cell_max - v_int) * delta_v

        # ---- elevation (:75-82) ----
        ratio = rdm_diff[v, r] / rdm_sum[v, r]
        ele = beam_pos * beam_angle_step + 2.5 - ratio * k_value + ele_comp + ele_sys_err
        out[(v, r)] = (r_est, v_est, ele)
    return out
