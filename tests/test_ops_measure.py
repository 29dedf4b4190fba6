"""Golden tests: spline interpolation + motion-parameter measurement."""

import jax.numpy as jnp
import numpy as np
from scipy.interpolate import CubicSpline

from radar_signal_process_tpu.ops import (
    extract_detections,
    motion_parameters,
    spline_interp_notaknot,
)
from radar_signal_process_tpu.ops.measure import spline_eval_matrix
from tests.oracle import measure as oracle


def test_spline_matrix_matches_scipy_notaknot(rng):
    for k, u in [(5, 8), (5, 4), (7, 3), (4, 5)]:
        y = rng.standard_normal(k)
        x = np.arange(k)
        xq = np.arange((k - 1) * u + 1) / u
        want = CubicSpline(x, y, bc_type="not-a-knot")(xq)
        got = spline_eval_matrix(k, u) @ y
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_spline_interp_batched(rng):
    y = rng.standard_normal((6, 5))
    got = np.asarray(spline_interp_notaknot(jnp.asarray(y), 4))
    for i in range(6):
        np.testing.assert_allclose(got[i], oracle.spline_upsample(y[i], 4), rtol=1e-9)


def test_extract_detections_orders_by_amplitude(rng):
    rdm = np.abs(rng.standard_normal((40, 30)))
    flags = np.zeros((40, 30), dtype=bool)
    flags[10, 5] = flags[20, 7] = flags[30, 9] = True
    rdm[10, 5], rdm[20, 7], rdm[30, 9] = 5.0, 9.0, 7.0
    dets = extract_detections(jnp.asarray(flags), jnp.asarray(rdm), 8)
    v = np.asarray(dets.v_idx)[np.asarray(dets.valid)]
    r = np.asarray(dets.r_idx)[np.asarray(dets.valid)]
    assert list(zip(v, r)) == [(20, 7), (30, 9), (10, 5)]


def test_motion_parameters_match_oracle(rng):
    nv, nr = 64, 96
    n_clutter = 5
    rdm = np.abs(rng.standard_normal((nv, nr))) + 1.0
    diff = rng.standard_normal((nv, nr))
    flags = np.zeros((nv, nr), dtype=bool)
    # interior, range-edge, velocity-edge (near clutter bound) hits
    for v, r in [(30, 50), (20, 0), (40, 95), (n_clutter + 2, 10), (nv - n_clutter - 2, 70)]:
        flags[v, r] = True
        rdm[v, r] += 30.0

    r_scale = np.arange(nr) * 6.0
    v_scale = np.linspace(-30, 30, nv)
    dets = extract_detections(jnp.asarray(flags), jnp.asarray(rdm), 16)
    got = motion_parameters(
        jnp.asarray(rdm), jnp.asarray(diff), dets,
        r_scale=r_scale, delta_r=6.0, v_scale=v_scale, delta_v=0.2,
        k_value=11.5, beam_pos=3, beam_angle_step=5.0,
        n_clutter=n_clutter,
    )
    want = oracle.motion_para_measure(
        rdm, diff, flags, r_scale, 6.0, v_scale, 0.2, 11.5, 3, 5.0, n_clutter
    )
    valid = np.asarray(got.valid)
    for i in range(int(valid.sum())):
        key = (int(np.asarray(dets.v_idx)[i]), int(np.asarray(dets.r_idx)[i]))
        r_w, v_w, e_w = want[key]
        np.testing.assert_allclose(float(np.asarray(got.range_m)[i]), r_w, rtol=1e-9)
        np.testing.assert_allclose(float(np.asarray(got.velocity_ms)[i]), v_w, rtol=1e-9)
        np.testing.assert_allclose(float(np.asarray(got.elevation_deg)[i]), e_w, rtol=1e-9)
