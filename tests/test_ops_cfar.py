"""Golden tests: CFAR ops vs the NumPy oracle (exact flag equality)."""

import jax.numpy as jnp
import numpy as np
import pytest

from radar_signal_process_tpu.config import CFARConfig
from radar_signal_process_tpu.ops import cascaded_cfar2d, cfar1d, segmented_cfar
from tests.oracle import cfar as oracle


def _rdm_with_targets(rng, nv=128, nr=96, n_targets=6, snr=30.0):
    rdm = np.abs(rng.standard_normal((nv, nr))) + 0.5
    for _ in range(n_targets):
        v = rng.integers(10, nv - 10)
        r = rng.integers(0, nr)
        rdm[v, r] += snr
    return rdm


@pytest.mark.parametrize("method", [0, 1], ids=["GO", "SO"])
def test_cfar1d_matches_oracle(rng, method):
    data = _rdm_with_targets(rng)
    got = np.asarray(
        cfar1d(jnp.asarray(data), ref_cells=5, guard_cells=7, threshold=5.0,
               method=method, axis=-1)
    )
    want = oracle.cfar1d_sub(data, 5, 7, 5.0, method).astype(bool)
    np.testing.assert_array_equal(got, want)


def test_cfar1d_velocity_axis(rng):
    data = _rdm_with_targets(rng)
    got = np.asarray(
        cfar1d(jnp.asarray(data), 5, 7, 5.0, 0, axis=-2)
    )
    want = oracle.cfar1d_sub(data.T, 5, 7, 5.0, 0).T.astype(bool)
    np.testing.assert_array_equal(got, want)


def test_cfar1d_small_segment_edges(rng):
    # narrow G1 segment has only 82 columns: both edge fallbacks exercised
    data = np.abs(rng.standard_normal((20, 82))) + 0.1
    data[:, 2] += 50.0
    data[:, 80] += 50.0
    got = np.asarray(cfar1d(jnp.asarray(data), 5, 7, 5.0, 0))
    want = oracle.cfar1d_sub(data, 5, 7, 5.0, 0).astype(bool)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n_clutter", [6, 11])
def test_cascaded_cfar2d_matches_oracle(rng, n_clutter):
    rdm = _rdm_with_targets(rng, nv=160, nr=120)
    cfg = CFARConfig(ref_cells=5, guard_cells=7, threshold=5.0, method=0)
    flags, vflags = cascaded_cfar2d(jnp.asarray(rdm), cfg, n_clutter)
    want_f, want_v = oracle.execute_cfar(
        rdm, 5, 7, 5.0, 0, 5, 7, 5.0, 0, n_clutter, True
    )
    np.testing.assert_array_equal(np.asarray(vflags), want_v.astype(bool))
    np.testing.assert_array_equal(np.asarray(flags), want_f.astype(bool))


def test_cascaded_cfar2d_no_range_pass(rng):
    rdm = _rdm_with_targets(rng)
    cfg = CFARConfig(threshold=5.0, range_detect=False)
    flags, vflags = cascaded_cfar2d(jnp.asarray(rdm), cfg, 6)
    want_f, want_v = oracle.execute_cfar(rdm, 5, 7, 5.0, 0, 5, 7, 5.0, 0, 6, False)
    np.testing.assert_array_equal(np.asarray(flags), want_f.astype(bool))
    np.testing.assert_array_equal(np.asarray(vflags), want_v.astype(bool))


def test_cascaded_cfar2d_batched(rng):
    rdms = np.stack([_rdm_with_targets(rng) for _ in range(3)])
    cfg = CFARConfig(threshold=5.0)
    flags, _ = cascaded_cfar2d(jnp.asarray(rdms), cfg, 6)
    for b in range(3):
        want_f, _ = oracle.execute_cfar(rdms[b], 5, 7, 5.0, 0, 5, 7, 5.0, 0, 6, True)
        np.testing.assert_array_equal(np.asarray(flags[b]), want_f.astype(bool))


def test_segmented_cfar_matches_per_segment_oracle(rng):
    rdm = _rdm_with_targets(rng, nv=155, nr=868)
    segments = ((0, 82), (82, 318), (318, 868))
    cfg = CFARConfig(threshold=5.0)
    flags, vflags = segmented_cfar(jnp.asarray(rdm), segments, cfg, 6)
    for start, stop in segments:
        want_f, want_v = oracle.execute_cfar(
            rdm[:, start:stop], 5, 7, 5.0, 0, 5, 7, 5.0, 0, 6, True
        )
        np.testing.assert_array_equal(
            np.asarray(flags[:, start:stop]), want_f.astype(bool)
        )
        np.testing.assert_array_equal(
            np.asarray(vflags[:, start:stop]), want_v.astype(bool)
        )
