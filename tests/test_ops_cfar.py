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


def test_cascade_tie_break_on_equal_amplitudes(rng):
    """ADVICE r1: pin the ext==1 fast path's first-maximum tie-break.

    Quantized amplitudes make exact ties between the -1/0/+1 range
    candidates frequent; the fast branch-free form must still match the
    oracle's loop semantics (MATLAB ``max`` keeps the first maximum, i.e.
    offset -1 beats 0 beats +1) cell for cell.
    """
    rdm = rng.integers(1, 5, size=(64, 48)).astype(np.float64)
    cfg = CFARConfig(ref_cells=2, guard_cells=1, threshold=1.0, method=0,
                     range_extend_cells=1)
    flags, vflags = cascaded_cfar2d(jnp.asarray(rdm), cfg, 4)
    want_f, want_v = oracle.execute_cfar(
        rdm, 2, 1, 1.0, 0, 2, 1, 1.0, 0, 4, True, range_cell_nums=1
    )
    assert np.asarray(vflags).sum() > 0  # ties actually exercised
    np.testing.assert_array_equal(np.asarray(vflags), want_v.astype(bool))
    np.testing.assert_array_equal(np.asarray(flags), want_f.astype(bool))

    # the fused Pallas kernel must make the same tie-break choices
    from radar_signal_process_tpu.kernels.cfar_pallas import cascaded_cfar2d_pallas

    pf, pv = cascaded_cfar2d_pallas(jnp.asarray(rdm, jnp.float32), cfg, 4)
    np.testing.assert_array_equal(np.asarray(pv), want_v.astype(bool))
    np.testing.assert_array_equal(np.asarray(pf), want_f.astype(bool))


def test_cascade_tie_break_fast_path_equals_loop_path(rng):
    """The ext==1 fused form and the general loop form agree on tie-heavy data.

    The loop path is forced with ``range_extend_cells=2`` on data whose
    columns are padded so cells at offset +-2 can never hold a range flag:
    every odd column is zeroed, so range hits only occur on even columns
    and the +-2 candidates compete only through the +-1/0 positions.
    """
    rdm = rng.integers(1, 4, size=(48, 40)).astype(np.float64)
    cfg1 = CFARConfig(ref_cells=2, guard_cells=1, threshold=1.0, method=0,
                      range_extend_cells=1)
    cfg2 = CFARConfig(ref_cells=2, guard_cells=1, threshold=1.0, method=0,
                      range_extend_cells=2)
    want_f1, _ = oracle.execute_cfar(
        rdm, 2, 1, 1.0, 0, 2, 1, 1.0, 0, 4, True, range_cell_nums=1
    )
    want_f2, _ = oracle.execute_cfar(
        rdm, 2, 1, 1.0, 0, 2, 1, 1.0, 0, 4, True, range_cell_nums=2
    )
    got1, _ = cascaded_cfar2d(jnp.asarray(rdm), cfg1, 4)   # fast path
    got2, _ = cascaded_cfar2d(jnp.asarray(rdm), cfg2, 4)   # loop path
    np.testing.assert_array_equal(np.asarray(got1), want_f1.astype(bool))
    np.testing.assert_array_equal(np.asarray(got2), want_f2.astype(bool))
