"""Pallas kernel tests (interpreter mode on CPU): exact parity with ops.cfar."""

import jax.numpy as jnp
import numpy as np
import pytest

from radar_signal_process_tpu.config import CFARConfig
from radar_signal_process_tpu.kernels import cascaded_cfar2d_pallas
from radar_signal_process_tpu.ops.cfar import cascaded_cfar2d


def _rdm(rng, nv=96, nr=160, hits=8):
    rdm = np.abs(rng.standard_normal((nv, nr))).astype(np.float32) + 0.5
    for _ in range(hits):
        rdm[rng.integers(8, nv - 8), rng.integers(0, nr)] += 40.0
    return rdm


@pytest.mark.parametrize("n_clutter", [6, 11])
def test_pallas_cfar_matches_reference_op(rng, n_clutter):
    rdm = _rdm(rng)
    cfg = CFARConfig(ref_cells=5, guard_cells=7, threshold=5.0)
    want_f, want_v = cascaded_cfar2d(jnp.asarray(rdm), cfg, n_clutter)
    got_f, got_v = cascaded_cfar2d_pallas(
        jnp.asarray(rdm), cfg, n_clutter, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_f), np.asarray(want_f))


def test_pallas_cfar_batched(rng):
    rdms = np.stack([_rdm(rng) for _ in range(6)]).reshape(2, 3, 96, 160)
    cfg = CFARConfig(threshold=5.0)
    want_f, want_v = cascaded_cfar2d(jnp.asarray(rdms), cfg, 6)
    got_f, got_v = cascaded_cfar2d_pallas(jnp.asarray(rdms), cfg, 6, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_f), np.asarray(want_f))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


def test_pallas_cfar_no_range_pass(rng):
    rdm = _rdm(rng)
    cfg = CFARConfig(threshold=5.0, range_detect=False)
    want_f, want_v = cascaded_cfar2d(jnp.asarray(rdm), cfg, 6)
    got_f, got_v = cascaded_cfar2d_pallas(jnp.asarray(rdm), cfg, 6, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_f), np.asarray(want_f))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


def test_pallas_cfar_chunked_matches_reference_op(rng):
    """Chunked range-axis processing (VMEM pressure path) stays bit-identical."""
    rdms = np.stack([_rdm(rng, nv=64, nr=700, hits=10) for _ in range(3)])
    cfg = CFARConfig(threshold=5.0)
    want_f, want_v = cascaded_cfar2d(jnp.asarray(rdms), cfg, 6)
    got_f, got_v = cascaded_cfar2d_pallas(
        jnp.asarray(rdms), cfg, 6, interpret=True, max_chunk=256
    )
    np.testing.assert_array_equal(np.asarray(got_f), np.asarray(want_f))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


def test_pallas_rdm_former_matches_ops(rng):
    """Fused DFT+magnitude+notch kernel vs doppler_process + notch."""
    from radar_signal_process_tpu.kernels import doppler_rdm_pallas
    from radar_signal_process_tpu.ops import doppler_process, make_window, zero_velocity_notch

    pc = (
        rng.standard_normal((3, 96, 300)) + 1j * rng.standard_normal((3, 96, 300))
    ).astype(np.complex64)
    w = make_window("kaiser", 96, 8.0)
    got = np.asarray(
        doppler_rdm_pallas(jnp.asarray(pc), w, notch_divisor=20, interpret=True,
                           max_chunk=128)
    )
    want = np.asarray(
        zero_velocity_notch(
            doppler_process(jnp.asarray(pc), w, use_matmul=True), divisor=20
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_pallas_rdm_former_no_notch(rng):
    from radar_signal_process_tpu.kernels import doppler_rdm_pallas
    from radar_signal_process_tpu.ops import doppler_process, make_window

    pc = (rng.standard_normal((48, 64)) + 1j * rng.standard_normal((48, 64))).astype(
        np.complex64
    )
    w = make_window("hamming", 48)
    got = np.asarray(
        doppler_rdm_pallas(jnp.asarray(pc), w, notch_divisor=None, interpret=True)
    )
    want = np.asarray(doppler_process(jnp.asarray(pc), w, use_matmul=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_pallas_rdm_former_zero_padded_unshifted(rng):
    """Rectangular DFT plane: the G0 zero-padded unshifted MTD FFT
    (1536 -> 2048 points, ``DMX_SignalProcessing_main_xzr.m:413-418``) in
    miniature, with the Doppler axis forced to tile."""
    from radar_signal_process_tpu.kernels import doppler_rdm_pallas
    from radar_signal_process_tpu.ops import doppler_process, make_window

    pc = (
        rng.standard_normal((2, 96, 130)) + 1j * rng.standard_normal((2, 96, 130))
    ).astype(np.complex64)
    w = make_window("hamming", 96)
    got = np.asarray(
        doppler_rdm_pallas(jnp.asarray(pc), w, notch_divisor=None, shift=False,
                           n_fft=256, interpret=True, tile_k=64, max_chunk=64)
    )
    want = np.asarray(
        doppler_process(jnp.asarray(pc), w, n_fft=256, shift=False,
                        use_matmul=False)
    )
    assert got.shape == (2, 256, 130)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_pallas_rdm_former_notch_across_row_tiles(rng):
    """The notch rows must land correctly when they straddle k-tiles."""
    from radar_signal_process_tpu.kernels import doppler_rdm_pallas
    from radar_signal_process_tpu.ops import (
        doppler_process,
        make_window,
        zero_velocity_notch,
    )

    pc = (rng.standard_normal((96, 64)) + 1j * rng.standard_normal((96, 64))).astype(
        np.complex64
    )
    w = make_window("kaiser", 96, 8.0)
    got = np.asarray(
        doppler_rdm_pallas(jnp.asarray(pc), w, notch_divisor=10, interpret=True,
                           tile_k=32, max_chunk=64)
    )
    want = np.asarray(
        zero_velocity_notch(
            doppler_process(jnp.asarray(pc), w, use_matmul=True), divisor=10
        )
    )
    # divisor 10 on 96 rows: half-width 10 around row 47 -> rows 37..57 span
    # the 32-row tile boundary at 32 and 64
    assert (got[37:58] == 0).all()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_pallas_cfar_tall_rdm_auto_chunk(rng):
    """Tall (G0-geometry) RDMs must auto-narrow the range chunk and still
    match the XLA op exactly."""
    from radar_signal_process_tpu.config import CFARConfig
    from radar_signal_process_tpu.kernels import cascaded_cfar2d_pallas
    from radar_signal_process_tpu.ops import cascaded_cfar2d

    from radar_signal_process_tpu.kernels.cfar_pallas import _auto_chunk

    nv, nr = 2048, 640
    cfg = CFARConfig(ref_cells=5, guard_cells=7, threshold=5.0)
    # the G0 production geometry must auto-size below nr -> chunked path
    assert _auto_chunk(cfg, cfg, nv - 2 * 20 - 1) < nr
    rdm = (np.abs(rng.standard_normal((nv, nr))) + 0.5).astype(np.float32)
    for _ in range(10):
        rdm[rng.integers(40, nv - 40), rng.integers(0, nr)] += 60.0
    want_f, want_v = cascaded_cfar2d(jnp.asarray(rdm), cfg, 20)
    got_f, got_v = cascaded_cfar2d_pallas(jnp.asarray(rdm), cfg, 20)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_f), np.asarray(want_f))


def test_pallas_cfar_notched_rows_and_edge_columns(rng):
    """Notched all-zero rows self-flag (0 >= 0) and edge columns exercise
    the window fallbacks — the input class that exposed the sharded-halo
    phantom-winner bug; the fused kernel must stay bit-identical there."""
    rdm = _rdm(rng)
    rdm[44:53, :] = 0.0                        # wide clutter re-notch band
    rdm[int(rng.integers(8, 40)), 0] += 40.0   # global-edge column hits
    rdm[int(rng.integers(56, 88)), 159] += 40.0
    cfg = CFARConfig(ref_cells=5, guard_cells=7, threshold=5.0)
    want_f, want_v = cascaded_cfar2d(jnp.asarray(rdm), cfg, 6)
    got_f, got_v = cascaded_cfar2d_pallas(
        jnp.asarray(rdm), cfg, 6, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_f), np.asarray(want_f))
