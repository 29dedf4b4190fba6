"""Tests: window menu parity vs scipy; threshold-sweep harness; MTI/iSTC hooks."""

import dataclasses

import numpy as np
import scipy.signal.windows as sw

import jax.numpy as jnp

from radar_signal_process_tpu.config import G2_PROFILE, MTDConfig
from radar_signal_process_tpu.evalx.sweep import format_sweep, sweep_thresholds
from radar_signal_process_tpu.models.mtd_pipeline import mtd_produce
from radar_signal_process_tpu.ops import make_window


def test_window_menu_matches_scipy():
    """The reference's 7-way window menu (DMX...m:179-198)."""
    n = 127
    np.testing.assert_allclose(make_window("hamming", n), sw.hamming(n, sym=True))
    np.testing.assert_allclose(make_window("hann", n), sw.hann(n, sym=True))
    np.testing.assert_allclose(
        make_window("kaiser", n, 4.5), sw.kaiser(n, 4.5, sym=True), rtol=1e-12
    )
    np.testing.assert_allclose(make_window("blackman", n), sw.blackman(n, sym=True))
    np.testing.assert_allclose(
        make_window("bohman", n), sw.bohman(n, sym=True), atol=1e-12
    )
    np.testing.assert_allclose(
        make_window("nuttall", n), sw.nuttall(n, sym=True), atol=1e-8
    )
    np.testing.assert_allclose(
        make_window("parzen", n), sw.parzen(n, sym=True), atol=2e-2
    )
    np.testing.assert_allclose(make_window("rect", n), np.ones(n))


SMALL = dataclasses.replace(
    G2_PROFILE, prt_per_frame=64, point_prt=256, segment_points=(32, 80, 144),
    cfar_segments=((0, 32), (32, 112), (112, 256)),
)


def test_sweep_harness_monotone_in_scr():
    from radar_signal_process_tpu.evalx import TruthGate

    thresholds = [5.0]
    out = sweep_thresholds(
        SMALL, thresholds, scr_db=[-40.0, 25.0], velocity_ms=-8.0, range_m=60.0,
        n_frames=2, clutter_v=1.0,
        # the small geometry puts the truth at ~252 m: widen the range gate
        gate=TruthGate(r_min=100.0, r_max=2000.0),
    )
    weak = out[(-40.0, 5.0)]
    strong = out[(25.0, 5.0)]
    assert strong["detection_rate"] >= weak["detection_rate"]
    assert strong["detection_rate"] == 1.0
    table = format_sweep(out)
    assert "SCR" in table and "5.0" in table


def test_mti_hook_cancels_stationary(rng):
    prof = dataclasses.replace(
        SMALL, mtd=MTDConfig(notch_divisor=0, mti_lag=8)
    )
    echo = np.zeros((64, 256), dtype=np.complex128)
    echo[:, 40] = 5.0  # perfectly stationary return
    rdm_mti = np.asarray(mtd_produce(jnp.asarray(echo), prof))
    prof_no = dataclasses.replace(SMALL, mtd=MTDConfig(notch_divisor=0))
    rdm_raw = np.asarray(mtd_produce(jnp.asarray(echo), prof_no))
    # MTI cancels the DC return that the plain chain keeps
    assert rdm_raw.max() > 100 * rdm_mti.max()


def test_istc_hook_applies_gain():
    prof = dataclasses.replace(SMALL, mtd=MTDConfig(istc=True, notch_divisor=0))
    echo = np.ones((64, 256), dtype=np.complex128)
    stc = np.full(256, 20.0)  # +20 dB -> x10 amplitude
    rdm_istc = np.asarray(mtd_produce(jnp.asarray(echo), prof, stc_curve_db=stc))
    rdm_plain = np.asarray(
        mtd_produce(jnp.asarray(echo), dataclasses.replace(SMALL, mtd=MTDConfig(notch_divisor=0)))
    )
    np.testing.assert_allclose(rdm_istc, 10.0 * rdm_plain, rtol=1e-9)


def test_mtd_window_produce_matches_slice_then_produce(rng):
    """Compress-once-then-slice is bit-identical to the reference order.

    ``mtd_window_produce`` runs iSTC + pulse compression on the doubled
    window before slicing (rows are fast-time independent); MTI, Doppler
    and the notch stay per-slice.  Must equal
    ``mtd_produce(slice_cpi_window(...))`` exactly — with the dormant
    hooks active too.
    """
    from radar_signal_process_tpu.models.mtd_pipeline import (
        mtd_window_produce,
        slice_cpi_window,
    )

    echo = jnp.asarray(
        rng.standard_normal((2, 128, 256)) + 1j * rng.standard_normal((2, 128, 256))
    )
    stc = np.linspace(0.0, 12.0, 256)
    for prof in (
        SMALL,
        dataclasses.replace(SMALL, mtd=MTDConfig(mti_lag=8, istc=True)),
    ):
        a = np.asarray(mtd_window_produce(echo, prof, 4, stc_curve_db=stc))
        b = np.asarray(
            mtd_produce(slice_cpi_window(echo, 4), prof, stc_curve_db=stc)
        )
        np.testing.assert_array_equal(a, b)
