"""Golden tests: pulse compression ops vs the NumPy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from radar_signal_process_tpu.config import (
    G1_PROFILE,
    G1_RANGE_CONCAT,
    G2_PROFILE,
    NARROW_PULSE_FIR_TAPS,
)
from radar_signal_process_tpu.ops import (
    fir_compress,
    matched_filter_compress,
    range_concatenate,
    reference_pulses,
    segmented_pulse_compression,
)
from tests.oracle import dsp as oracle


def test_reference_pulse_shapes():
    p1, p2, p3 = reference_pulses(G2_PROFILE)
    # fun_MTD_produce.m comments: 4 / 200 / 700 points at fs = 25 MHz
    assert (len(p1), len(p2), len(p3)) == (4, 200, 700)
    g1 = reference_pulses(G1_PROFILE)
    # main.m:73-75: 7 / 75 / 160 points
    assert tuple(len(p) for p in g1) == (7, 75, 160)


def test_matched_filter_matches_oracle(rng):
    pulse = reference_pulses(G2_PROFILE)[1]
    echo = rng.standard_normal((6, 723)) + 1j * rng.standard_normal((6, 723))
    full = matched_filter_compress(jnp.asarray(echo), pulse, extract=False)
    want = np.stack([oracle.matched_filter_full(pulse, row) for row in echo])
    np.testing.assert_allclose(np.asarray(full), want, rtol=1e-9, atol=1e-9)


def test_matched_filter_extraction_alignment():
    # a clean pulse echo at offset d must compress to a peak at column d
    pulse = reference_pulses(G2_PROFILE)[1]
    d = 57
    echo = np.zeros(723, dtype=np.complex128)
    echo[d : d + len(pulse)] = pulse
    pc = matched_filter_compress(jnp.asarray(echo)[None, :], pulse)[0]
    assert int(np.argmax(np.abs(np.asarray(pc)))) == d


def test_fir_compress_matches_oracle(rng):
    taps = np.asarray(NARROW_PULSE_FIR_TAPS, dtype=np.float64)
    x = rng.standard_normal((4, 228)) + 1j * rng.standard_normal((4, 228))
    got = fir_compress(jnp.asarray(x))
    b = taps / taps.max()
    want = np.stack(
        [np.roll(oracle.fir_filter_causal(b, row), -17)[:228] / 1.2 for row in x]
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("profile", [G2_PROFILE, G1_PROFILE], ids=["G2", "G1"])
def test_segmented_pc_matches_oracle(rng, profile):
    pulses = reference_pulses(profile)
    echo = rng.standard_normal((8, profile.point_prt)) + 1j * rng.standard_normal(
        (8, profile.point_prt)
    )
    got = segmented_pulse_compression(jnp.asarray(echo), profile, pulses)
    want = oracle.segmented_pulse_compression(
        echo,
        profile.segment_points,
        pulses,
        np.asarray(NARROW_PULSE_FIR_TAPS, dtype=np.float64),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-8, atol=1e-8)


def test_segmented_pc_batched_shapes(rng):
    profile = G2_PROFILE
    pulses = reference_pulses(profile)
    echo = rng.standard_normal((3, 2, 5, profile.point_prt)).astype(np.complex128)
    out = segmented_pulse_compression(jnp.asarray(echo), profile, pulses)
    assert out.shape == echo.shape


def test_range_concatenate_matches_oracle(rng):
    pc = rng.standard_normal((7, 1031)) + 1j * rng.standard_normal((7, 1031))
    got = range_concatenate(jnp.asarray(pc), G1_RANGE_CONCAT)
    want = oracle.range_concatenate_g1(pc)
    assert got.shape == (7, 868)
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=0)
