"""G1 simulation/validation chain (``MatlabProcess_xuzerui/main.m:206-239``).

Processes a real echo frame and a simulated-target frame side by side:
segmented pulse compression -> range re-concatenation (1031 -> 868 columns)
-> Kaiser-windowed Doppler FFT -> zero-velocity notch.  This is the
reference's de-facto integration test (SURVEY.md §3.5) and the template for
the framework's synthetic-target golden tests.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from radar_signal_process_tpu.config import G1_PROFILE, G1_RANGE_CONCAT, RadarProfile
from radar_signal_process_tpu.models.mtd_pipeline import mtd_produce
from radar_signal_process_tpu.ops.mtd import doppler_process, zero_velocity_notch
from radar_signal_process_tpu.ops.pulse_compression import (
    range_concatenate,
    segmented_pulse_compression,
)
from radar_signal_process_tpu.ops.waveforms import reference_pulses
from radar_signal_process_tpu.ops.windows import make_window


def make_g1_validation_chain(
    profile: RadarProfile = G1_PROFILE, pulses=None
):
    """Jitted G1 validation chain with optional measured matched filters.

    ``pulses`` overrides the synthesized reference waveforms per segment
    (the measured-pulse hook, ``fun_MTD_produce.m:72-78`` / ``temp.m:50-56``;
    build with ``ops.waveforms.pulses_with_overrides``).
    """
    if pulses is None:
        pulses = reference_pulses(profile)

    @jax.jit
    def chain(echo: jnp.ndarray) -> jnp.ndarray:
        pc = segmented_pulse_compression(echo, profile, pulses)
        pc = range_concatenate(pc, G1_RANGE_CONCAT)
        n_pulses = echo.shape[-2]
        window = make_window(
            profile.mtd.window, n_pulses, profile.mtd.window_beta
        )
        rdm = doppler_process(pc, window, shift=profile.mtd.fftshift)
        return zero_velocity_notch(rdm, divisor=profile.mtd.notch_divisor)

    return chain


@functools.lru_cache(maxsize=None)
def _default_chain(profile: RadarProfile):
    return make_g1_validation_chain(profile)


def g1_validation_chain(
    echo: jnp.ndarray, profile: RadarProfile = G1_PROFILE
) -> jnp.ndarray:
    """Echo (..., n_pulses, 1031) -> notched magnitude RDM (..., n_pulses, 868).

    The G1 chain differs from G2's ``mtd_produce`` by the range
    re-concatenation step between pulse compression and the Doppler FFT
    (``main.m:206-239``); the notch divisor comes from the profile
    (``fun_0v_pressing.m`` variants).  Synthesized-pulse convenience form
    of :func:`make_g1_validation_chain` (one cached jitted chain per
    profile).
    """
    return _default_chain(profile)(echo)
