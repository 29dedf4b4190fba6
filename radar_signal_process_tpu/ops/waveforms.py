"""Reference transmit-waveform synthesis.

Replicates the ideal LFM pulse construction of the reference
(``MTD/fun_MTD_produce.m:61-69`` for G2, ``MatlabProcess_xuzerui/main.m:68-80``
for G1): for each pulse ``i`` with width ``tau_i`` and chirp slope ``K_i``,

* time axis ``t = -tau/2 : ts : tau/2 - ts``,
* narrow (unmodulated) pulse: ``sin(2*pi*t + pi/2)``,
* chirped pulses: ``exp(j*2*pi*(0.5*K*t^2))`` (f0 = 0).

Pulses are compile-time constants, built host-side in float64 NumPy.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from radar_signal_process_tpu.config import RadarProfile


def reference_pulses(profile: RadarProfile) -> Tuple[np.ndarray, ...]:
    """Return the per-pulse reference waveforms for matched filtering."""
    ts = profile.ts
    pulses = []
    for tau, k_slope, sign in zip(
        profile.pulse_widths, profile.chirp_slopes, profile.chirp_signs
    ):
        n = int(round(tau / ts))
        t = (np.arange(n) * ts) - tau / 2.0
        if sign == 0:
            # narrow simple pulse: sin(2*pi*t + pi/2) == cos(2*pi*t)
            pulses.append(np.sin(2.0 * np.pi * t + np.pi / 2.0).astype(np.complex128))
        else:
            pulses.append(np.exp(1j * 2.0 * np.pi * (0.5 * k_slope * t**2)))
    return tuple(pulses)


def composite_transmit_pulse(profile: RadarProfile) -> np.ndarray:
    """Composite transmit waveform: pulses placed at their segment starts.

    Reference: ``main.m:76-80`` places pulse_i at the start of segment i of the
    PRT sample grid.
    """
    out = np.zeros(profile.point_prt, dtype=np.complex128)
    for start, pulse in zip(profile.segment_starts, reference_pulses(profile)):
        out[start : start + len(pulse)] = pulse
    return out
