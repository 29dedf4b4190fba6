"""Threshold / SCR sweep evaluation harness (build plan §7.2 item 8).

Generalizes the reference's ``for T=[5]`` threshold loop
(``main_cfar.m:40``) into a batched sweep: simulated targets at known
kinematics are injected at a grid of SCRs, the full MTD+CFAR chain runs per
(SCR, threshold) cell, and the S4 detection metrics are tabulated.  The
threshold axis is vmapped — one compile covers the whole sweep.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from radar_signal_process_tpu.config import RadarProfile
from radar_signal_process_tpu.evalx.metrics import TruthGate, evaluate_frames
from radar_signal_process_tpu.models.detect import clutter_cells
from radar_signal_process_tpu.models.mtd_pipeline import mtd_produce
from radar_signal_process_tpu.sim import (
    add_clutter,
    apply_scr,
    synthesize_target_echo,
    synthetic_clutter,
)


def sweep_thresholds(
    profile: RadarProfile,
    thresholds: Sequence[float],
    scr_db: Sequence[float],
    velocity_ms: float,
    range_m: float,
    n_frames: int = 4,
    clutter_v: float = 3.0,
    renotch_divisor: int | None = 20,
    seed: int = 0,
    gate: TruthGate = TruthGate(),
) -> dict:
    """Returns ``{(scr, T): metrics_dict}`` over the sweep grid."""
    n = profile.prt_per_frame
    n_clutter = clutter_cells(profile, n, clutter_v)
    r_axis = profile.range_axis(profile.point_prt)
    v_axis = profile.velocity_axis(n)

    # truth in *global* RDM coordinates: use the mid-segment column
    seg_start = profile.segment_starts[1]
    r_cell = seg_start + int(round(range_m / profile.delta_r))
    r_true_global = r_axis[r_cell]

    from radar_signal_process_tpu.ops.cfar import (
        segmented_cfar_from_ref_levels,
        segmented_cfar_ref_levels,
    )
    from radar_signal_process_tpu.ops.mtd import (
        zero_velocity_notch,
        zero_velocity_notch_unshifted,
    )

    cfg = profile.cfar
    segments = profile.cfar_segments or ((0, profile.point_prt),)

    # The CA-CFAR reference levels are threshold-independent, so the sweep
    # runs MTD + the sliding-window means ONCE per frame and re-runs only
    # the compare + cascade per threshold (traced scalar: one executable
    # covers the whole threshold axis).
    @jax.jit
    def prep(echo):
        rdm = mtd_produce(echo, profile)
        rdmn = rdm
        if renotch_divisor:
            if profile.mtd.fftshift:
                rdmn = zero_velocity_notch(rdm, divisor=renotch_divisor)
            else:
                rdmn = zero_velocity_notch_unshifted(rdm, n_clutter)
        vref, rref = segmented_cfar_ref_levels(rdmn, segments, cfg, n_clutter)
        return rdm, rdmn, vref, rref

    @jax.jit
    def flags_at(rdmn, vref, rref, threshold):
        flags, _ = segmented_cfar_from_ref_levels(
            rdmn, vref, rref, threshold, segments, cfg, n_clutter
        )
        return flags

    results = {}
    target = synthesize_target_echo(profile, velocity_ms, range_m, n_pulses=n)
    for scr in scr_db:
        frames_flags = {t: [] for t in thresholds}
        frames_rdm = []
        for f in range(n_frames):
            clutter = synthetic_clutter(profile, n_pulses=n, seed=seed + 97 * f)
            echo = add_clutter(apply_scr(target, clutter, scr, profile), clutter)
            rdm, rdmn, vref, rref = prep(jnp.asarray(echo))
            for t in thresholds:
                flags = flags_at(rdmn, vref, rref, float(t))
                frames_flags[t].append(np.asarray(flags))
            frames_rdm.append(np.asarray(rdm))
        for t in thresholds:
            metrics = evaluate_frames(
                frames_flags[t],
                frames_rdm,
                [r_true_global] * n_frames,
                [velocity_ms] * n_frames,
                r_axis,
                v_axis,
                gate=gate,
            )
            results[(float(scr), float(t))] = metrics
    return results


def format_sweep(results: dict) -> str:
    lines = [
        f"{'SCR dB':>7} {'T':>5} {'Pd':>6} {'FA rate':>10} {'acc':>6} {'PCF':>6}"
    ]
    for (scr, t), m in sorted(results.items()):
        lines.append(
            f"{scr:7.1f} {t:5.1f} {m['detection_rate']:6.2f} "
            f"{m['false_alarm_rate']:10.2e} {m['accuracy']:6.2f} "
            f"{m['localization_pcf']:6.2f}"
        )
    return "\n".join(lines)
