"""Roofline model of the frame pipeline from XLA cost analysis.

The session TPU relay cannot report execution timing (CLAUDE.md), so this
tool bounds per-stage device time analytically: it lowers each jitted stage,
reads XLA's compiled cost analysis (FLOPs and bytes accessed), and divides
by the target chip's peak compute and HBM bandwidth.  The larger of the two
quotients is the stage's speed-of-light time; real time approaches it as the
op mix fuses well.

Run on any backend (the cost analysis is backend-independent enough for a
bound; compile on TPU for exact fusion choices):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/roofline.py
    # or submit tools/roofline.py through tools/tpu_runner.py for TPU HLO

Chip presets cover the session hardware (v5e) and common alternatives.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHIPS = {
    # name: (peak f32 FLOP/s, HBM bytes/s)  — public spec-sheet numbers
    "v5e": (197e12 / 2, 819e9),     # 197 TFLOP/s bf16 -> ~98.5 f32
    "v4": (275e12 / 2, 1228e9),
    "cpu2core": (134e9, 20e9),      # the 2-core session host, measured class
}


def stage_costs():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from radar_signal_process_tpu.config import CFARConfig, G2_PROFILE
    from radar_signal_process_tpu.models.detect import detect_rdm
    from radar_signal_process_tpu.models.mtd_pipeline import slice_cpi_window
    from radar_signal_process_tpu.ops.mtd import doppler_process, zero_velocity_notch
    from radar_signal_process_tpu.ops.pulse_compression import (
        segmented_pulse_compression,
    )
    from radar_signal_process_tpu.ops.waveforms import reference_pulses
    from radar_signal_process_tpu.ops.windows import make_window

    prof = G2_PROFILE
    pulses = reference_pulses(prof)
    window = make_window(prof.mtd.window, prof.prt_per_frame, prof.mtd.window_beta)
    cfg = CFARConfig(threshold=5.0)
    rng = np.random.default_rng(0)

    win = jnp.asarray(
        (rng.standard_normal((prof.n_beams, 2 * prof.prt_per_frame, prof.point_prt))
         + 1j * rng.standard_normal(
             (prof.n_beams, 2 * prof.prt_per_frame, prof.point_prt))).astype(
            np.complex64
        )
    )

    def pc(w):
        return segmented_pulse_compression(w, prof, pulses)

    pc_out = jax.jit(pc)(win)
    slices = jax.jit(lambda p: slice_cpi_window(p, 4))(pc_out)

    def mtd(s):
        r = doppler_process(s, window)
        return zero_velocity_notch(r, divisor=prof.mtd.notch_divisor)

    rdms = jax.jit(mtd)(slices)

    def cfar(r):
        return detect_rdm(r, prof, n_clutter=14, cfg=cfg, use_pallas=False)[0]

    stages = {"pc(13x664)": (pc, win), "mtd(13x4x332)": (mtd, slices),
              "cfar(13x4x332)": (cfar, rdms)}
    out = {}
    for name, (fn, x) in stages.items():
        compiled = jax.jit(fn).lower(x).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        out[name] = {
            "gflops": round(float(ca.get("flops", 0.0)) / 1e9, 2),
            "gbytes": round(float(ca.get("bytes accessed", 0.0)) / 1e9, 2),
        }
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chip", default="v5e", choices=sorted(CHIPS))
    args = ap.parse_args()
    flops_rate, bw = CHIPS[args.chip]

    costs = stage_costs()
    total_ms = 0.0
    for name, c in costs.items():
        t_flops = c["gflops"] * 1e9 / flops_rate
        t_mem = c["gbytes"] * 1e9 / bw
        sol_ms = max(t_flops, t_mem) * 1e3
        bound = "memory" if t_mem >= t_flops else "compute"
        c.update(sol_ms=round(sol_ms, 3), bound=bound)
        total_ms += sol_ms
    print(json.dumps({
        "chip": args.chip,
        "stages": costs,
        "frame_speed_of_light_ms": round(total_ms, 2),
        "frames_per_s_bound": round(1e3 / total_ms, 1) if total_ms else None,
    }, indent=2))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
