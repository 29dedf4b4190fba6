"""Simulation harness: synthetic LFM targets, SCR control, clutter injection.

Reference components S1-S3 (SURVEY.md §2.3): the validation path injects a
synthetic moving target at a known (range, velocity) into measured clutter at
a controlled signal-to-clutter ratio and checks the full chain recovers it
(``MatlabProcess_xuzerui/main.m:184-280``).
"""

from radar_signal_process_tpu.sim.targets import (  # noqa: F401
    synthesize_target_echo,
    synthesize_scene,
)
from radar_signal_process_tpu.sim.scr import apply_scr  # noqa: F401
from radar_signal_process_tpu.sim.clutter import (  # noqa: F401
    add_clutter,
    synthetic_clutter,
)
