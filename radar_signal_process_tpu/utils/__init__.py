"""Utilities: frame manifests, structured counters, per-stage profiling."""

from radar_signal_process_tpu.utils.manifest import (  # noqa: F401
    save_frame,
    load_frame,
    frame_exists,
)
from radar_signal_process_tpu.utils.logging import Counters, get_logger  # noqa: F401
from radar_signal_process_tpu.utils.profiling import StageTimers  # noqa: F401
