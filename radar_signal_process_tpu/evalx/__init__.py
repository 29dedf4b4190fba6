"""Detection-quality evaluation (reference S4, ``main_cfar.m:163-279``)."""

from radar_signal_process_tpu.evalx.metrics import (  # noqa: F401
    TruthGate,
    false_alarm_rate,
    detection_rate,
    accuracy,
    localization_pcf,
    evaluate_frames,
)
