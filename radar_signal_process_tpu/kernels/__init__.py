"""Pallas TPU kernels for the fused hot paths."""

from radar_signal_process_tpu.kernels.cfar_pallas import (  # noqa: F401
    cascaded_cfar2d_pallas,
)
from radar_signal_process_tpu.kernels.rdm_pallas import (  # noqa: F401
    doppler_rdm_pallas,
)
