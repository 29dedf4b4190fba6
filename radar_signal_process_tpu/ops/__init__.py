"""Jitted DSP kernels (reference layer L2, SURVEY.md §2.2)."""

from radar_signal_process_tpu.ops.windows import make_window  # noqa: F401
from radar_signal_process_tpu.ops.waveforms import (  # noqa: F401
    reference_pulses,
    composite_transmit_pulse,
)
from radar_signal_process_tpu.ops.pulse_compression import (  # noqa: F401
    matched_filter_compress,
    fir_compress,
    segmented_pulse_compression,
    range_concatenate,
)
from radar_signal_process_tpu.ops.mtd import (  # noqa: F401
    doppler_process,
    doppler_process_range_major,
    zero_velocity_notch,
    zero_velocity_notch_unshifted,
    mti_cancel,
    istc_compensate,
)
from radar_signal_process_tpu.ops.cfar import (  # noqa: F401
    cfar1d,
    cfar1d_ref_level,
    cascaded_cfar2d,
    segmented_cfar,
    segmented_cfar_flags,
    segmented_cfar_select,
    segmented_cfar_ref_levels,
    segmented_cfar_from_ref_levels,
)
from radar_signal_process_tpu.ops.dbf import apply_dbf  # noqa: F401
from radar_signal_process_tpu.ops.measure import (  # noqa: F401
    extract_detections,
    motion_parameters,
    spline_interp_notaknot,
)
from radar_signal_process_tpu.ops.tables import angle_k_values, freq_value  # noqa: F401
from radar_signal_process_tpu.ops.spectrum import amp_constrained_width  # noqa: F401
