"""Pipeline orchestrators (reference layers L3/L4, SURVEY.md §1).

One module per radar generation / processing chain:

* ``mtd_pipeline`` — the G2 windowed MTD dataset chain
  (``MTD/main_produce_dataset_win_xzr_v2.m`` + ``fun_MTD_produce.m``);
* ``detect`` — RDM -> CFAR flags -> detection list
  (``CFAR_WangCai/main_cfar.m``);
* ``g0_chain`` — the fully-vectorized G0 end-to-end chain with monopulse
  parameter measurement (``DMX_SignalProcessing_main_xzr.m``);
* ``g1_chain`` — the G1 simulation/validation chain
  (``MatlabProcess_xuzerui/main.m``).
"""

from radar_signal_process_tpu.models.mtd_pipeline import (  # noqa: F401
    mtd_produce,
    window_slice_starts,
    make_frame_processor,
)
from radar_signal_process_tpu.models.detect import (  # noqa: F401
    make_detector,
    make_split_detector,
    detect_rdm,
)
from radar_signal_process_tpu.models.g0_chain import G0Chain  # noqa: F401
from radar_signal_process_tpu.models.g1_chain import g1_validation_chain  # noqa: F401
