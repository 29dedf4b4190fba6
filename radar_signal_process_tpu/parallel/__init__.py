"""Multi-chip execution: meshes, shardings, halo-exchange collectives.

The reference is single-process MATLAB with zero parallelism (SURVEY.md §2.6);
its embarrassingly-parallel loop axes (beam x slice x frame, range bins, PRTs)
become sharding dimensions here:

* ``mesh``      — device-mesh construction helpers;
* ``sharding``  — data-parallel batching and range-axis sharding with
  ``shard_map`` + ``ppermute`` halo exchange for CFAR reference windows
  (the "file-bus" replacement specified in SURVEY.md §5.8).
"""

from radar_signal_process_tpu.parallel.mesh import make_mesh, best_mesh_shape  # noqa: F401
from radar_signal_process_tpu.parallel.sharding import (  # noqa: F401
    halo_exchange,
    sharded_cfar1d_ref_level,
    make_sharded_pipeline,
    make_sharded_e2e,
    make_pipeline_parallel,
    make_expert_parallel,
)
