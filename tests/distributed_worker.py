"""Two-process ``jax.distributed`` worker (run by test_distributed.py).

Each process contributes 2 virtual CPU devices to a 4-device global ``dp``
mesh, runs the radar chain sharded over frames, and reduces to a replicated
scalar — the first actual cross-process execution of the DCN path that
``parallel/multihost.py`` wires (SURVEY.md §5.8).

Usage: python distributed_worker.py <process_id> <coordinator> <out_json>
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys


def tiny_profile():
    from radar_signal_process_tpu.config import G2_PROFILE

    return dataclasses.replace(
        G2_PROFILE,
        prt_per_frame=32,
        point_prt=344,
        segment_points=(24, 80, 240),
        cfar_segments=((0, 24), (24, 104), (104, 344)),
        n_beams=2,
    )


def make_batch():
    import numpy as np

    prof = tiny_profile()
    rng = np.random.default_rng(42)
    shape = (4, prof.prt_per_frame, prof.point_prt)
    return (
        (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
            np.complex64
        )
    )


def chain_sums(x, prof):
    """Frame batch -> [sum(rdm), sum(flags)] (f32), the parity payload."""
    import jax.numpy as jnp

    from radar_signal_process_tpu.config import CFARConfig
    from radar_signal_process_tpu.models.detect import detect_rdm
    from radar_signal_process_tpu.models.mtd_pipeline import mtd_produce

    rdm = mtd_produce(x, prof)
    flags, _ = detect_rdm(rdm, prof, n_clutter=4, cfg=CFARConfig(threshold=5.0))
    return jnp.stack(
        [jnp.sum(rdm).astype(jnp.float32), jnp.sum(flags).astype(jnp.float32)]
    )


def main() -> int:
    pid = int(sys.argv[1])
    coordinator = sys.argv[2]
    out_path = sys.argv[3]

    import jax

    from radar_signal_process_tpu.parallel.multihost import (
        host_frame_assignment,
        initialize_distributed,
    )

    got_pid, n_procs = initialize_distributed(coordinator, 2, pid)
    assert (got_pid, n_procs) == (pid, 2), (got_pid, n_procs)
    assert len(jax.devices()) == 4, jax.devices()  # 2 local x 2 processes

    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from radar_signal_process_tpu.parallel.mesh import make_mesh

    prof = tiny_profile()
    batch = make_batch()

    # host-local frame ownership (the streaming-ingest assignment helper);
    # dp sharding over the global mesh, replicated scalar out -> XLA
    # inserts the cross-process reduction over the DCN transport
    own = host_frame_assignment(4, pid, 2)
    local = batch[own.start : min(own.stop, 4)][:2]  # 2 frames per process
    mesh = make_mesh(("dp",), shape=(4,))
    garr = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("dp")
    )
    fn = jax.jit(
        lambda x: chain_sums(x, prof),
        in_shardings=NamedSharding(mesh, P("dp")),
        out_shardings=NamedSharding(mesh, P()),
    )
    sums = jax.block_until_ready(fn(garr))

    # Phase 2: the halo-exchange sharded pipeline over a (dp=2, sp=2)
    # global mesh — sp's ppermute/all_to_all collectives cross the process
    # boundary (the DCN transport), not just dp's final reduction.
    from radar_signal_process_tpu.parallel.sharding import make_sharded_pipeline

    mesh2 = make_mesh(("dp", "sp"), shape=(2, 2))
    run = make_sharded_pipeline(prof, mesh2, n_clutter=4, renotch_divisor=20)
    garr2 = multihost_utils.host_local_array_to_global_array(
        local, mesh2, P("dp")
    )
    rdm_s, flags_s, _ = run(garr2)
    import jax.numpy as _jnp

    halo = jax.jit(
        lambda r, f: _jnp.stack(
            [_jnp.sum(r).astype(_jnp.float32), _jnp.sum(f).astype(_jnp.float32)]
        ),
        out_shardings=NamedSharding(mesh2, P()),
    )(rdm_s, flags_s)
    halo = jax.block_until_ready(halo)

    # Phase 3: two consecutive sharded-STREAM steps (round-4 mesh
    # streaming): the compressed, range-sharded frame is carried on device
    # between jitted calls, with its all_to_all/ppermute collectives — and
    # the carry itself — living on the cross-process mesh.
    import numpy as np

    from radar_signal_process_tpu.parallel.sharding import make_sharded_stream

    init, step_fn = make_sharded_stream(
        prof, mesh2, n_clutter=4, win_size=4, renotch_divisor=20
    )
    rng = np.random.default_rng(7)
    fshape = (2, prof.prt_per_frame, prof.point_prt)
    frames = [
        (rng.standard_normal(fshape) + 1j * rng.standard_normal(fshape))
        .astype(np.complex64)
        for _ in range(3)
    ]
    in_sh = NamedSharding(mesh2, P("dp", "sp", None))

    def to_global(arr):
        return jax.make_array_from_callback(
            arr.shape, in_sh, lambda idx: arr[idx]
        )

    reduce_fn = jax.jit(
        lambda f: _jnp.sum(f).astype(_jnp.float32)[None],
        out_shardings=NamedSharding(mesh2, P()),
    )
    pc = init(to_global(frames[0]))
    stream_sums = []
    for w in (1, 2):
        pc, _, flags_w, _ = step_fn(pc, to_global(frames[w]))
        stream_sums.append(
            float(jax.block_until_ready(reduce_fn(flags_w))[0])
        )

    result = {
        "process_id": pid,
        "num_processes": n_procs,
        "n_devices": len(jax.devices()),
        "rdm_sum": float(sums[0]),
        "flag_sum": float(sums[1]),
        "halo_rdm_sum": float(halo[0]),
        "halo_flag_sum": float(halo[1]),
        "stream_flag_sums": stream_sums,
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
