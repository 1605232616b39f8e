"""Multi-host initialization.

Replaces the reference's torchrun/NCCL process-group setup
(reference: rsl_rl/rsl_rl/runners/on_policy_runner.py:758-800 reading
WORLD_SIZE/RANK/LOCAL_RANK and init_process_group("nccl")).  On TPU pods,
`jax.distributed.initialize` wires all hosts into one runtime; collectives
then ride ICI within a slice and DCN across slices with no separate
communication library."""
from __future__ import annotations

import os
from typing import Optional


def init_multi_host(coordinator_address: Optional[str] = None,
                    num_processes: Optional[int] = None,
                    process_id: Optional[int] = None) -> dict:
    """Initialize multi-host JAX.  Arguments default from the environment
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or TPU metadata when
    launched by the TPU runtime, which needs no arguments at all)."""
    import jax

    kwargs = {}
    addr = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if addr:
        kwargs = dict(
            coordinator_address=addr,
            num_processes=int(num_processes or os.environ.get("NUM_PROCESSES", 1)),
            process_id=int(process_id or os.environ.get("PROCESS_ID", 0)),
        )
        jax.distributed.initialize(**kwargs)
    else:
        # no explicit coordinator: let JAX auto-detect a cluster environment
        # (TPU metadata, SLURM, ...); on a plain single machine there is
        # nothing to join, which is not an error — run single-process
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            pass
    return dict(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_devices=len(jax.local_devices()),
        global_devices=len(jax.devices()),
        is_main=jax.process_index() == 0,   # rank-0 logging, ref :301
    )
