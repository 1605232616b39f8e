"""Device mesh + sharding helpers.

Replaces the reference's NCCL/torchrun multi-GPU path
(reference: rsl_rl/rsl_rl/runners/on_policy_runner.py:758-800 rank/world-size
setup and algorithms/ppo.py:444-485 broadcast/all-reduce) with JAX GSPMD:
state is sharded over a named mesh axis and XLA inserts the collectives over
ICI.  Two axes matter in this domain (SURVEY §2.6):

* ``dp`` — environment data parallelism: EnvState's leading env axis is
  sharded for RL collection + PPO (gradient reduction becomes an automatic
  psum over ``dp``).
* samples — the MPC's parallel axis: the [E, S, H, A] rollout batch is
  sharded over S, with the MPPI/WBFO weighted reductions riding psum.

Multi-host extends the same mesh over DCN via jax.distributed — no separate
communication library.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def shard_batch(tree: Any, mesh: Mesh, batch_size: int, axis_name: str = "dp") -> Any:
    """Shard every leaf whose leading dim == batch_size over the mesh axis;
    replicate everything else (scalars, ranges, global counters)."""

    def place(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] == batch_size:
            spec = P(axis_name)
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), NamedSharding(mesh, P())), tree)
