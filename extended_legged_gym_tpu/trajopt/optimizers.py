"""Sampling-based trajectory-update rules: MPPI / WBFO / AVWBFO.

Rebuilds the optimizer family of the external ``traj_sampling`` package
(reference call surface: cmp_mppi_wbfo.py:224-233 MPPI softmax update,
``wbfo.optimize(mean, samples, step_rewards)`` at test_wbfo.py:106 and
cmp_mppi_wbfo.py:297-301; selected by cfg ``update_method`` ∈
{mppi, wbfo, avwbfo}, robot_traj_grad_sampling_config.py:62-64).

The WBFO internals are not vendored in the reference, so the update rule here
is reconstructed from the PegasusFlow / DIAL-MPC formulation:

* **MPPI** — one softmax weight per *sample* from its total (per-step summed,
  z-normalized) reward; new mean = weighted average of sampled node
  trajectories.
* **WBFO** — one softmax weight per *(sample, node)*: each node aggregates
  the per-step rewards under its basis-function support (columns of the
  node→dense interpolation matrix), so early nodes are updated by early
  rewards instead of the whole-trajectory return.  Per-node z-normalization
  across samples keeps the temperature scale-free.
* **AVWBFO** — WBFO on discounted reward-to-go ``R_t = Σ_{t'≥t} γ^{t'-t} r_{t'}``
  (cfg ``gamma``, robot_traj_grad_sampling_config.py:64), which scores each
  node by the *future* consequences of its action — the reference's default
  (anymal_c_traj_grad_sampling_config.py:69).

All three are shape-static pure functions: [N, Hn+1, A] samples ×
[N, Hs+1] step rewards → [Hn+1, A] updated mean; batched over main envs with
``vmap`` and across chips with ``shard_map`` + ``psum`` (the weighted averages
are plain reductions over the sample axis).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _znorm(x: jnp.ndarray, axis, eps: float = 1e-6) -> jnp.ndarray:
    return (x - x.mean(axis=axis, keepdims=True)) / (x.std(axis=axis, keepdims=True) + eps)


def mppi_update(mean_nodes: jnp.ndarray, samples: jnp.ndarray,
                step_rewards: jnp.ndarray, temp: float) -> jnp.ndarray:
    """MPPI softmax-weighted average (cmp_mppi_wbfo.py:224-233 semantics:
    z-normalized total rewards / temperature)."""
    totals = step_rewards.sum(axis=-1)                      # [N]
    weights = jax.nn.softmax(_znorm(totals, axis=0) / temp, axis=0)
    return jnp.einsum("n,nha->ha", weights, samples)


def wbfo_update(mean_nodes: jnp.ndarray, samples: jnp.ndarray,
                step_rewards: jnp.ndarray, temp: float,
                basis: jnp.ndarray) -> jnp.ndarray:
    """Weighted basis-function optimization: per-node softmax over samples.

    ``basis`` is the node→dense interpolation matrix [Hs+1, Hn+1]; its column
    j is node j's influence profile over dense steps.  Negative lobes of the
    interpolating spline are clamped: influence must be a nonnegative measure,
    otherwise good rewards under a negative lobe *repel* the node."""
    pos = jnp.maximum(basis, 0.0)
    col = pos / (pos.sum(axis=0, keepdims=True) + 1e-9)        # [D, Hn+1]
    node_scores = jnp.einsum("nd,dh->nh", step_rewards, col)   # [N, Hn+1]
    weights = jax.nn.softmax(_znorm(node_scores, axis=0) / temp, axis=0)  # [N, Hn+1]
    return jnp.einsum("nh,nha->ha", weights, samples)


def avwbfo_update(mean_nodes: jnp.ndarray, samples: jnp.ndarray,
                  step_rewards: jnp.ndarray, temp: float,
                  basis: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """Advantage/discounted-return WBFO: basis-weight the reward-to-go."""

    def disc_scan(carry, r):
        carry = r + gamma * carry
        return carry, carry

    _, rtg_rev = jax.lax.scan(disc_scan, jnp.zeros(step_rewards.shape[0]),
                              step_rewards.T, reverse=True)
    rtg = rtg_rev.T                                            # [N, D]
    return wbfo_update(mean_nodes, samples, rtg, temp, basis)


def make_update_fn(method: str, temp: float, basis: jnp.ndarray,
                   gamma: float = 1.0) -> Callable:
    """Bind an update rule: (mean_nodes, samples, step_rewards) → new mean."""
    if method == "mppi":
        return lambda m, s, r: mppi_update(m, s, r, temp)
    if method == "wbfo":
        return lambda m, s, r: wbfo_update(m, s, r, temp, basis)
    if method == "avwbfo":
        return lambda m, s, r: avwbfo_update(m, s, r, temp, basis, gamma)
    raise ValueError(f"unknown update method {method}")
