"""PPO in JAX — the reference's training algorithm as pure functions.

Re-implements rsl_rl's PPO (reference: rsl_rl/rsl_rl/algorithms/ppo.py:19-485
and storage/rollout_storage.py:145-167 for GAE) with the whole update —
epochs × minibatches, adaptive-KL learning rate, gradient clipping — inside
one jitted function.  Multi-chip data parallelism replaces the reference's
NCCL all-reduce (ppo.py:444-485) with `pmean` inside ``shard_map`` — see
parallel/ (the gradient and KL reductions here take an optional axis name).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.networks import gaussian_entropy, gaussian_log_prob


@struct.dataclass
class PPOConfig:
    clip_param: float = 0.2
    num_learning_epochs: int = 5
    num_mini_batches: int = 4
    value_loss_coef: float = 1.0
    entropy_coef: float = 0.01
    learning_rate: float = 1.0e-3
    schedule: str = struct.field(pytree_node=False, default="adaptive")
    gamma: float = 0.99
    lam: float = 0.95
    desired_kl: float = 0.01
    max_grad_norm: float = 1.0
    use_clipped_value_loss: bool = struct.field(pytree_node=False, default=True)


class Transition(NamedTuple):
    """One collected step across all envs — the reference's RolloutStorage
    row (rollout_storage.py:13-63), produced by the collection scan."""

    obs: jnp.ndarray            # [B, obs]
    critic_obs: jnp.ndarray     # [B, obs_c]
    actions: jnp.ndarray        # [B, A]
    rewards: jnp.ndarray        # [B]
    dones: jnp.ndarray          # [B] bool
    values: jnp.ndarray         # [B]
    log_probs: jnp.ndarray      # [B]
    mu: jnp.ndarray             # [B, A]
    sigma: jnp.ndarray          # [A] or [B, A]


@struct.dataclass
class PPOState:
    params: Any
    opt_state: Any
    learning_rate: jnp.ndarray


def make_optimizer(cfg: PPOConfig):
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.inject_hyperparams(optax.adam)(learning_rate=cfg.learning_rate),
    )


def compute_gae(rewards, dones, values, last_value, gamma, lam, timeouts=None):
    """GAE(λ) returns (reference rollout_storage.py:145-167).  Timeout
    bootstrapping (ppo.py:180-183) is applied to rewards by the caller."""

    def scan_fn(adv_next, inp):
        r, d, v, v_next = inp
        not_done = 1.0 - d
        delta = r + gamma * v_next * not_done - v
        adv = delta + gamma * lam * not_done * adv_next
        return adv, adv

    values_next = jnp.concatenate([values[1:], last_value[None]], axis=0)
    _, advantages = jax.lax.scan(
        scan_fn, jnp.zeros_like(last_value),
        (rewards, dones.astype(jnp.float32), values, values_next),
        reverse=True)
    returns = advantages + values
    return advantages, returns


def make_mirror_fns(perm, signs):
    """Build a mirroring fn from an index permutation + sign flips — the
    usual left-right symmetry spec for legged robots (reference
    symmetry_cfg, ppo.py:337-370 / config/dummy_config.yaml)."""
    perm = jnp.asarray(perm, jnp.int32)
    signs = jnp.asarray(signs, jnp.float32)

    def mirror(x):
        return x[..., perm] * signs

    return mirror


def ppo_update(
    network,
    cfg: PPOConfig,
    ppo_state: PPOState,
    batch: Transition,            # stacked [T, B, ...]
    advantages: jnp.ndarray,      # [T, B]
    returns: jnp.ndarray,         # [T, B]
    key: jnp.ndarray,
    optimizer,
    axis_name: Optional[str] = None,
    symmetry=None,                # (mirror_obs_fn, mirror_act_fn, coef)
) -> Tuple[PPOState, Dict[str, jnp.ndarray]]:
    """Full PPO update: epochs × shuffled minibatches (reference ppo.py:197-442)."""
    T, B = advantages.shape
    N = T * B
    mb_size = N // cfg.num_mini_batches

    # advantage normalization over the whole batch (ppo.py:193-195)
    adv_mean, adv_std = advantages.mean(), advantages.std()
    if axis_name:
        adv_mean = jax.lax.pmean(adv_mean, axis_name)
        adv_std = jax.lax.pmean(adv_std, axis_name)
    advantages = (advantages - adv_mean) / (adv_std + 1e-8)

    def flat(x):
        return x.reshape((N,) + x.shape[2:])

    sigma_b = batch.sigma
    if sigma_b.ndim == 2:  # [T, A] state-independent std → broadcast per sample
        sigma_b = jnp.broadcast_to(batch.sigma[:, None, :], batch.mu.shape)
    data = dict(
        obs=flat(batch.obs), critic_obs=flat(batch.critic_obs),
        actions=flat(batch.actions), values=flat(batch.values),
        log_probs=flat(batch.log_probs), mu=flat(batch.mu), sigma=flat(sigma_b),
        advantages=flat(advantages), returns=flat(returns),
    )

    def loss_fn(params, mb):
        mean, std, value = network.apply(params, mb["obs"], mb["critic_obs"])
        log_prob = gaussian_log_prob(mean, std, mb["actions"])
        ratio = jnp.exp(log_prob - mb["log_probs"])
        surr1 = -mb["advantages"] * ratio
        surr2 = -mb["advantages"] * jnp.clip(ratio, 1 - cfg.clip_param, 1 + cfg.clip_param)
        surrogate_loss = jnp.maximum(surr1, surr2).mean()

        if cfg.use_clipped_value_loss:
            v_clipped = mb["values"] + jnp.clip(
                value - mb["values"], -cfg.clip_param, cfg.clip_param)
            v_loss = jnp.maximum(
                jnp.square(value - mb["returns"]),
                jnp.square(v_clipped - mb["returns"])).mean()
        else:
            v_loss = jnp.square(value - mb["returns"]).mean()

        entropy = gaussian_entropy(std).mean()
        total = surrogate_loss + cfg.value_loss_coef * v_loss - cfg.entropy_coef * entropy

        # symmetry-augmentation loss (reference ppo.py:337-370): mirrored
        # observations must produce mirrored mean actions
        if symmetry is not None:
            mirror_obs, mirror_act, sym_coef = symmetry
            m_mean, _, _ = network.apply(params, mirror_obs(mb["obs"]),
                                         mirror_obs(mb["critic_obs"])
                                         if mb["critic_obs"].shape == mb["obs"].shape
                                         else mb["critic_obs"])
            sym_loss = jnp.mean(jnp.square(
                m_mean - mirror_act(jax.lax.stop_gradient(mean))))
            total = total + sym_coef * sym_loss

        # KL(old ‖ new) for the adaptive schedule (ppo.py:283-292)
        std_b = jnp.broadcast_to(std, mb["sigma"].shape)
        kl = jnp.sum(
            jnp.log(std_b / (mb["sigma"] + 1e-8) + 1e-8)
            + (jnp.square(mb["sigma"]) + jnp.square(mb["mu"] - mean))
            / (2.0 * jnp.square(std_b)) - 0.5, axis=-1)
        aux = dict(value_loss=v_loss, surrogate_loss=surrogate_loss,
                   entropy=entropy, kl_mean=kl.mean())
        return total, aux

    def minibatch_step(carry, mb_idx):
        params, opt_state, lr = carry
        mb = jax.tree.map(lambda x: x[mb_idx], data)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, mb)

        kl_mean = aux["kl_mean"]
        if axis_name:
            grads = jax.lax.pmean(grads, axis_name)
            kl_mean = jax.lax.pmean(kl_mean, axis_name)
        # adaptive-KL learning rate (ppo.py:293-314)
        if cfg.schedule == "adaptive":
            lr = jnp.where(kl_mean > cfg.desired_kl * 2.0,
                           jnp.maximum(1e-5, lr / 1.5), lr)
            lr = jnp.where((kl_mean < cfg.desired_kl / 2.0) & (kl_mean > 0.0),
                           jnp.minimum(1e-2, lr * 1.5), lr)
        inject = opt_state[1]
        inject = inject._replace(hyperparams={**inject.hyperparams, "learning_rate": lr})
        opt_state = (opt_state[0], inject)
        # non-finite containment: a single exploded minibatch (divergent env
        # leaking inf rewards, KL blow-up) must not poison the parameters —
        # skip the step instead (the r1 anymal_flat smoke run died this way:
        # params went NaN at iter 150 and every later iteration was garbage)
        ok = jax.tree_util.tree_reduce(
            lambda a, g: a & jnp.all(jnp.isfinite(g)), grads, jnp.isfinite(loss))
        new_params, new_opt_state = _guarded_update(
            optimizer, grads, opt_state, params, ok)
        metrics = jnp.stack([loss, aux["value_loss"], aux["surrogate_loss"],
                             aux["entropy"], kl_mean,
                             1.0 - ok.astype(jnp.float32)])
        return (new_params, new_opt_state, lr), metrics

    def epoch_step(carry, key_e):
        perm = jax.random.permutation(key_e, N)
        mb_indices = perm[: mb_size * cfg.num_mini_batches].reshape(
            cfg.num_mini_batches, mb_size)
        carry, metrics = jax.lax.scan(minibatch_step, carry, mb_indices)
        return carry, metrics

    keys = jax.random.split(key, cfg.num_learning_epochs)
    (params, opt_state, lr), metrics = jax.lax.scan(
        epoch_step, (ppo_state.params, ppo_state.opt_state, ppo_state.learning_rate), keys)

    m = metrics.reshape(-1, 6).mean(axis=0)
    out = dict(loss=m[0], value_loss=m[1], surrogate_loss=m[2], entropy=m[3],
               kl=m[4], nonfinite_skips=m[5] * metrics.reshape(-1, 6).shape[0],
               learning_rate=lr)
    return PPOState(params=params, opt_state=opt_state, learning_rate=lr), out


def _guarded_update(optimizer, grads, opt_state, params, ok):
    """Apply the optimizer step only when every gradient (and the loss) is
    finite; otherwise keep params and optimizer state unchanged."""
    updates, opt_state_new = optimizer.update(
        jax.tree.map(jnp.nan_to_num, grads), opt_state, params)
    params_new = optax.apply_updates(params, updates)
    sel = lambda n, o: jnp.where(ok, n, o) if hasattr(n, "dtype") else n
    return (jax.tree.map(sel, params_new, params),
            jax.tree.map(sel, opt_state_new, opt_state))


def ppo_update_recurrent(
    network,
    cfg: PPOConfig,
    ppo_state: PPOState,
    batch: Transition,            # stacked [T, B, ...]
    carries0,                     # (carry_a, carry_c) at window start, [B, H]
    advantages: jnp.ndarray,      # [T, B]
    returns: jnp.ndarray,         # [T, B]
    key: jnp.ndarray,
    optimizer,
    axis_name: Optional[str] = None,
) -> Tuple[PPOState, Dict[str, jnp.ndarray]]:
    """PPO update for recurrent policies.

    The reference replays padded per-episode trajectories through the RNN with
    hidden-state resets on done (rollout_storage.py:246 recurrent generator +
    networks/memory.py unpacking).  Here the collected window is already a
    dense [T, B] tensor, so the natural TPU formulation is truncated BPTT over
    the window: minibatches split the ENV axis (keeping every sequence whole),
    each loss replays the T steps from the stored window-start carry with
    zero-resets where an episode ended mid-window.  Same gradient information,
    no padding or ragged batching.
    """
    T, B = advantages.shape
    assert B % cfg.num_mini_batches == 0 or B >= cfg.num_mini_batches
    mb_envs = B // cfg.num_mini_batches

    adv_mean, adv_std = advantages.mean(), advantages.std()
    if axis_name:
        adv_mean = jax.lax.pmean(adv_mean, axis_name)
        adv_std = jax.lax.pmean(adv_std, axis_name)
    advantages = (advantages - adv_mean) / (adv_std + 1e-8)

    sigma_b = batch.sigma
    if sigma_b.ndim == 2:  # [T, A] → [T, B, A]
        sigma_b = jnp.broadcast_to(batch.sigma[:, None, :], batch.mu.shape)
    data = dict(
        obs=batch.obs, critic_obs=batch.critic_obs, actions=batch.actions,
        values=batch.values, log_probs=batch.log_probs, mu=batch.mu,
        sigma=sigma_b, advantages=advantages, returns=returns,
        dones=batch.dones.astype(jnp.float32),
    )

    def loss_fn(params, mb, mb_carries):
        def rnn_step(carry, step):
            ca, cc = carry
            mean, std, value, ca, cc = network.apply(
                params, step["obs"], ca, cc, step["critic_obs"])
            # zero the carry where this step ended an episode, so the next
            # step starts fresh (mirrors the collection-time reset)
            d = step["dones"][:, None]
            ca = jax.tree.map(lambda h: h * (1.0 - d), ca)
            cc = jax.tree.map(lambda h: h * (1.0 - d), cc)
            return (ca, cc), (mean, std, value)

        (_, _), (mean, std, value) = jax.lax.scan(rnn_step, mb_carries, mb)
        if std.ndim == mean.ndim - 1:   # state-independent std: [T, A] → [T, 1, A]
            std = std[:, None, :]
        log_prob = gaussian_log_prob(mean, std, mb["actions"])
        ratio = jnp.exp(log_prob - mb["log_probs"])
        surr1 = -mb["advantages"] * ratio
        surr2 = -mb["advantages"] * jnp.clip(ratio, 1 - cfg.clip_param,
                                             1 + cfg.clip_param)
        surrogate_loss = jnp.maximum(surr1, surr2).mean()
        if cfg.use_clipped_value_loss:
            v_clipped = mb["values"] + jnp.clip(
                value - mb["values"], -cfg.clip_param, cfg.clip_param)
            v_loss = jnp.maximum(jnp.square(value - mb["returns"]),
                                 jnp.square(v_clipped - mb["returns"])).mean()
        else:
            v_loss = jnp.square(value - mb["returns"]).mean()
        entropy = gaussian_entropy(std).mean()
        total = surrogate_loss + cfg.value_loss_coef * v_loss \
            - cfg.entropy_coef * entropy
        std_b = jnp.broadcast_to(std, mb["sigma"].shape)
        kl = jnp.sum(
            jnp.log(std_b / (mb["sigma"] + 1e-8) + 1e-8)
            + (jnp.square(mb["sigma"]) + jnp.square(mb["mu"] - mean))
            / (2.0 * jnp.square(std_b)) - 0.5, axis=-1)
        aux = dict(value_loss=v_loss, surrogate_loss=surrogate_loss,
                   entropy=entropy, kl_mean=kl.mean())
        return total, aux

    def minibatch_step(carry, env_idx):
        params, opt_state, lr = carry
        mb = jax.tree.map(lambda x: x[:, env_idx], data)
        mb_carries = jax.tree.map(lambda c: c[env_idx], carries0)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, mb, mb_carries)
        kl_mean = aux["kl_mean"]
        if axis_name:
            grads = jax.lax.pmean(grads, axis_name)
            kl_mean = jax.lax.pmean(kl_mean, axis_name)
        if cfg.schedule == "adaptive":
            lr = jnp.where(kl_mean > cfg.desired_kl * 2.0,
                           jnp.maximum(1e-5, lr / 1.5), lr)
            lr = jnp.where((kl_mean < cfg.desired_kl / 2.0) & (kl_mean > 0.0),
                           jnp.minimum(1e-2, lr * 1.5), lr)
        inject = opt_state[1]
        inject = inject._replace(hyperparams={**inject.hyperparams,
                                              "learning_rate": lr})
        opt_state = (opt_state[0], inject)
        ok = jax.tree_util.tree_reduce(
            lambda a, g: a & jnp.all(jnp.isfinite(g)), grads, jnp.isfinite(loss))
        params, opt_state = _guarded_update(optimizer, grads, opt_state, params, ok)
        metrics = jnp.stack([loss, aux["value_loss"], aux["surrogate_loss"],
                             aux["entropy"], kl_mean])
        return (params, opt_state, lr), metrics

    def epoch_step(carry, key_e):
        perm = jax.random.permutation(key_e, B)
        idx = perm[: mb_envs * cfg.num_mini_batches].reshape(
            cfg.num_mini_batches, mb_envs)
        carry, metrics = jax.lax.scan(minibatch_step, carry, idx)
        return carry, metrics

    keys = jax.random.split(key, cfg.num_learning_epochs)
    (params, opt_state, lr), metrics = jax.lax.scan(
        epoch_step,
        (ppo_state.params, ppo_state.opt_state, ppo_state.learning_rate), keys)
    m = metrics.reshape(-1, 5).mean(axis=0)
    out = dict(loss=m[0], value_loss=m[1], surrogate_loss=m[2], entropy=m[3],
               kl=m[4], learning_rate=lr)
    return PPOState(params=params, opt_state=opt_state, learning_rate=lr), out
