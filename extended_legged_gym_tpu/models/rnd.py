"""Random Network Distillation intrinsic rewards.

Reference: rsl_rl/rsl_rl/modules/rnd.py:16-197 — frozen target MLP + trained
predictor MLP; intrinsic reward ‖φ̂(s) − φ(s)‖ with weight schedules and
state/reward normalization."""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import struct

from .networks import MLP, RunningNorm


@struct.dataclass
class RNDState:
    target_params: dict
    predictor_params: dict
    state_norm: Optional[RunningNorm]
    reward_norm: Optional[RunningNorm]
    step: jnp.ndarray


class RandomNetworkDistillation:
    def __init__(self, num_states: int, num_outputs: int = 64,
                 hidden_dims: Sequence[int] = (256, 256),
                 weight: float = 1.0,
                 weight_schedule: Optional[dict] = None,
                 state_normalization: bool = True,
                 reward_normalization: bool = True):
        self.net = MLP(tuple(hidden_dims), num_outputs)
        self.num_states = num_states
        self.weight = weight
        self.weight_schedule = weight_schedule or {"mode": "constant"}
        self.state_normalization = state_normalization
        self.reward_normalization = reward_normalization

    def init(self, key) -> RNDState:
        k1, k2 = jax.random.split(key)
        dummy = jnp.zeros((1, self.num_states))
        return RNDState(
            target_params=self.net.init(k1, dummy),
            predictor_params=self.net.init(k2, dummy),
            state_norm=RunningNorm.create(self.num_states) if self.state_normalization else None,
            reward_norm=RunningNorm.create(1) if self.reward_normalization else None,
            step=jnp.zeros((), jnp.int32),
        )

    def _weight_at(self, step):
        """Weight schedules: constant / step / linear (ref rnd.py:183-196)."""
        ws = self.weight_schedule
        mode = ws.get("mode", "constant")
        w = jnp.asarray(self.weight, jnp.float32)
        if mode == "step":
            w = jnp.where(step >= ws["final_step"], ws["final_value"], w)
        elif mode == "linear":
            t = jnp.clip((step - ws["initial_step"]) /
                         max(ws["final_step"] - ws["initial_step"], 1), 0.0, 1.0)
            w = self.weight + t * (ws["final_value"] - self.weight)
        return w

    def intrinsic_reward(self, state: RNDState, rnd_obs: jnp.ndarray):
        """Per-env intrinsic reward; also updates normalizers."""
        x = rnd_obs
        if state.state_norm is not None:
            state = state.replace(state_norm=state.state_norm.update(x))
            x = state.state_norm.normalize(x)
        target = self.net.apply(state.target_params, x)
        pred = self.net.apply(state.predictor_params, x)
        rew = jnp.linalg.norm(target - pred, axis=-1)
        if state.reward_norm is not None:
            state = state.replace(reward_norm=state.reward_norm.update(rew[:, None]))
            rew = (state.reward_norm.normalize(rew[:, None]))[:, 0]
        rew = rew * self._weight_at(state.step)
        return rew, state.replace(step=state.step + 1)

    def predictor_loss(self, predictor_params, state: RNDState, rnd_obs: jnp.ndarray):
        """MSE toward the frozen target (ref ppo.py:372-379)."""
        x = rnd_obs
        if state.state_norm is not None:
            x = state.state_norm.normalize(x)
        target = jax.lax.stop_gradient(self.net.apply(state.target_params, x))
        pred = self.net.apply(predictor_params, x)
        return jnp.mean(jnp.square(pred - target))
