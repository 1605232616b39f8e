"""Teacher→student behavior-cloning distillation.

Reference: rsl_rl/rsl_rl/algorithms/distillation.py:19-433 — the student acts
in the env, the frozen teacher provides target actions on privileged
observations (:89-96); updates run over collected trajectories with a
truncated-BPTT-style gradient window (:107-153).  Here collection + update
are one jitted function, mirroring the PPO runner structure."""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.student_teacher import StudentTeacher


@struct.dataclass
class DistillationState:
    params: dict
    opt_state: tuple


class Distillation:
    def __init__(self, network: StudentTeacher, learning_rate: float = 1e-3,
                 num_learning_epochs: int = 1, gradient_length: int = 15,
                 max_grad_norm: float = 1.0, loss_type: str = "mse"):
        self.network = network
        self.num_learning_epochs = num_learning_epochs
        self.gradient_length = gradient_length
        self.loss_type = loss_type
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(max_grad_norm),
            optax.adam(learning_rate))

    def init(self, key, student_obs_dim: int, teacher_obs_dim: int) -> DistillationState:
        params = self.network.init(key, jnp.zeros((1, student_obs_dim)),
                                   jnp.zeros((1, teacher_obs_dim)))
        return DistillationState(params=params, opt_state=self.optimizer.init(params))

    def act(self, state: DistillationState, student_obs, key=None):
        """Student action for env stepping (exploration noise optional)."""
        mean = self.network.apply(state.params, student_obs,
                                  method=self.network.act_student)
        if key is not None:
            std = jnp.exp(state.params["params"]["log_std"])
            mean = mean + std * jax.random.normal(key, mean.shape)
        return mean

    def update(self, state: DistillationState, student_obs: jnp.ndarray,
               teacher_obs: jnp.ndarray) -> Tuple[DistillationState, Dict]:
        """BC update on a [T, B, ...] batch: student(obs) → teacher target
        (reference distillation.py:107-153)."""

        def loss_fn(params):
            s = student_obs.reshape(-1, student_obs.shape[-1])
            t = teacher_obs.reshape(-1, teacher_obs.shape[-1])
            student_act, teacher_act = self.network.apply(params, s, t)
            if self.loss_type == "mse":
                return jnp.mean(jnp.square(student_act - teacher_act))
            return jnp.mean(jnp.abs(student_act - teacher_act))

        def epoch(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            epoch, (state.params, state.opt_state), None,
            length=self.num_learning_epochs)
        return (DistillationState(params=params, opt_state=opt_state),
                dict(behavior_loss=losses.mean()))
