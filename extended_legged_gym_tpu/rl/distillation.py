"""Teacher→student behavior-cloning distillation.

Reference: rsl_rl/rsl_rl/algorithms/distillation.py:19-433 — the student acts
in the env, the frozen teacher provides target actions on privileged
observations (:89-96); the update walks the collected window sequentially
and takes one optimizer step every ``gradient_length`` transitions, with the
recurrent student's hidden state detached at each step boundary and reset on
dones (:107-153) — truncated BPTT over gradient_length-chunks.

TPU design: the [T, B] window is split into static chunks of
``gradient_length``; each chunk replays the student (a ``lax.scan`` carrying
the RNN state for the recurrent variant), takes one optimizer step, and
passes the chunk-final hidden state forward through ``stop_gradient`` — the
exact reference semantics, but each chunk is one fused jitted region instead
of a Python loop of per-step graphs."""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.student_teacher import StudentTeacher, StudentTeacherRecurrent


@struct.dataclass
class DistillationState:
    params: dict
    opt_state: tuple


class Distillation:
    def __init__(self, network, learning_rate: float = 1e-3,
                 num_learning_epochs: int = 1, gradient_length: int = 15,
                 max_grad_norm: float = 1.0, loss_type: str = "mse"):
        self.network = network
        self.recurrent = isinstance(network, StudentTeacherRecurrent)
        self.num_learning_epochs = num_learning_epochs
        self.gradient_length = gradient_length
        self.loss_type = loss_type
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(max_grad_norm),
            optax.adam(learning_rate))

    def init(self, key, student_obs_dim: int, teacher_obs_dim: int,
             batch_size: int = 1) -> DistillationState:
        if self.recurrent:
            carry = self.network.initialize_carry(key, (batch_size,))
            params = self.network.init(key, jnp.zeros((batch_size, student_obs_dim)),
                                       jnp.zeros((batch_size, teacher_obs_dim)), carry)
        else:
            params = self.network.init(key, jnp.zeros((1, student_obs_dim)),
                                       jnp.zeros((1, teacher_obs_dim)))
        return DistillationState(params=params, opt_state=self.optimizer.init(params))

    def initialize_carry(self, key, batch_dims):
        return self.network.initialize_carry(key, batch_dims) if self.recurrent else None

    # ------------------------------------------------------------------

    def act(self, state: DistillationState, student_obs, key=None, carry=None):
        """Student action for env stepping (exploration noise optional).
        Recurrent variants return (action, new_carry)."""
        if self.recurrent:
            mean, carry = self.network.apply(state.params, student_obs, carry,
                                             method=_act_student_carry)
        else:
            mean = self.network.apply(state.params, student_obs,
                                      method=self.network.act_student)
        if key is not None:
            std = jnp.exp(state.params["params"]["log_std"])
            mean = mean + std * jax.random.normal(key, mean.shape)
        return (mean, carry) if self.recurrent else mean

    def _elem_loss(self, pred, target):
        if self.loss_type == "mse":
            return jnp.mean(jnp.square(pred - target))
        return jnp.mean(jnp.abs(pred - target))

    # ------------------------------------------------------------------

    def update_on_actions(self, state: DistillationState,
                          student_obs: jnp.ndarray,
                          teacher_actions: jnp.ndarray,
                          dones: Optional[jnp.ndarray] = None,
                          carry0=None) -> Tuple[DistillationState, Dict]:
        """BC update on a [T, B, ...] window toward recorded teacher actions
        with gradient_length-truncated steps (reference
        distillation.py:107-153: ``if cnt % gradient_length == 0`` →
        optimizer step + hidden detach; reset hidden on dones)."""
        T = student_obs.shape[0]
        G = max(1, min(self.gradient_length, T))
        bounds = [(i, min(i + G, T)) for i in range(0, T, G)]
        if dones is None:
            dones = jnp.zeros(student_obs.shape[:2], dtype=jnp.float32)
        dones = dones.astype(jnp.float32)

        def chunk_loss(params, carry, s_chunk, t_chunk, d_chunk):
            if self.recurrent:
                def f(c, inp):
                    s, ta, d = inp
                    a, c = self.network.apply(params, s, c,
                                              method=_act_student_carry)
                    # hidden reset on done AFTER the transition (ref :142-143)
                    c = jax.tree.map(lambda h: h * (1.0 - d)[:, None], c)
                    return c, self._elem_loss(a, ta)
                carry, losses = jax.lax.scan(f, carry, (s_chunk, t_chunk, d_chunk))
                return losses.mean(), carry
            a = self.network.apply(params, s_chunk.reshape(-1, s_chunk.shape[-1]),
                                   method=self.network.act_student)
            return self._elem_loss(a, t_chunk.reshape(-1, t_chunk.shape[-1])), None

        def epoch(carry_in, _):
            params, opt_state = carry_in
            carry = carry0  # each epoch replays from the window-start hidden
            total = 0.0
            for lo, hi in bounds:
                (loss, carry), grads = jax.value_and_grad(
                    chunk_loss, has_aux=True)(params, carry,
                                              student_obs[lo:hi],
                                              teacher_actions[lo:hi],
                                              dones[lo:hi])
                updates, opt_state = self.optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                if carry is not None:
                    # detach between chunks: truncated BPTT (ref :138)
                    carry = jax.tree.map(jax.lax.stop_gradient, carry)
                total = total + loss
            return (params, opt_state), total / len(bounds)

        (params, opt_state), losses = jax.lax.scan(
            epoch, (state.params, state.opt_state), None,
            length=self.num_learning_epochs)
        return (DistillationState(params=params, opt_state=opt_state),
                dict(behavior_loss=losses.mean()))

    def update(self, state: DistillationState, student_obs: jnp.ndarray,
               teacher_obs: jnp.ndarray,
               dones: Optional[jnp.ndarray] = None,
               carry0=None) -> Tuple[DistillationState, Dict]:
        """BC update where targets come from the frozen teacher submodule on
        privileged observations (reference policy.evaluate, :92)."""
        targets = self.network.apply(
            state.params, teacher_obs.reshape(-1, teacher_obs.shape[-1]),
            method=self.network.evaluate_teacher)
        targets = jax.lax.stop_gradient(
            targets.reshape(teacher_obs.shape[:2] + (targets.shape[-1],)))
        return self.update_on_actions(state, student_obs, targets, dones, carry0)


def _act_student_carry(net: StudentTeacherRecurrent, student_obs, carry):
    h, carry = net.memory(student_obs, carry)
    return net.student(h), carry
