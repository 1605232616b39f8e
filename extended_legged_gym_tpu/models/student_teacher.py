"""Student-teacher policy pair for distillation.

Reference: rsl_rl/rsl_rl/modules/student_teacher.py (MLP pair, teacher loaded
from actor-critic checkpoints :111-147) and student_teacher_recurrent.py."""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .networks import MLP, Memory


class StudentTeacher(nn.Module):
    """Student MLP acting on (possibly partial/noisy) student observations;
    teacher MLP evaluated on privileged observations, frozen during training."""

    num_actions: int
    student_hidden_dims: Sequence[int] = (256, 256, 128)
    teacher_hidden_dims: Sequence[int] = (256, 256, 128)
    activation: str = "elu"
    init_noise_std: float = 0.1

    def setup(self):
        self.student = MLP(self.student_hidden_dims, self.num_actions, self.activation)
        self.teacher = MLP(self.teacher_hidden_dims, self.num_actions, self.activation)
        self.log_std = self.param(
            "log_std", lambda key, shape: jnp.full(shape, np.log(self.init_noise_std)),
            (self.num_actions,))

    def __call__(self, student_obs, teacher_obs):
        return self.student(student_obs), jax.lax.stop_gradient(self.teacher(teacher_obs))

    def act_student(self, student_obs):
        return self.student(student_obs)

    def evaluate_teacher(self, teacher_obs):
        return self.teacher(teacher_obs)


def load_teacher_from_actor_critic(st_params: dict, ac_params: dict) -> dict:
    """Copy a trained ActorCritic actor into the teacher slot
    (reference student_teacher.py:111-147 checkpoint surgery)."""
    import copy

    out = copy.deepcopy(jax.device_get(st_params))
    src = ac_params["params"]["actor"]
    out["params"]["teacher"] = jax.device_get(src)
    return out


class StudentTeacherRecurrent(nn.Module):
    """Recurrent student (LSTM/GRU) with MLP teacher
    (reference student_teacher_recurrent.py)."""

    num_actions: int
    student_hidden_dims: Sequence[int] = (256, 256, 128)
    teacher_hidden_dims: Sequence[int] = (256, 256, 128)
    activation: str = "elu"
    rnn_hidden_size: int = 256
    rnn_type: str = "lstm"
    init_noise_std: float = 0.1

    def setup(self):
        self.memory = Memory(self.rnn_hidden_size, self.rnn_type)
        self.student = MLP(self.student_hidden_dims, self.num_actions, self.activation)
        self.teacher = MLP(self.teacher_hidden_dims, self.num_actions, self.activation)
        self.log_std = self.param(
            "log_std", lambda key, shape: jnp.full(shape, np.log(self.init_noise_std)),
            (self.num_actions,))

    def __call__(self, student_obs, teacher_obs, carry):
        h, carry = self.memory(student_obs, carry)
        return self.student(h), jax.lax.stop_gradient(self.teacher(teacher_obs)), carry

    def evaluate_teacher(self, teacher_obs):
        return self.teacher(teacher_obs)

    def initialize_carry(self, key, batch_dims):
        # plain constructor (no submodule access: works on unbound modules)
        from .networks import rnn_carry

        return rnn_carry(self.rnn_type, self.rnn_hidden_size, batch_dims)
