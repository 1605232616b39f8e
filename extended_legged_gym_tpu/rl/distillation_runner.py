"""Teacher→student distillation training driver.

Reference: rsl_rl runs Distillation through the same OnPolicyRunner
(algorithm_class_name="Distillation", on_policy_runner.py:161-215 sets up
teacher/student observation groups; distillation.py:89-96 queries the teacher
on privileged observations while the student acts; :107-153 updates with
gradient_length-truncated BPTT and carries the recurrent student's hidden
state across windows via last_hidden_states).

This runner collects trajectories by letting the STUDENT act (with optional
exploration noise, recurrent hidden state carried and reset on dones),
queries the frozen teacher on the privileged/critic observations, and
behavior-clones per iteration — all in one jitted step.
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..envs.legged_robot import LeggedRobot
from ..models.student_teacher import StudentTeacher, StudentTeacherRecurrent
from ..utils.metrics import MetricsWriter
from .distillation import Distillation, DistillationState


class DistillationRunner:
    def __init__(self, env: LeggedRobot, teacher_policy: Callable,
                 student_hidden_dims=(256, 256, 128),
                 learning_rate: float = 1e-3,
                 num_steps_per_env: int = 24,
                 num_learning_epochs: int = 2,
                 gradient_length: int = 15,
                 exploration_std: float = 0.05,
                 recurrent: bool = False,
                 rnn_type: str = "lstm",
                 rnn_hidden_size: int = 256,
                 log_dir: Optional[str] = None, seed: int = 0):
        """``teacher_policy``: frozen fn (teacher_obs → actions); e.g. from
        rl.torch_compat.load_reference_policy or a trained runner's
        get_inference_policy.  ``recurrent=True`` selects the LSTM/GRU
        student (reference student_teacher_recurrent.py)."""
        self.env = env
        self.teacher_policy = teacher_policy
        self.writer = MetricsWriter(log_dir) if log_dir else None
        self.num_steps_per_env = num_steps_per_env
        self.exploration_std = exploration_std
        self.recurrent = recurrent

        teacher_obs_dim = env.num_privileged_obs or env.num_obs
        if recurrent:
            self.network = StudentTeacherRecurrent(
                num_actions=env.num_actions,
                student_hidden_dims=tuple(student_hidden_dims),
                rnn_type=rnn_type, rnn_hidden_size=rnn_hidden_size)
        else:
            self.network = StudentTeacher(
                num_actions=env.num_actions,
                student_hidden_dims=tuple(student_hidden_dims))
        self.alg = Distillation(self.network, learning_rate=learning_rate,
                                num_learning_epochs=num_learning_epochs,
                                gradient_length=gradient_length)
        key = jax.random.PRNGKey(seed)
        key, k_init, k_env = jax.random.split(key, 3)
        self.alg_state = self.alg.init(k_init, env.num_obs, teacher_obs_dim,
                                       batch_size=env.num_envs)
        self.env_state = env.reset_all(k_env)
        # window-carried hidden state (reference last_hidden_states, :148)
        self.carry = self.alg.initialize_carry(k_init, (env.num_envs,))
        self.key = key
        self._iter = jax.jit(self._iteration)

    def _teacher_obs(self, es):
        return es.privileged_obs if es.privileged_obs is not None else es.obs

    def _iteration(self, alg_state: DistillationState, env_state, carry0, key):
        def collect(cs, k):
            es, carry = cs
            s_obs = es.obs
            t_obs = self._teacher_obs(es)
            if self.recurrent:
                actions, carry = self.alg.act(alg_state, s_obs, carry=carry)
            else:
                actions = self.alg.act(alg_state, s_obs)
            if self.exploration_std:
                actions = actions + self.exploration_std * jax.random.normal(
                    k, actions.shape)
            es = self.env.step(es, actions)
            if self.recurrent:
                d = es.reset_buf.astype(jnp.float32)[:, None]
                carry = jax.tree.map(lambda h: h * (1.0 - d), carry)
            teacher_actions = self.teacher_policy(t_obs)
            return (es, carry), (s_obs, teacher_actions,
                                 es.reset_buf.astype(jnp.float32))

        keys = jax.random.split(key, self.num_steps_per_env)
        (env_state, carry), (s_obs, t_act, dones) = jax.lax.scan(
            collect, (env_state, carry0), keys)

        alg_state, losses = self.alg.update_on_actions(
            alg_state, s_obs, t_act, dones=dones, carry0=carry0)
        em = env_state.episode_metrics
        metrics = dict(losses,
                       mean_reward=em["return_sum"] / jnp.maximum(em["count"], 1))
        return alg_state, env_state, carry, metrics

    def learn(self, num_iterations: int, log_interval: int = 10) -> Dict[str, float]:
        last = {}
        for it in range(num_iterations):
            self.key, k = jax.random.split(self.key)
            env_state = self.env_state.replace(
                episode_metrics=self.env.zero_episode_metrics())
            self.alg_state, self.env_state, self.carry, metrics = self._iter(
                self.alg_state, env_state, self.carry, k)
            jax.block_until_ready(self.alg_state.params)
            last = {k2: float(v) for k2, v in metrics.items()}
            if self.writer:
                self.writer.write(it, last)
            if it % log_interval == 0:
                print(f"distill it {it}: bc_loss {last['behavior_loss']:.5f}", flush=True)
        return last

    def get_student_policy(self):
        params = self.alg_state.params
        if self.recurrent:
            net = self.network

            @jax.jit
            def policy(obs, carry):
                from .distillation import _act_student_carry

                return net.apply(params, obs, carry, method=_act_student_carry)

            return policy

        @jax.jit
        def policy(obs):
            return self.network.apply(params, obs, method=self.network.act_student)

        return policy
