"""Teacher→student distillation training driver.

Reference: rsl_rl runs Distillation through the same OnPolicyRunner
(algorithm_class_name="Distillation", on_policy_runner.py:161-215 sets up
teacher/student observation groups; distillation.py:89-96 queries the teacher
on privileged observations while the student acts).

This runner collects trajectories by letting the STUDENT act (with optional
exploration noise), queries the frozen teacher on the privileged/critic
observations, and behavior-clones per iteration — all in one jitted step.
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..envs.legged_robot import LeggedRobot
from ..models.student_teacher import StudentTeacher
from ..utils.metrics import MetricsWriter
from .distillation import Distillation, DistillationState


class DistillationRunner:
    def __init__(self, env: LeggedRobot, teacher_policy: Callable,
                 student_hidden_dims=(256, 256, 128),
                 learning_rate: float = 1e-3,
                 num_steps_per_env: int = 24,
                 num_learning_epochs: int = 2,
                 exploration_std: float = 0.05,
                 log_dir: Optional[str] = None, seed: int = 0):
        """``teacher_policy``: frozen fn (teacher_obs → actions); e.g. from
        rl.torch_compat.load_reference_policy or a trained runner's
        get_inference_policy."""
        self.env = env
        self.teacher_policy = teacher_policy
        self.writer = MetricsWriter(log_dir) if log_dir else None
        self.num_steps_per_env = num_steps_per_env
        self.exploration_std = exploration_std

        teacher_obs_dim = env.num_privileged_obs or env.num_obs
        self.network = StudentTeacher(
            num_actions=env.num_actions,
            student_hidden_dims=tuple(student_hidden_dims))
        self.alg = Distillation(self.network, learning_rate=learning_rate,
                                num_learning_epochs=num_learning_epochs)
        key = jax.random.PRNGKey(seed)
        key, k_init, k_env = jax.random.split(key, 3)
        self.alg_state = self.alg.init(k_init, env.num_obs, teacher_obs_dim)
        self.env_state = env.reset_all(k_env)
        self.key = key
        self._iter = jax.jit(self._iteration)

    def _teacher_obs(self, es):
        return es.privileged_obs if es.privileged_obs is not None else es.obs

    def _iteration(self, alg_state: DistillationState, env_state, key):
        def collect(es, k):
            s_obs = es.obs
            t_obs = self._teacher_obs(es)
            actions = self.alg.act(alg_state, s_obs)
            if self.exploration_std:
                actions = actions + self.exploration_std * jax.random.normal(
                    k, actions.shape)
            es = self.env.step(es, actions)
            teacher_actions = self.teacher_policy(t_obs)
            return es, (s_obs, teacher_actions)

        keys = jax.random.split(key, self.num_steps_per_env)
        env_state, (s_obs, t_act) = jax.lax.scan(collect, env_state, keys)

        # BC toward recorded teacher actions: bypass the teacher submodule by
        # regressing the student directly on (obs, teacher action) pairs
        import optax

        def loss_fn(params):
            pred = self.network.apply(params, s_obs.reshape(-1, s_obs.shape[-1]),
                                      method=self.network.act_student)
            return jnp.mean(jnp.square(pred - t_act.reshape(-1, t_act.shape[-1])))

        def epoch(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.alg.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            epoch, (alg_state.params, alg_state.opt_state), None,
            length=self.alg.num_learning_epochs)
        em = env_state.episode_metrics
        metrics = dict(behavior_loss=losses.mean(),
                       mean_reward=em["return_sum"] / jnp.maximum(em["count"], 1))
        return DistillationState(params=params, opt_state=opt_state), env_state, metrics

    def learn(self, num_iterations: int, log_interval: int = 10) -> Dict[str, float]:
        last = {}
        for it in range(num_iterations):
            self.key, k = jax.random.split(self.key)
            env_state = self.env_state.replace(
                episode_metrics=self.env.zero_episode_metrics())
            self.alg_state, self.env_state, metrics = self._iter(
                self.alg_state, env_state, k)
            jax.block_until_ready(self.alg_state.params)
            last = {k2: float(v) for k2, v in metrics.items()}
            if self.writer:
                self.writer.write(it, last)
            if it % log_interval == 0:
                print(f"distill it {it}: bc_loss {last['behavior_loss']:.5f}", flush=True)
        return last

    def get_student_policy(self):
        params = self.alg_state.params

        @jax.jit
        def policy(obs):
            return self.network.apply(params, obs, method=self.network.act_student)

        return policy
