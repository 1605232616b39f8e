"""Supervised terrain-estimator training.

Reference: rsl_rl/rsl_rl/runners/terrain_estimator_runner.py:22-732 — collect
(depth image, proprioception, raycast ground truth) tuples while stepping the
env with random or pretrained-policy actions (:247-440), regress the
estimator with MSE/Huber/L1 (:362-480), and provide a play/eval path (:637).
"""
from __future__ import annotations

import os
import pickle
import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..envs.legged_robot import LeggedRobot
from ..models.terrain_estimator import TerrainEstimator
from ..perception.depth_camera import DepthCameraRaycast
from ..perception.raycast import RayCaster
from ..utils.metrics import MetricsWriter


class TerrainEstimatorRunner:
    def __init__(self, env: LeggedRobot, log_dir: Optional[str] = None,
                 learning_rate: float = 1e-3, loss_type: str = "mse",
                 num_steps_per_env: int = 24, seed: int = 0,
                 policy: Optional[Callable] = None):
        """``policy``: optional pretrained action fn obs→actions; defaults to
        random actions (reference :400-440 action-source switch)."""
        assert env.cfg.raycaster.enable_raycast, (
            "terrain-estimator training needs raycast ground truth "
            "(cfg.raycaster.enable_raycast)")
        self.env = env
        self.log_dir = log_dir
        self.writer = MetricsWriter(log_dir) if log_dir else None
        self.loss_type = loss_type
        self.num_steps_per_env = num_steps_per_env
        self.policy = policy

        self.camera = DepthCameraRaycast(env.cfg.depth, env.num_envs, env.terrain)
        self.raycaster = RayCaster(env.cfg.raycaster, env.terrain)

        proprio_dim = 9  # base lin/ang vel + projected gravity
        # depth-encoder selection (cfg.depth.encoder; "stack"/"hist_mlp"
        # consume the buffer_len frame stack — reference StackDepthEncoder)
        self.encoder_name = getattr(env.cfg.depth, "encoder", "cnn")
        self.buffered = self.encoder_name in ("stack", "hist_mlp")
        T = int(env.cfg.depth.buffer_len)
        self.network = TerrainEstimator(
            num_raycast=self.raycaster.num_rays, proprio_dim=proprio_dim,
            encoder=self.encoder_name, buffer_len=T)
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        H, W = env.cfg.depth.resized[1], env.cfg.depth.resized[0]
        self.depth_buf0 = (jnp.zeros((env.num_envs, T, H, W))
                           if self.buffered else None)
        depth0 = (self.depth_buf0 if self.buffered
                  else jnp.zeros((env.num_envs, H, W)))
        carry0 = self.network.initialize_carry(k1, (env.num_envs,))
        params = self.network.init(
            k2, depth0, jnp.zeros((env.num_envs, proprio_dim)),
            carry0)
        self.params = params
        self.carry0 = carry0
        self.optimizer = optax.adam(learning_rate)
        self.opt_state = self.optimizer.init(params)
        self.key = key

        self._iter = jax.jit(self._iteration)

    # ------------------------------------------------------------------

    def _proprio(self, state):
        return jnp.concatenate(
            [state.base_lin_vel, state.base_ang_vel, state.projected_gravity], axis=-1)

    def _collect_and_update(self, params, opt_state, env_state, carry, key):
        env = self.env

        def collect(carry_in, k):
            es, rnn, buf = carry_in
            frame = self.camera.render(es.phys.base_pos, es.phys.base_quat)
            if self.buffered:
                buf = jnp.concatenate([buf[:, 1:], frame[:, None]], axis=1)
                depth = buf
            else:
                depth = frame
            proprio = self._proprio(es)
            gt = self.raycaster.cast(es.phys.base_pos, es.phys.base_quat).distance
            if self.policy is not None:
                actions = self.policy(es.obs)
            else:
                actions = 0.3 * jax.random.normal(k, (env.num_envs, env.num_actions))
            es = env.step(es, actions)
            return (es, rnn, buf), (depth, proprio, gt, es.reset_buf)

        keys = jax.random.split(key, self.num_steps_per_env)
        (env_state, _, _), (depths, proprios, gts, dones) = jax.lax.scan(
            collect, (env_state, carry, self.depth_buf0), keys)

        def loss_fn(p):
            def step_fn(rnn, inp):
                depth, proprio, gt, done = inp
                pred, rnn = self.network.apply(p, depth, proprio, rnn)
                # reset hidden state on done (reference memory reset semantics)
                rnn = jax.tree.map(
                    lambda h: jnp.where(done[:, None], jnp.zeros_like(h), h), rnn)
                if self.loss_type == "huber":
                    err = optax.huber_loss(pred, gt).mean()
                elif self.loss_type == "l1":
                    err = jnp.abs(pred - gt).mean()
                else:
                    err = jnp.square(pred - gt).mean()
                return rnn, err

            _, errs = jax.lax.scan(step_fn, carry, (depths, proprios, gts, dones))
            return errs.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, env_state, loss

    def _iteration(self, params, opt_state, env_state, carry, key):
        return self._collect_and_update(params, opt_state, env_state, carry, key)

    # ------------------------------------------------------------------

    def learn(self, num_iterations: int, log_interval: int = 10) -> Dict[str, float]:
        env_state = self.env.reset_all(self.key)
        carry = self.carry0
        last = {}
        for it in range(num_iterations):
            self.key, k = jax.random.split(self.key)
            t0 = time.time()
            self.params, self.opt_state, env_state, loss = self._iter(
                self.params, self.opt_state, env_state, carry, k)
            jax.block_until_ready(loss)
            last = dict(loss=float(loss), iter_time=time.time() - t0)
            if self.writer:
                self.writer.write(it, last)
            if it % log_interval == 0:
                print(f"terrain-est it {it}: loss {last['loss']:.5f}", flush=True)
        return last

    def save(self, path: str):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(dict(params=jax.device_get(self.params)), f)

    def load(self, path: str):
        with open(path, "rb") as f:
            self.params = pickle.load(f)["params"]

    def get_estimator(self):
        params = self.params

        @jax.jit
        def estimate(depth, proprio, carry):
            return self.network.apply(params, depth, proprio, carry)

        return estimate

    # ------------------------------------------------------------------
    # play / eval (reference terrain_estimator_runner.py:637-732)
    # ------------------------------------------------------------------

    def play(self, num_steps: int = 200, log_interval: int = 100
             ) -> Dict[str, float]:
        """Inference loop: step the env (pretrained policy or random actions),
        predict raycast distances from depth+proprio, and score against the
        raycast ground truth — the reference's play mode (:637-720) minus the
        on-screen viewer (headless: predicted-point clouds go to the returned
        trace / plot logger instead)."""
        env = self.env
        estimate = self.get_estimator()
        env_state = env.reset_all(self.key)
        carry = self.carry0
        step = jax.jit(env.step)
        mses, maes = [], []
        buf = self.depth_buf0
        for it in range(num_steps):
            self.key, k = jax.random.split(self.key)
            frame = self.camera.render(env_state.phys.base_pos,
                                       env_state.phys.base_quat)
            if self.buffered:
                buf = jnp.concatenate([buf[:, 1:], frame[:, None]], axis=1)
                depth = buf
            else:
                depth = frame
            proprio = self._proprio(env_state)
            gt = self.raycaster.cast(env_state.phys.base_pos,
                                     env_state.phys.base_quat).distance
            pred, carry = estimate(depth, proprio, carry)
            mse = float(jnp.mean(jnp.square(pred - gt)))
            mae = float(jnp.mean(jnp.abs(pred - gt)))
            mses.append(mse)
            maes.append(mae)
            if it % log_interval == 0:
                print(f"terrain-est play step {it}: MSE={mse:.4f} MAE={mae:.4f}",
                      flush=True)
            if self.policy is not None:
                actions = self.policy(env_state.obs)
            else:
                actions = 0.3 * jax.random.normal(
                    k, (env.num_envs, env.num_actions))
            env_state = step(env_state, actions)
            carry = jax.tree.map(
                lambda h: jnp.where(env_state.reset_buf[:, None],
                                    jnp.zeros_like(h), h), carry)
        stats = dict(mse=float(np.mean(mses)), mae=float(np.mean(maes)),
                     mse_last=mses[-1], mae_last=maes[-1])
        if self.writer:
            self.writer.write(0, {f"play_{k}": v for k, v in stats.items()})
        return stats

    def predictions_to_points(self, distances: jnp.ndarray, base_pos: jnp.ndarray,
                              base_quat: jnp.ndarray) -> jnp.ndarray:
        """Predicted raycast distances → 3D world points along the sensor's
        ray pattern (reference _convert_raycast_distances_to_points :279-333),
        for visualization/export."""
        from ..utils.math import quat_rotate, yaw_quat

        rc = self.raycaster
        q = yaw_quat(base_quat) if rc.cfg.attach_yaw_only else base_quat
        origins = base_pos[:, None, :] + quat_rotate(
            q[:, None, :], jnp.asarray(rc.ray_starts + rc.offset)[None, :, :])
        dirs = quat_rotate(q[:, None, :], jnp.asarray(rc.ray_dirs)[None, :, :])
        return origins + distances[..., None] * dirs
