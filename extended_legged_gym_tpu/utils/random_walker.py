"""Random-walker command generator.

Reference: legged_gym/legged_gym/utils/math_utils.py:217-298 ``RandomWalker``
— per-env positions track randomly resampled targets at bounded velocity;
used for smoothly wandering commands.  Functional: state is a pytree."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RandomWalkerState:
    current: jnp.ndarray     # [B, D]
    target: jnp.ndarray      # [B, D]
    timer: jnp.ndarray       # [B]
    key: jnp.ndarray


class RandomWalker:
    def __init__(self, bounds, num_envs: int, target_update_interval: float = 1.0,
                 max_track_vel: float = 0.5, distribution_type: str = "uniform"):
        self.bounds = jnp.asarray(bounds, jnp.float32)   # [2, D]
        self.num_envs = num_envs
        self.interval = target_update_interval
        self.max_vel = max_track_vel
        self.dist = distribution_type

    def _sample(self, key):
        B, D = self.num_envs, self.bounds.shape[1]
        if self.dist == "uniform":
            return jax.random.uniform(key, (B, D), minval=self.bounds[0],
                                      maxval=self.bounds[1])
        return self.bounds[0] + self.bounds[1] * jax.random.normal(key, (B, D))

    def init(self, key) -> RandomWalkerState:
        k1, k2, k3 = jax.random.split(key, 3)
        return RandomWalkerState(current=self._sample(k1), target=self._sample(k2),
                                 timer=jnp.full((self.num_envs,), self.interval),
                                 key=k3)

    def step(self, state: RandomWalkerState, dt: float) -> RandomWalkerState:
        key, k1 = jax.random.split(state.key)
        timer = state.timer - dt
        need = timer <= 0
        new_targets = self._sample(k1)
        target = jnp.where(need[:, None], new_targets, state.target)
        timer = jnp.where(need, self.interval, timer)

        direction = target - state.current
        dist = jnp.linalg.norm(direction, axis=-1, keepdims=True)
        speed = jnp.minimum(dist, self.max_vel)
        vel = direction * speed / (dist + 1e-6)
        current = state.current + vel * dt
        if self.dist == "uniform":
            current = jnp.clip(current, self.bounds[0], self.bounds[1])
        return RandomWalkerState(current=current, target=target, timer=timer, key=key)
