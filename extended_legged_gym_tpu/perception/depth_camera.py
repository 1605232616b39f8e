"""Depth cameras.

TPU-native replacement for the reference's three-backend depth camera stack
(reference: legged_gym/legged_gym/utils/depth_camera.py — ``DepthCameraBase``
normalize/crop/resize/noise pipeline :56-139, ``DepthCameraFake`` :186,
``DepthCameraWarp`` :256-570 pinhole ray grid + batched raycast).  The Warp
backend maps to the heightfield ray-marcher; the Isaac Gym native-camera
backend has no TPU analog (the raycast camera is the parity path the
reference itself prefers for batch rollout).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..terrain.heightfield import TerrainData
from ..utils.math import quat_mul, quat_rotate, ypr_to_quat
from .raycast import raycast


def pinhole_ray_grid(width: int, height: int, horizontal_fov_deg: float) -> np.ndarray:
    """Camera-frame ray directions for a W×H pinhole camera
    (reference depth_camera.py:328-378): +x forward, +y left, +z up."""
    hfov = np.deg2rad(horizontal_fov_deg)
    fx = (width / 2) / np.tan(hfov / 2)
    us = np.arange(width) - (width - 1) / 2
    vs = np.arange(height) - (height - 1) / 2
    uu, vv = np.meshgrid(us, vs, indexing="xy")
    dirs = np.stack([np.ones_like(uu) * fx, -uu, -vv], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return dirs.astype(np.float32)  # [H, W, 3]


class DepthCameraBase:
    """Shared processing pipeline: clip → normalize/invert → resize → noise,
    with a ring buffer of the last ``buffer_len`` frames
    (reference depth_camera.py:56-139)."""

    def __init__(self, cfg, num_envs: int):
        self.cfg = cfg
        self.num_envs = num_envs
        self.W0, self.H0 = cfg.original
        self.W1, self.H1 = cfg.resized

    def init_buffer(self) -> jnp.ndarray:
        return jnp.zeros((self.num_envs, self.cfg.buffer_len, self.H1, self.W1))

    def process(self, depth: jnp.ndarray, key: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.cfg
        d = jnp.clip(depth, cfg.near_clip, cfg.far_clip)
        if key is not None and cfg.dis_noise > 0:
            d = d + cfg.dis_noise * jax.random.normal(key, d.shape)
            d = jnp.clip(d, cfg.near_clip, cfg.far_clip)
        # resize (area-style average pooling via interpolation)
        d = jax.image.resize(d, d.shape[:-2] + (self.H1, self.W1), method="linear")
        # normalize to [0, 1]; optionally invert (near = 1)
        d = (d - cfg.near_clip) / (cfg.far_clip - cfg.near_clip)
        if cfg.invert:
            d = 1.0 - d
        return d * cfg.scale

    def push(self, buffer: jnp.ndarray, frame: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate([buffer[:, 1:], frame[:, None]], axis=1)


class DepthCameraFake(DepthCameraBase):
    """Zeros backend (reference depth_camera.py:186) — fault-free stand-in."""

    def render(self, base_pos, base_quat, key=None) -> jnp.ndarray:
        return jnp.zeros((base_pos.shape[0], self.H1, self.W1))


class DepthCameraRaycast(DepthCameraBase):
    """Raycast backend against the terrain heightfield (the reference's
    DepthCameraWarp :256-570: camera pose = base pose ∘ mount offset/pitch)."""

    def __init__(self, cfg, num_envs: int, terrain: TerrainData):
        super().__init__(cfg, num_envs)
        self.terrain = terrain
        dirs = pinhole_ray_grid(self.W0, self.H0, cfg.horizontal_fov)
        self.ray_dirs = jnp.asarray(dirs.reshape(-1, 3))
        self.mount_pos = jnp.asarray(np.array(cfg.position, dtype=np.float32))
        pitch = float(np.deg2rad(np.mean(cfg.angle)))
        self.mount_quat = ypr_to_quat(jnp.asarray(0.0), jnp.asarray(pitch), jnp.asarray(0.0))

    def render(self, base_pos: jnp.ndarray, base_quat: jnp.ndarray,
               key=None) -> jnp.ndarray:
        """[B,3],[B,4] → processed depth [B, H1, W1]."""
        cam_pos = base_pos + quat_rotate(base_quat, jnp.broadcast_to(
            self.mount_pos, base_pos.shape))
        cam_quat = quat_mul(base_quat, jnp.broadcast_to(self.mount_quat, base_quat.shape))
        origins = jnp.broadcast_to(cam_pos[:, None, :],
                                   (base_pos.shape[0], self.ray_dirs.shape[0], 3))
        dirs = quat_rotate(cam_quat[:, None, :], self.ray_dirs[None, :, :])
        res = raycast(self.terrain, origins, dirs, self.cfg.far_clip)
        depth = res.distance.reshape(base_pos.shape[0], self.H0, self.W0)
        return self.process(depth, key)


def make_depth_camera(cfg, num_envs: int, terrain: TerrainData):
    if cfg.camera_type in ("Warp", "Raycast"):
        return DepthCameraRaycast(cfg, num_envs, terrain)
    if cfg.camera_type == "Fake":
        return DepthCameraFake(cfg, num_envs)
    return None
