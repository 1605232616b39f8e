"""Depth-image encoders for perception-conditioned policies.

Reference: rsl_rl/rsl_rl/modules/depth_backbone.py — DepthMLPEnc,
DepthHistMLPEnc (frame stacking), RecurrentDepthBackbone (GRU),
StackDepthEncoder, DepthOnlyFCBackbone58x87 CNN."""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .networks import MLP, get_activation, rnn_carry


class DepthMLPEnc(nn.Module):
    """Flatten-then-MLP depth encoder."""

    output_dim: int = 32
    hidden_dims: Sequence[int] = (256, 128)
    activation: str = "elu"

    @nn.compact
    def __call__(self, depth):
        x = depth.reshape(depth.shape[0], -1)
        return MLP(tuple(self.hidden_dims), self.output_dim, self.activation)(x)


class DepthHistMLPEnc(nn.Module):
    """Frame-stacked depth history encoder (buffer_len frames)."""

    output_dim: int = 32
    hidden_dims: Sequence[int] = (512, 256)
    activation: str = "elu"

    @nn.compact
    def __call__(self, depth_hist):
        # [B, T, H, W] → flatten all
        x = depth_hist.reshape(depth_hist.shape[0], -1)
        return MLP(tuple(self.hidden_dims), self.output_dim, self.activation)(x)


class DepthOnlyFCBackbone(nn.Module):
    """Small CNN depth backbone (reference DepthOnlyFCBackbone58x87, adapted
    to arbitrary input sizes)."""

    output_dim: int = 32
    activation: str = "elu"

    @nn.compact
    def __call__(self, depth):
        act = get_activation(self.activation)
        x = depth[..., None]  # [B, H, W, 1]
        x = act(nn.Conv(16, (5, 5), strides=(2, 2))(x))
        x = act(nn.Conv(32, (3, 3), strides=(2, 2))(x))
        x = act(nn.Conv(32, (3, 3), strides=(1, 1))(x))
        x = x.reshape(x.shape[0], -1)
        x = act(nn.Dense(128)(x))
        return nn.Dense(self.output_dim)(x)


class RecurrentDepthBackbone(nn.Module):
    """CNN/MLP encoder + GRU over time; carry managed by the caller
    (reference RecurrentDepthBackbone)."""

    output_dim: int = 32
    hidden_size: int = 128
    activation: str = "elu"

    @nn.compact
    def __call__(self, depth, proprio, carry):
        enc = DepthOnlyFCBackbone(output_dim=64, activation=self.activation)(depth)
        x = jnp.concatenate([enc, proprio], axis=-1)
        carry, out = nn.GRUCell(self.hidden_size)(carry, x)
        out = nn.Dense(self.output_dim)(out)
        return out, carry

    def initialize_carry(self, key, batch_dims: Tuple[int, ...]):
        return rnn_carry("gru", self.hidden_size, batch_dims)
