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


class StackDepthEncoder(nn.Module):
    """Frame-stack encoder (reference StackDepthEncoder,
    depth_backbone.py:227-252): each of the ``buffer_len`` frames runs
    through the shared CNN backbone to a 32-d latent, the [B, T, 32] stack is
    mixed by a Conv1d treating frames as channels over the latent axis
    ((32−4)/2+1=15 → 15−2+1=14 taps × 16 channels), then an MLP head maps to
    the output latent.  (The reference also defines a combination_mlp that
    its forward never calls — not reproduced.)"""

    output_dim: int = 32
    buffer_len: int = 2
    activation: str = "elu"

    @nn.compact
    def __call__(self, depth_stack):
        act = get_activation(self.activation)
        B, T = depth_stack.shape[0], depth_stack.shape[1]
        frames = depth_stack.reshape((B * T,) + depth_stack.shape[2:])
        lat = DepthOnlyFCBackbone(output_dim=32, activation=self.activation)(frames)
        lat = lat.reshape(B, T, 32)
        # torch Conv1d(in_channels=T) over latent length ⇒ flax NWC layout
        x = jnp.swapaxes(lat, 1, 2)                       # [B, 32, T]
        x = act(nn.Conv(16, (4,), strides=(2,), padding="VALID")(x))
        x = act(nn.Conv(16, (2,), strides=(1,), padding="VALID")(x))
        x = x.reshape(B, -1)
        return act(nn.Dense(self.output_dim)(x))


def make_depth_encoder(name: str, output_dim: int = 32, buffer_len: int = 2,
                       activation: str = "elu") -> nn.Module:
    """Encoder selection by cfg.depth.encoder (the reference picks its
    backbone class ad hoc per training script)."""
    if name == "mlp":
        return DepthMLPEnc(output_dim=output_dim, activation=activation)
    if name == "hist_mlp":
        return DepthHistMLPEnc(output_dim=output_dim, activation=activation)
    if name == "cnn":
        return DepthOnlyFCBackbone(output_dim=output_dim, activation=activation)
    if name == "stack":
        return StackDepthEncoder(output_dim=output_dim, buffer_len=buffer_len,
                                 activation=activation)
    raise ValueError(f"unknown depth encoder {name!r}")


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
