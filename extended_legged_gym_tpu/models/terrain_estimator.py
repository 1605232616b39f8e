"""Depth→raycast terrain estimator network.

Reference: rsl_rl/rsl_rl/modules/terrain_estimator.py:13-219 — CNN depth
encoder → concat proprioception → GRU memory → MLP decoder predicting the
raycast distance vector."""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .depth_backbone import make_depth_encoder
from .networks import MLP, rnn_carry


class TerrainEstimator(nn.Module):
    num_raycast: int
    proprio_dim: int
    depth_enc_dim: int = 64
    rnn_hidden: int = 128
    decoder_dims: Sequence[int] = (128, 128)
    activation: str = "elu"
    # depth encoder selection (models/depth_backbone.make_depth_encoder);
    # "stack" expects a [B, T, H, W] frame buffer instead of [B, H, W]
    encoder: str = "cnn"
    buffer_len: int = 2

    @nn.compact
    def __call__(self, depth, proprio, carry):
        """depth [B, H, W] ([B, T, H, W] for encoder="stack"), proprio
        [B, P], carry GRU state → (predicted raycast distances [B, R], carry)."""
        enc = make_depth_encoder(self.encoder, output_dim=self.depth_enc_dim,
                                 buffer_len=self.buffer_len,
                                 activation=self.activation)(depth)
        x = jnp.concatenate([enc, proprio], axis=-1)
        carry, h = nn.GRUCell(self.rnn_hidden)(carry, x)
        pred = MLP(tuple(self.decoder_dims), self.num_raycast, self.activation)(h)
        return pred, carry

    def initialize_carry(self, key, batch_dims: Tuple[int, ...]):
        return rnn_carry("gru", self.rnn_hidden, batch_dims)
