"""ANYdrive actuator network (LSTM series-elastic-actuator model).

Reference: the TorchScript ``anydrive_v3_lstm.pt`` consumed at
legged_gym/legged_gym/envs/anymal_c/anymal.py:54-105 — per joint, an LSTM maps
(position error, joint velocity) → torque, with hidden state carried per env
and reset on env reset (:78-91).

Weights are extracted once from the TorchScript checkpoint into JSON
(``extract_weights``); inference is a hand-rolled LSTM cell matching torch's
gate layout (i, f, g, o), vmapped over envs × joints.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def extract_weights(torchscript_path: str) -> Dict[str, np.ndarray]:
    """Pull LSTM + linear weights and the in/out scaling buffers out of the
    TorchScript module (host-side, torch CPU).  The scripted forward is
    ``out_scale * linear(lstm(in_scale * x))`` with in_scale = (2.0, 0.25)
    and out_scale = 20 for anydrive_v3."""
    import torch

    m = torch.jit.load(torchscript_path, map_location="cpu")
    out = {}
    for name, p in m.named_parameters():
        out[name] = p.detach().numpy()
    for name, b in m.named_buffers():
        out[name] = b.detach().numpy().reshape(-1)
    return out


def save_weights_json(weights: Dict[str, np.ndarray], path: str):
    with open(path, "w") as f:
        json.dump({k: v.tolist() for k, v in weights.items()}, f)


def load_weights_json(path: str) -> Dict[str, jnp.ndarray]:
    with open(path) as f:
        d = json.load(f)
    return {k: jnp.asarray(np.array(v, dtype=np.float32)) for k, v in d.items()}


class ActuatorNetLSTM:
    """Stateless apply over explicit hidden state.

    hidden layout: (h, c) each [..., num_layers, hidden]; inputs
    [..., 2] = (pos_error, velocity); output torque [...]."""

    def __init__(self, weights: Dict[str, jnp.ndarray]):
        self.w = weights
        self.num_layers = 1 + max(
            int(k.split("_l")[-1]) for k in weights if k.startswith("lstm.weight_ih"))
        self.hidden = weights["lstm.weight_hh_l0"].shape[1]

    @classmethod
    def from_json(cls, path: str) -> "ActuatorNetLSTM":
        return cls(load_weights_json(path))

    def init_hidden(self, batch_shape: Tuple[int, ...]):
        shape = tuple(batch_shape) + (self.num_layers, self.hidden)
        return jnp.zeros(shape), jnp.zeros(shape)

    def __call__(self, x: jnp.ndarray, hidden):
        """x [..., 2] → (torque [...], new_hidden).  Torch LSTM gate order
        (i, f, g, o)."""
        h_all, c_all = hidden
        new_h, new_c = [], []
        inp = x * self.w.get("in_scale", jnp.ones(2))
        for l in range(self.num_layers):
            w_ih = self.w[f"lstm.weight_ih_l{l}"]
            w_hh = self.w[f"lstm.weight_hh_l{l}"]
            b = self.w[f"lstm.bias_ih_l{l}"] + self.w[f"lstm.bias_hh_l{l}"]
            h = h_all[..., l, :]
            c = c_all[..., l, :]
            gates = inp @ w_ih.T + h @ w_hh.T + b
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            new_h.append(h)
            new_c.append(c)
            inp = h
        torque = inp @ self.w["linear.weight"].T + self.w["linear.bias"]
        torque = torque * self.w.get("out_scale", jnp.ones(1))
        return torque[..., 0], (jnp.stack(new_h, axis=-2), jnp.stack(new_c, axis=-2))
