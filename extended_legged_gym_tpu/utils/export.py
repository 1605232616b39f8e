"""Deployment export: trained flax policies → robot-loadable artifacts.

The reference deploys policies as TorchScript JIT modules — MLP and LSTM
exporters at legged_gym/utils/helpers.py:302-341 (``export_policy_as_jit``,
``PolicyExporterLSTM`` carrying hidden state inside the scripted module),
driven from play.py's EXPORT_POLICY flag and the runner's
``get_inference_policy`` (on_policy_runner.py:717-727).

This framework exports BOTH:

* **TorchScript** (``export_policy_as_jit``) — byte-compatible with the
  reference's deployment path: an onboard computer that today loads the
  reference's ``policy_1.pt`` can load ours unchanged.  Flax parameters are
  transposed into torch modules host-side (torch is CPU-only here, which is
  all deployment needs).  MLP, LSTM and GRU policies supported; the optional
  observation normalizer is folded in as a first layer so the artifact is
  self-contained.
* **StableHLO** (``export_policy_stablehlo``) — the TPU/XLA-native portable
  artifact via ``jax.export``: versioned, serialized MLIR that any XLA
  runtime (TPU, GPU, CPU, IREE-class edge runtimes) can execute without
  Python or flax.  Round-trips through ``load_stablehlo_policy``.
"""
from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# flax → torch parameter transposition
# ---------------------------------------------------------------------------

_TORCH_ACT = {"elu": "ELU", "relu": "ReLU", "selu": "SELU", "tanh": "Tanh",
              "lrelu": "LeakyReLU", "sigmoid": "Sigmoid", "crelu": "ReLU"}


def _np(x) -> np.ndarray:
    return np.asarray(jax.device_get(x), dtype=np.float32)


def _mlp_to_torch(mlp_params: dict, activation: str):
    """Flax MLP param subtree ({'Dense_i': {kernel, bias}}) → torch Sequential
    (the reference's actor layout: Linear/act alternating, final Linear bare)."""
    import torch.nn as tnn

    n_layers = len([k for k in mlp_params if k.startswith("Dense_")])
    layers = []
    act_cls = getattr(tnn, _TORCH_ACT[activation])
    for i in range(n_layers):
        p = mlp_params[f"Dense_{i}"]
        lin = tnn.Linear(p["kernel"].shape[0], p["kernel"].shape[1])
        lin.weight.data = _torch_tensor(_np(p["kernel"]).T)
        lin.bias.data = _torch_tensor(_np(p["bias"]))
        layers.append(lin)
        if i < n_layers - 1:
            layers.append(act_cls())
    return tnn.Sequential(*layers)


def _torch_tensor(a: np.ndarray):
    import torch

    return torch.from_numpy(np.ascontiguousarray(a))


def _lstm_to_torch(cell_params: dict, input_dim: int, hidden: int):
    """Flax OptimizedLSTMCell gates (ii/if/ig/io input kernels, hi/hf/hg/ho
    hidden kernels+biases) → torch.nn.LSTM tensors (gate order i,f,g,o)."""
    import torch.nn as tnn

    lstm = tnn.LSTM(input_dim, hidden, num_layers=1)
    w_ih = np.concatenate([_np(cell_params[g]["kernel"]).T
                           for g in ("ii", "if", "ig", "io")], axis=0)
    w_hh = np.concatenate([_np(cell_params[g]["kernel"]).T
                           for g in ("hi", "hf", "hg", "ho")], axis=0)
    b_hh = np.concatenate([_np(cell_params[g]["bias"])
                           for g in ("hi", "hf", "hg", "ho")], axis=0)
    lstm.weight_ih_l0.data = _torch_tensor(w_ih)
    lstm.weight_hh_l0.data = _torch_tensor(w_hh)
    lstm.bias_hh_l0.data = _torch_tensor(b_hh)
    lstm.bias_ih_l0.data = _torch_tensor(np.zeros_like(b_hh))
    return lstm


def _gru_to_torch(cell_params: dict, input_dim: int, hidden: int):
    """Flax GRUCell (ir/iz/in input, hr/hz/hn hidden; n-gate bias on both
    sides) → torch.nn.GRU tensors (gate order r,z,n)."""
    import torch.nn as tnn

    gru = tnn.GRU(input_dim, hidden, num_layers=1)
    w_ih = np.concatenate([_np(cell_params[g]["kernel"]).T
                           for g in ("ir", "iz", "in")], axis=0)
    w_hh = np.concatenate([_np(cell_params[g]["kernel"]).T
                           for g in ("hr", "hz", "hn")], axis=0)
    b_ih = np.concatenate([_np(cell_params[g]["bias"])
                           for g in ("ir", "iz", "in")], axis=0)
    b_hn = _np(cell_params["hn"]["bias"])
    b_hh = np.concatenate([np.zeros(hidden, np.float32),
                           np.zeros(hidden, np.float32), b_hn], axis=0)
    gru.weight_ih_l0.data = _torch_tensor(w_ih)
    gru.weight_hh_l0.data = _torch_tensor(w_hh)
    gru.bias_ih_l0.data = _torch_tensor(b_ih)
    gru.bias_hh_l0.data = _torch_tensor(b_hh)
    return gru


def _normalizer_layer(normalizer):
    """RunningNorm → torch layer (x - mean)/sqrt(var + eps), matching
    runner.get_inference_policy's wrap (reference on_policy_runner.py:717-727)."""
    import torch
    import torch.nn as tnn

    class Norm(tnn.Module):
        def __init__(self, mean, var):
            super().__init__()
            self.register_buffer("mean", _torch_tensor(mean))
            self.register_buffer("std", _torch_tensor(np.sqrt(var + 1e-8)))

        def forward(self, x):
            return (x - self.mean) / self.std

    return Norm(_np(normalizer.mean), _np(normalizer.var))


# ---------------------------------------------------------------------------
# TorchScript exporters (reference helpers.py:302-341 parity)
# ---------------------------------------------------------------------------

def export_policy_as_jit(params: dict, path: str, *, activation: str = "elu",
                         normalizer=None, filename: str = "policy_1.pt") -> str:
    """MLP actor → TorchScript (reference export_policy_as_jit,
    helpers.py:302-315).  ``params`` is the flax ActorCritic variables dict."""
    import torch

    actor = _mlp_to_torch(params["params"]["actor"], activation)
    if normalizer is not None:
        import torch.nn as tnn

        actor = tnn.Sequential(_normalizer_layer(normalizer), *actor)
    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, filename)
    torch.jit.script(actor.eval()).save(out)
    return out


def export_recurrent_policy_as_jit(params: dict, num_obs: int, path: str, *,
                                   rnn_type: str = "lstm",
                                   rnn_hidden_size: int = 256,
                                   activation: str = "elu", normalizer=None,
                                   filename: str = "policy_lstm_1.pt") -> str:
    """Recurrent actor (memory_a RNN + MLP head) → TorchScript module that
    carries hidden state internally with a reset_memory() method — the
    reference's PolicyExporterLSTM contract (helpers.py:317-341), extended to
    GRU."""
    import torch
    import torch.nn as tnn

    p = params["params"]
    cell_key = [k for k in p["memory_a"] if "LSTMCell" in k or "GRUCell" in k][0]
    cell = p["memory_a"][cell_key]
    if rnn_type == "lstm":
        rnn = _lstm_to_torch(cell, num_obs, rnn_hidden_size)
    else:
        rnn = _gru_to_torch(cell, num_obs, rnn_hidden_size)
    actor = _mlp_to_torch(p["actor"], activation)
    norm = (_normalizer_layer(normalizer) if normalizer is not None
            else tnn.Identity())

    class PolicyExporterLSTM(tnn.Module):
        """The reference's PolicyExporterLSTM contract (helpers.py:317-341)."""

        def __init__(self):
            super().__init__()
            self.norm = norm
            self.rnn = rnn
            self.actor = actor
            self.register_buffer("hidden_state",
                                 torch.zeros(1, 1, rnn_hidden_size))
            self.register_buffer("cell_state",
                                 torch.zeros(1, 1, rnn_hidden_size))

        def forward(self, x):
            x = self.norm(x)
            out, (h, c) = self.rnn(x.unsqueeze(0),
                                   (self.hidden_state, self.cell_state))
            self.hidden_state[:] = h
            self.cell_state[:] = c
            return self.actor(out.squeeze(0))

        @torch.jit.export
        def reset_memory(self):
            self.hidden_state[:] = 0.0
            self.cell_state[:] = 0.0

    class PolicyExporterGRU(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm = norm
            self.rnn = rnn
            self.actor = actor
            self.register_buffer("hidden_state",
                                 torch.zeros(1, 1, rnn_hidden_size))

        def forward(self, x):
            x = self.norm(x)
            out, h = self.rnn(x.unsqueeze(0), self.hidden_state)
            self.hidden_state[:] = h
            return self.actor(out.squeeze(0))

        @torch.jit.export
        def reset_memory(self):
            self.hidden_state[:] = 0.0

    exporter = PolicyExporterLSTM() if rnn_type == "lstm" else PolicyExporterGRU()
    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, filename)
    torch.jit.script(exporter.eval()).save(out)
    return out


# ---------------------------------------------------------------------------
# StableHLO exporter (TPU-native portable artifact)
# ---------------------------------------------------------------------------

def export_policy_stablehlo(policy_fn: Callable, example_obs: jnp.ndarray,
                            path: str, filename: str = "policy.stablehlo") -> str:
    """Serialize a jitted policy to a versioned StableHLO artifact
    (jax.export): portable MLIR any XLA runtime executes without Python."""
    exported = jax.export.export(jax.jit(policy_fn))(
        jax.ShapeDtypeStruct(example_obs.shape, example_obs.dtype))
    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, filename)
    with open(out, "wb") as f:
        f.write(exported.serialize())
    return out


def load_stablehlo_policy(path: str) -> Callable:
    """Deserialize a StableHLO policy artifact → callable(obs) → actions."""
    with open(path, "rb") as f:
        exported = jax.export.deserialize(bytearray(f.read()))
    return jax.jit(exported.call)
