"""Environment state record / replay.

Reference: legged_gym/legged_gym/utils/env_replay_mixin.py:10-306 —
``record_step`` captures full env state each step; blocking/streaming replay
:121-237; export/import :260-306.  Functional version: a recorder accumulates
PhysState pytrees host-side; replay re-injects them into an EnvState.
"""
from __future__ import annotations

import pickle
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


class StateRecorder:
    """Accumulates per-step snapshots (host-side numpy to keep device memory
    flat) — reference record_step :68."""

    def __init__(self):
        self.frames: List[Any] = []
        self.extras: List[Dict] = []

    def record_step(self, env_state, extra: Optional[Dict] = None):
        self.frames.append(jax.tree.map(lambda x: np.asarray(x), env_state.phys))
        self.extras.append(extra or {})

    def __len__(self):
        return len(self.frames)

    # --- export / import (ref :260-306) ---

    def export(self, path: str):
        with open(path, "wb") as f:
            pickle.dump(dict(frames=self.frames, extras=self.extras), f)

    @classmethod
    def load(cls, path: str) -> "StateRecorder":
        rec = cls()
        with open(path, "rb") as f:
            d = pickle.load(f)
        rec.frames = d["frames"]
        rec.extras = d["extras"]
        return rec

    # --- replay (ref :121-237) ---

    def replay_frame(self, env_state, idx: int):
        """Overwrite the env's physics state with recorded frame ``idx``."""
        frame = jax.tree.map(jnp.asarray, self.frames[idx])
        return env_state.replace(phys=frame)

    def iter_replay(self, env_state):
        for i in range(len(self.frames)):
            yield self.replay_frame(env_state, i)

    def stacked(self):
        """All frames stacked into one pytree with a leading time axis."""
        return jax.tree.map(lambda *xs: np.stack(xs), *self.frames)
