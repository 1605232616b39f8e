"""Metrics writers: JSONL always; TensorBoard when torch is importable.

Replaces the reference's writer stack (reference:
rsl_rl/rsl_rl/runners/on_policy_runner.py:488-506, utils/wandb_utils.py,
neptune_utils.py).  W&B/Neptune have no network egress here; the JSONL log is
the canonical record and is trivially uploadable to either."""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self.tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(log_dir=log_dir, flush_secs=30)
            except Exception:
                self.tb = None

    def write(self, step: int, metrics: Dict[str, float]):
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(k, float(v), step)

    def close(self):
        self._f.close()
        if self.tb is not None:
            self.tb.close()
