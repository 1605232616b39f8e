"""Metrics writers: JSONL always; TensorBoard / W&B / Neptune when available.

Replaces the reference's writer stack (reference:
rsl_rl/rsl_rl/runners/on_policy_runner.py:488-506, utils/wandb_utils.py,
neptune_utils.py).  W&B/Neptune adapters activate only when their packages
import AND credentials exist (this image has neither — no egress), so the
JSONL log is the canonical record either way."""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class _WandbSink:
    """reference wandb_utils.WandbSummaryWriter analog."""

    def __init__(self, log_dir: str, project: Optional[str] = None):
        import wandb  # raises if absent → caller gates

        self.run = wandb.init(project=project or
                              os.environ.get("WANDB_PROJECT", "elg_tpu"),
                              dir=log_dir, resume="allow")

    def add_scalar(self, k, v, step):
        self.run.log({k: v}, step=step)

    def close(self):
        self.run.finish()


class _NeptuneSink:
    """reference neptune_utils.NeptuneSummaryWriter analog."""

    def __init__(self, log_dir: str, project: Optional[str] = None):
        import neptune  # raises if absent → caller gates

        self.run = neptune.init_run(project=project)

    def add_scalar(self, k, v, step):
        self.run[k].append(v, step=step)

    def close(self):
        self.run.stop()


class MetricsWriter:
    """Fan-out writer.  ``backend``: "tensorboard" (default), "wandb",
    "neptune" — mirroring cfg.runner.logger in the reference dummy_config."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True,
                 backend: Optional[str] = None):
        # LAZY: the dir/file/sinks materialize on the first write, so a run
        # that never logs (construction-only tests, aborted launches) leaves
        # no empty run directory behind
        self.log_dir = log_dir
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._use_tensorboard = use_tensorboard
        self._backend = backend or os.environ.get("ELG_LOGGER", "tensorboard")
        self._f = None
        self.sinks = []

    def _materialize(self):
        os.makedirs(self.log_dir, exist_ok=True)
        self._f = open(self.path, "a")
        if self._use_tensorboard and self._backend == "tensorboard":
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.sinks.append(SummaryWriter(log_dir=self.log_dir, flush_secs=30))
            except Exception:
                pass
        elif self._backend == "wandb":
            try:
                self.sinks.append(_WandbSink(self.log_dir))
            except Exception:
                pass
        elif self._backend == "neptune":
            try:
                self.sinks.append(_NeptuneSink(self.log_dir))
            except Exception:
                pass

    @property
    def tb(self):  # backward compat
        return self.sinks[0] if self.sinks else None

    def write(self, step: int, metrics: Dict[str, float]):
        if self._f is None:
            self._materialize()
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        for sink in self.sinks:
            for k, v in metrics.items():
                sink.add_scalar(k, float(v), step)

    def close(self):
        if self._f is not None:
            self._f.close()
        for sink in self.sinks:
            sink.close()
