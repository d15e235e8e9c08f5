"""Metrics / observability: host-side aggregation of batched env info.

The reference exposes per-step info dicts ({total_force_on_human,
task_success, action/obs lens}, e.g. scratch_itch.py:39) and GUI prints;
here the same quantities come back as sharded device arrays and this module
aggregates them to scalars and appends to CSV + JSONL sinks (SURVEY.md §5
"metrics/logging").  Pure host code — nothing here touches the jit path.
"""
from __future__ import annotations

import csv
import json
import os
import time
from typing import Dict, Optional

import jax
import numpy as np


def to_scalars(tree) -> Dict[str, float]:
    """Mean-reduce every leaf of a metrics pytree to a python float."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}{k}/" if isinstance(v, dict) else f"{prefix}{k}", v)
        else:
            flat[prefix.rstrip("/")] = float(np.asarray(jax.device_get(node)).mean())

    walk("", tree)
    return flat


class MetricsLogger:
    """Appends one row per update to <dir>/metrics.csv and metrics.jsonl."""

    def __init__(self, log_dir: str, print_every: int = 1):
        os.makedirs(log_dir, exist_ok=True)
        self.csv_path = os.path.join(log_dir, "metrics.csv")
        self.jsonl_path = os.path.join(log_dir, "metrics.jsonl")
        self.print_every = print_every
        self._csv_fields = None
        self._t0 = time.time()

    def log(self, step: int, metrics, extra: Optional[Dict[str, float]] = None):
        row = {"step": step, "wall_s": round(time.time() - self._t0, 2)}
        row.update(to_scalars(metrics))
        if extra:
            row.update(extra)

        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(row) + "\n")

        if self._csv_fields is None:
            self._csv_fields = list(row)
            write_header = not os.path.exists(self.csv_path)
            with open(self.csv_path, "a", newline="") as f:
                w = csv.DictWriter(f, self._csv_fields, extrasaction="ignore")
                if write_header:
                    w.writeheader()
                w.writerow(row)
        else:
            with open(self.csv_path, "a", newline="") as f:
                csv.DictWriter(f, self._csv_fields, extrasaction="ignore").writerow(row)

        if self.print_every and step % self.print_every == 0:
            parts = " ".join(f"{k}={v:.4g}" for k, v in row.items() if k != "step")
            print(f"[{step}] {parts}", flush=True)
        return row
