"""Structured metric logging.

Replaces the reference's visdom live plots + pickled metric dicts + CSV
pair (``code/lib/model.py:55-58, 366-372, 409-419, 454-461``) with:
  * the same ``training.log`` / ``validation.log`` CSVs (Epoch,Cost) for
    format parity,
  * a ``metrics.jsonl`` stream with every metric per epoch,
  * no implicit network service dependency (the reference requires a
    running visdom server or training crashes).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class Averager:
    """Streaming mean over array values (reference ``averager``,
    model.py:502-527)."""

    def __init__(self):
        self.reset()

    def add(self, v) -> None:
        import numpy as np

        arr = np.asarray(v)
        self.n_count += arr.size
        self.total += float(arr.sum())

    def reset(self) -> None:
        self.n_count = 0
        self.total = 0.0

    def val(self) -> float:
        return self.total / self.n_count if self.n_count else 0.0


class MetricLogger:
    def __init__(self, run_dir: str):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self._train_csv = open(os.path.join(run_dir, "training.log"), "w")
        self._val_csv = open(os.path.join(run_dir, "validation.log"), "w")
        self._train_csv.write("Epoch,Cost\n")
        self._val_csv.write("Epoch,Cost\n")
        self._jsonl = open(os.path.join(run_dir, "metrics.jsonl"), "a")

    def log(self, split: str, epoch: int, metrics: Dict[str, float],
            cost_key: str = "ins_dice_loss") -> None:
        rec = {
            "ts": time.time(),
            "split": split,
            "epoch": epoch,
            **{k: float(v) for k, v in metrics.items()},
        }
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        cost = float(metrics.get(cost_key, metrics.get("cost", 0.0)))
        f = self._train_csv if split == "train" else self._val_csv
        f.write(f"{epoch},{cost}\n")
        f.flush()

    def close(self):
        self._train_csv.close()
        self._val_csv.close()
        self._jsonl.close()
