"""Run logging: stdout+file stream, CSV metrics, run-directory layout.

Equivalent of the reference observability surface: `IOStream` append log
(`utils.py:170-180`), per-run CSV loss curves (`unfolded_train_new.py:153-160`,
`gnn_dlasso_progressive.py:309-312`), timestamped run dirs, and the checkpoint tree of
`utils.py:initializations` (`utils.py:136-168`). TensorBoard is intentionally replaced
by plain CSV + JSON (host-0-writable, trivially diffable); the comparison tool
(`cli/compare.py`) consumes the same CSV schema as the reference's.
"""

from __future__ import annotations

import csv
import json
import os
import time
from datetime import datetime
from typing import Dict, List, Optional


class IOStream:
    """Append-mode run log that tees to stdout (reference `utils.py:170-180`)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.f = open(path, "a")

    def cprint(self, text: str):
        print(text)
        self.f.write(text + "\n")
        self.f.flush()

    def close(self):
        self.f.close()


class CSVLogger:
    """Columnar metrics accumulated in memory, flushed as CSV (losses.csv schema)."""

    def __init__(self, columns: List[str]):
        self.columns = list(columns)
        self.rows: List[Dict] = []

    def append(self, **kw):
        self.rows.append({c: kw.get(c) for c in self.columns})

    def write(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self.columns)
            w.writeheader()
            w.writerows(self.rows)

    def column(self, name: str) -> List:
        return [r[name] for r in self.rows]


def timestamped_dir(base: str, suffix: str) -> str:
    ts = datetime.now().strftime("%Y%m%d_%H%M%S")
    path = os.path.join(base, f"{ts}_{suffix}")
    os.makedirs(path, exist_ok=True)
    return path


def save_json(path: str, obj):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=2, sort_keys=True, default=str)


class TensorBoardWriter:
    """Optional TensorBoard scalars (reference parity: `utils.py:162` uses
    tensorboardX). Lazily imports torch's SummaryWriter; degrades to a no-op when
    unavailable so headless/minimal environments never fail."""

    def __init__(self, log_dir: str, enabled: bool = True):
        self._w = None
        if enabled:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._w = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._w = None

    @property
    def active(self) -> bool:
        return self._w is not None

    def scalar(self, tag: str, value: float, step: int):
        if self._w is not None:
            self._w.add_scalar(tag, value, step)

    def close(self):
        if self._w is not None:
            self._w.close()


class StepTimer:
    """Per-step wall-clock accounting (new surface; the reference only prints a total,
    `dlasso.py:104-105`). Records steps/sec excluding the first (compile) step."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *a):
        self.times.append(time.perf_counter() - self._t0)

    def steady_state_rate(self) -> float:
        if len(self.times) <= 1:
            return 0.0
        steady = self.times[1:]
        return len(steady) / sum(steady)
