"""Per-run training plots (PNG, 150 DPI), best-effort.

Reference parity: `unfolded_train_new.py:163-173` saves `losses.png`;
`gnn_dlasso_progressive.py:334-362` saves `training_summary.png` and
`iteration_progression.png` next to the CSVs. Every entry point swallows ALL plotting
exceptions (import, backend, savefig I/O) — a run must never fail, and never skip its
remaining artifacts, over a plot.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _best_effort(fn):
    @functools.wraps(fn)
    def wrapped(*a, **kw):
        try:
            return fn(*a, **kw)
        except Exception:  # noqa: BLE001 - plotting is strictly best-effort
            return None

    return wrapped


@_best_effort
def plot_losses(out_dir: str, train: Sequence[float], valid: Sequence[float],
                epochs: Optional[Sequence[int]] = None,
                fname: str = "losses.png") -> Optional[str]:
    """Train/valid loss curves (reference `unfolded_train_new.py:163-173`).
    `epochs` carries the true epoch labels on resumed runs."""
    if not train:
        return None
    plt = _plt()
    xs = list(epochs) if epochs is not None else list(range(1, len(train) + 1))
    plt.figure(figsize=(8, 5))
    plt.plot(xs, train, label="train loss", linewidth=2)
    plt.plot(xs, valid, label="validation loss", linewidth=2)
    plt.xlabel("epoch")
    plt.ylabel("loss")
    plt.legend()
    plt.grid(True, alpha=0.3)
    plt.tight_layout()
    path = os.path.join(out_dir, fname)
    plt.savefig(path, dpi=150)
    plt.close()
    return path


@_best_effort
def plot_training_summary(out_dir: str, train_final: Sequence[float],
                          valid_final: Sequence[float], iterations: Sequence[int],
                          epoch_offset: int = 0,
                          fname: str = "training_summary.png") -> Optional[str]:
    """Two-panel summary: loss curves + the progressive K per epoch (reference
    `gnn_dlasso_progressive.py:334-353`). `epoch_offset` keeps the epoch axis honest
    when the run resumed mid-schedule."""
    if not train_final:
        return None
    plt = _plt()
    xs = range(epoch_offset + 1, epoch_offset + len(train_final) + 1)
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(13, 5))
    ax1.plot(xs, train_final, label="train (final layer)", linewidth=2)
    ax1.plot(xs, valid_final, label="validation (final layer)", linewidth=2)
    ax1.set_xlabel("epoch")
    ax1.set_ylabel("loss")
    ax1.legend()
    ax1.grid(True, alpha=0.3)
    ax1.set_title("Training progress")
    ax2.step(xs, list(iterations)[: len(train_final)], where="post", linewidth=2)
    ax2.set_xlabel("epoch")
    ax2.set_ylabel("unfolded iterations K")
    ax2.grid(True, alpha=0.3)
    ax2.set_title("Progressive schedule")
    fig.tight_layout()
    path = os.path.join(out_dir, fname)
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path


@_best_effort
def plot_iteration_progression(out_dir: str, iterations: Sequence[int],
                               epoch_offset: int = 0,
                               fname: str = "iteration_progression.png") -> Optional[str]:
    """K-vs-epoch curve (reference `gnn_dlasso_progressive.py:355-362`)."""
    if not iterations:
        return None
    plt = _plt()
    xs = range(epoch_offset + 1, epoch_offset + len(iterations) + 1)
    plt.figure(figsize=(8, 5))
    plt.step(xs, iterations, where="post", linewidth=2)
    plt.xlabel("epoch")
    plt.ylabel("unfolded iterations K")
    plt.grid(True, alpha=0.3)
    plt.tight_layout()
    path = os.path.join(out_dir, fname)
    plt.savefig(path, dpi=150)
    plt.close()
    return path
