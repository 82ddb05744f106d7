"""Per-run training plots (PNG, 150 DPI), best-effort.

Reference parity: `unfolded_train_new.py:163-173` saves `losses.png`;
`gnn_dlasso_progressive.py:334-362` saves `training_summary.png` and
`iteration_progression.png` next to the CSVs. All functions degrade to a no-op when
matplotlib is unavailable (headless/minimal environments must never fail a run over
a plot).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence


def _plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:  # noqa: BLE001 - plotting is strictly best-effort
        return None


def plot_losses(out_dir: str, train: Sequence[float], valid: Sequence[float],
                fname: str = "losses.png") -> Optional[str]:
    """Train/valid loss curves (reference `unfolded_train_new.py:163-173`)."""
    plt = _plt()
    if plt is None or not train:
        return None
    epochs = range(1, len(train) + 1)
    plt.figure(figsize=(8, 5))
    plt.plot(epochs, train, label="train loss", linewidth=2)
    plt.plot(epochs, valid, label="validation loss", linewidth=2)
    plt.xlabel("epoch")
    plt.ylabel("loss")
    plt.legend()
    plt.grid(True, alpha=0.3)
    plt.tight_layout()
    path = os.path.join(out_dir, fname)
    plt.savefig(path, dpi=150)
    plt.close()
    return path


def plot_training_summary(out_dir: str, train_final: Sequence[float],
                          valid_final: Sequence[float], iterations: Sequence[int],
                          fname: str = "training_summary.png") -> Optional[str]:
    """Two-panel summary: loss curves + the progressive K per epoch (reference
    `gnn_dlasso_progressive.py:334-353`)."""
    plt = _plt()
    if plt is None or not train_final:
        return None
    epochs = range(1, len(train_final) + 1)
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(13, 5))
    ax1.plot(epochs, train_final, label="train (final layer)", linewidth=2)
    ax1.plot(epochs, valid_final, label="validation (final layer)", linewidth=2)
    ax1.set_xlabel("epoch")
    ax1.set_ylabel("loss")
    ax1.legend()
    ax1.grid(True, alpha=0.3)
    ax1.set_title("Training progress")
    ax2.step(epochs, list(iterations)[: len(train_final)], where="post", linewidth=2)
    ax2.set_xlabel("epoch")
    ax2.set_ylabel("unfolded iterations K")
    ax2.grid(True, alpha=0.3)
    ax2.set_title("Progressive schedule")
    fig.tight_layout()
    path = os.path.join(out_dir, fname)
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path


def plot_iteration_progression(out_dir: str, iterations: Sequence[int],
                               fname: str = "iteration_progression.png") -> Optional[str]:
    """K-vs-epoch curve (reference `gnn_dlasso_progressive.py:355-362`)."""
    plt = _plt()
    if plt is None or not iterations:
        return None
    plt.figure(figsize=(8, 5))
    plt.step(range(1, len(iterations) + 1), iterations, where="post", linewidth=2)
    plt.xlabel("epoch")
    plt.ylabel("unfolded iterations K")
    plt.grid(True, alpha=0.3)
    plt.tight_layout()
    path = os.path.join(out_dir, fname)
    plt.savefig(path, dpi=150)
    plt.close()
    return path
