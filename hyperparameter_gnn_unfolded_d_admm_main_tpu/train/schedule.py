"""Training schedules: progressive-K curriculum and LR adjustment policies.

Host-side, pure-Python state machines (they decide *static* quantities like the
iteration count and the LR scalar fed into the jitted step; nothing here traces).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


def get_iterations_for_epoch(
    epoch: int, total_epochs: int, min_iterations: int, max_iterations: int
) -> int:
    """Progressive K schedule (reference `gnn_dlasso_progressive.py:79-85`):
    K(e) = min + (max-min) * min(1, e/(0.75*E))^1.5, rounded, reaching max at 75%."""
    progress = min(1.0, epoch / (total_epochs * 0.75)) if total_epochs > 0 else 1.0
    iters = min_iterations + (max_iterations - min_iterations) * (progress ** 1.5)
    return max(min_iterations, min(max_iterations, round(iters)))


def lr_factor_for_iterations(
    current_iterations: int, epoch: int, total_epochs: int, max_iterations: int
) -> float:
    """Manual LR damping once the schedule reaches max K (reference
    `gnn_dlasso_progressive.py:87-118`): factor ramps 0.8 -> 0.3 over remaining epochs;
    1.0 before max K is reached."""
    if current_iterations < max_iterations:
        return 1.0
    max_iter_epoch = int(total_epochs * 0.75)
    # Clamped to >= 1: when min_iterations == max_iterations the schedule is at max K
    # from epoch 0, long before the 75% mark, and the raw `epoch - max_iter_epoch + 1`
    # goes negative — extrapolating the ramp BACKWARD into an LR *boost* (factor up to
    # ~2.3x). The reference never hits this (its schedule reaches max K only at 75%);
    # the intent is a 0.8 -> 0.3 damping, so cap at the ramp's starting value.
    epochs_at_max = max(1, epoch - max_iter_epoch + 1)
    remaining = total_epochs - max_iter_epoch
    if remaining > 0:
        return max(0.3, 0.8 - (epochs_at_max / remaining) * 0.5)
    return 0.8


def warmup_factor(epoch: int, warmup_epochs: int) -> float:
    """Linear LR warmup over the first `warmup_epochs` epochs (1.0 when disabled).

    New surface (the reference has no warmup): added because the attention-encoder
    hypernetwork is seed-sensitive at full LR from epoch 0 — its edge-masked softmax
    saturates if the first few updates are too large (PARITY.md: seed 7 diverged).
    Off by default to keep the reference-faithful trajectory."""
    if warmup_epochs <= 0:
        return 1.0
    return min(1.0, (epoch + 1) / float(warmup_epochs))


@dataclass
class ReduceLROnPlateau:
    """torch-semantics plateau scheduler (reference uses factor=0.8/patience=3 for the
    unfolded driver `unfolded_train_new.py:37-43` and 0.7/15 for the progressive one
    `gnn_dlasso_progressive.py:50-52`). Mutates a scalar `lr`; feed it into the jitted
    step via `optax.inject_hyperparams`."""

    lr: float
    factor: float = 0.8
    patience: int = 3
    min_lr: float = 1e-6
    threshold: float = 1e-4          # relative improvement threshold (torch default)
    best: float = field(default=math.inf)
    num_bad: int = field(default=0)

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr


@dataclass
class EarlyStopping:
    """Best-tracking early stop (reference patience 70 unfolded / 20 progressive)."""

    patience: int
    best: float = field(default=math.inf)
    num_bad: int = field(default=0)

    def step(self, metric: float) -> bool:
        """Returns True when training should stop. `improved` is queryable after."""
        if metric < self.best:
            self.best = metric
            self.num_bad = 0
            self.improved = True
        else:
            self.num_bad += 1
            self.improved = False
        return self.num_bad >= self.patience


def step_lr(base_lr: float, epoch_or_step: int, step_size: int = 10, gamma: float = 0.1) -> float:
    """StepLR used by the classic path (`utils.py:49`)."""
    return base_lr * (gamma ** (epoch_or_step // step_size))
