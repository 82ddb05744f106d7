"""Losses and metrics.

Vectorized equivalents of reference `gnn_dlasso_utils.py:18-88` (`compute_loss`,
`compute_loss2`) and `utils.py:113-132` (`error`, `accuracy`), plus NMSE. All shapes
drop the trailing singleton dim of the reference: `Y [K, B, P, n]`, `label [B, n]`.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _nan_fallback(x, fallback=1.0):
    """Reference returns a safe 1.0 loss on NaN/Inf (`gnn_dlasso_utils.py:36-43,69-71`)."""
    return jnp.where(jnp.isfinite(x), x, jnp.asarray(fallback, x.dtype))


def compute_loss(Y: jnp.ndarray, label: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-layer MSE averaged over agents (`gnn_dlasso_utils.py:27-88`).

    Returns (mean-over-K + 1e-8, final-layer + 1e-8), each with NaN->1.0 fallback.
    """
    diff = Y - label[None, :, None, :]
    per_kp = jnp.mean(diff * diff, axis=(1, 3))       # [K, P] MSE per layer per agent
    losses = jnp.mean(per_kp, axis=1)                 # [K]
    loss_mean = _nan_fallback(jnp.mean(losses) + 1e-8)
    loss_final = _nan_fallback(losses[-1] + 1e-8)
    return loss_mean, loss_final


def losses_from_per_kp(per_kp: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`compute_loss` outputs from in-scan per-(iteration, agent) MSEs `[K, P]`
    (`dadmm_core.unroll_table_losses` fast path) — same epsilons and NaN fallbacks."""
    losses = jnp.mean(per_kp, axis=1)
    loss_mean = _nan_fallback(jnp.mean(losses) + 1e-8)
    loss_final = _nan_fallback(losses[-1] + 1e-8)
    return loss_mean, loss_final


def masked_losses_from_per_kp(per_kp: jnp.ndarray, k_active) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`losses_from_per_kp` over only the first `k_active` (a TRACED int) iterations of
    a max-K scan — the masked-K path: one compiled program serves every K of the
    progressive schedule instead of one compile per distinct K."""
    losses = jnp.mean(per_kp, axis=1)                          # [Kmax]
    k_active = jnp.asarray(k_active, jnp.int32)
    active = (jnp.arange(losses.shape[0]) < k_active).astype(losses.dtype)
    denom = jnp.maximum(k_active, 1).astype(losses.dtype)
    loss_mean = _nan_fallback(jnp.sum(losses * active) / denom + 1e-8)
    loss_final = _nan_fallback(losses[jnp.maximum(k_active - 1, 0)] + 1e-8)
    return loss_mean, loss_final


def masked_compute_loss(Y: jnp.ndarray, label: jnp.ndarray,
                        k_active) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`compute_loss` over only the first `k_active` iterations of a stacked max-K
    output `Y [Kmax, B, P, n]` (masked-K eval paths)."""
    diff = Y - label[None, :, None, :]
    per_kp = jnp.mean(diff * diff, axis=(1, 3))
    return masked_losses_from_per_kp(per_kp, k_active)


def compute_loss2(Y: jnp.ndarray, label: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Label-magnitude-weighted variant (`gnn_dlasso_utils.py:18-25`, unused by the
    live reference drivers but part of the API surface)."""
    w = jnp.abs(label) + 1e-4                          # [B, n]
    w = w / jnp.sum(w, axis=1, keepdims=True)
    y_mean = jnp.mean(Y, axis=2)                       # [K, B, n] mean over agents
    sq_final = (y_mean[-1] - label) ** 2
    sq_mean = (jnp.mean(y_mean, axis=0) - label) ** 2
    loss_final = jnp.mean(jnp.sum(sq_final * w, axis=1))
    loss_mean = jnp.mean(jnp.sum(sq_mean * w, axis=1))
    return loss_mean, loss_final


def per_iteration_losses(Y: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    """Loss-vs-iteration convergence curve `[K]` (the reference's eval artifact,
    `dlasso.py:47-48`)."""
    diff = Y - label[None, :, None, :]
    return jnp.mean(diff * diff, axis=(1, 2, 3))


def nmse(Y_final: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    """Normalized MSE of the final iterate, averaged over agents and batch:
    ||y_hat - y||^2 / ||y||^2. North-star accuracy metric (BASELINE.md)."""
    err = jnp.sum((Y_final - label[:, None, :]) ** 2, axis=-1)     # [B, P]
    ref = jnp.sum(label**2, axis=-1)[:, None] + 1e-12              # [B, 1]
    return jnp.mean(err / ref)


def classic_error(labels: jnp.ndarray, y_hat: jnp.ndarray) -> jnp.ndarray:
    """Classic-path loss `MSE(|X_p,b|, label_b)` averaged over (P, batch); note the
    `abs()` of the estimate, reproduced from reference `utils.py:113-123`.

    y_hat: [P, B, n]; labels: [B, n].
    """
    diff = jnp.abs(y_hat) - labels[None, :, :]
    return jnp.mean(jnp.mean(diff * diff, axis=-1))


def classic_accuracy(labels: jnp.ndarray, y_hat: jnp.ndarray) -> jnp.ndarray:
    """dlr rounding accuracy gated on fractional part (`utils.py:125-132`):
    a prediction only counts when |y| mod 1 is within 0.2 of an integer.

    y_hat: [P, B, 1]; labels: [P, B, 1] (per-agent scalar targets).
    """
    a = jnp.abs(y_hat)
    frac = jnp.mod(a, 1.0)
    gate = (frac > 0.8) | (frac < 0.2)
    hit = (jnp.round(a) == labels) & gate
    return 100.0 * jnp.mean(hit.astype(jnp.float32))
