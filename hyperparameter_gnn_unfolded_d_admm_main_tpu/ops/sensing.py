"""Sensing-matrix factory.

TPU-native equivalent of the reference `gnn_dlasso_utils.py:4-16` (`set_A`): per-agent
Gaussian matrices with singular values clamped to [0.1, 10] for conditioning. Built with
one vmapped SVD instead of a per-agent Python loop, and shaped `[P, m, n]` (the reference
carries a leading singleton batch dim `[1, P, m, n]`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def set_A(key: jax.Array, P: int, m: int, n: int, dtype=jnp.float32) -> jax.Array:
    """Sample `A [P, m, n]` with spectrum clamped to [0.1, 10] per agent."""

    def one(k):
        a = jax.random.normal(k, (m, n), dtype=jnp.float32)
        u, s, vt = jnp.linalg.svd(a, full_matrices=False)
        s = jnp.clip(s, 0.1, 10.0)
        return (u * s[None, :]) @ vt

    A = jax.vmap(one)(jax.random.split(key, P))
    return A.astype(dtype)


def gram(A: jax.Array) -> jax.Array:
    """Per-agent Gram matrices `AtA [P, n, n]` (reference `unfolded_DLASSO.py:16`)."""
    return jnp.einsum("pmi,pmj->pij", A, A)


def At_apply(A: jax.Array, x: jax.Array) -> jax.Array:
    """`A_p^T x_p` batched over agents: A [P,m,n], x [B,P,m] -> [B,P,n].

    Replaces the per-agent Python loop of reference `unfolded_DLASSO.py:120-124`
    (`compute_Atx`) with a single einsum so XLA tiles it onto the MXU.
    """
    return jnp.einsum("pmn,bpm->bpn", A, x)


def A_apply(A: jax.Array, y: jax.Array) -> jax.Array:
    """`A_p y_p` batched over agents: A [P,m,n], y [B,P,n] -> [B,P,m]."""
    return jnp.einsum("pmn,bpn->bpm", A, y)
