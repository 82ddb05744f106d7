"""Batched graph-convolution building blocks.

The reference uses torch_geometric `GCNConv` inside a per-sample Python loop
(`gnn_dlasso_models_progressive.py:37-44`). A GCN layer is just
`D^-1/2 (A+I) D^-1/2 @ X @ W + b`, so here it is two batched matmuls on the MXU with the
normalized adjacency precomputed once per batch (`ops/graphs.py:gcn_norm_adj`) — no
per-sample loop, no sparse gather/scatter.

Norm layers carry explicit parameters/state pytrees: batch-norm running statistics are
threaded functionally (no hidden module state).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def xavier_uniform(key: jax.Array, fan_in: int, fan_out: int, gain: float = 1.0,
                   dtype=jnp.float32) -> jax.Array:
    """Glorot/Xavier uniform init (reference `gnn_dlasso_models_progressive.py:32-35`)."""
    limit = gain * jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, (fan_in, fan_out), dtype, -limit, limit)


def gcn_layer(norm_adj, x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """One GCNConv: norm_adj [B,P,P], x [B,P,Fin], w [Fin,Fout] -> [B,P,Fout].

    norm_adj may instead be a callable `x -> Ahat @ x` (the packed-topology
    aggregation from `ops/topology.gcn_aggregate` at pod scale, where a dense
    [B,P,P] normalized adjacency would cost O(P^2) memory per sample)."""
    agg = norm_adj(x) if callable(norm_adj) else jnp.einsum("bpq,bqf->bpf", norm_adj, x)
    return agg @ w + b


def leaky_relu(x: jax.Array, negative_slope: float = 0.01) -> jax.Array:
    return jnp.where(x >= 0, x, negative_slope * x)


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-5) -> jax.Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def batch_norm_init(dim: int, dtype=jnp.float32) -> Tuple[dict, dict]:
    """Returns (params, state) for a BatchNorm over the node axis."""
    params = {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}
    state = {"mean": jnp.zeros((dim,), dtype), "var": jnp.ones((dim,), dtype)}
    return params, state


def batch_norm(
    x: jax.Array,
    params: dict,
    state: dict,
    training: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> Tuple[jax.Array, dict]:
    """BatchNorm over all leading axes (here the B*P node axis), functional state.

    Semantics note (documented deviation): the reference applies `nn.BatchNorm1d` inside
    a per-sample loop, so its training-time statistics are over the P nodes of ONE
    sample (`gnn_dlasso_models_progressive.py:39,52-69`). Batching the conv removes the
    loop, so statistics here are over all B*P nodes of the batch — the standard GCN
    formulation. Eval mode uses running statistics in both.
    """
    if training:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * var,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + eps) * params["scale"] + params["bias"]
    return y, new_state


def dropout(key: jax.Array, x: jax.Array, rate: float, training: bool) -> jax.Array:
    if not training or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
