"""Batched message-passing and attention layers (alternative hypernetwork encoders).

The reference's design space includes an MPNN variant with edge-MLP messages +
node-update MLPs and a multi-head-attention variant (archived evolution step,
`old code/gnn_dlasso_models4.py:9-231` — not imported by its live code). These are
TPU-first reformulations over dense `[B, P, P]` adjacency:

- `mpnn_layer`: message m_ij = MLP([h_i || h_j]) for every ordered pair, masked-summed
  over neighbors (sum aggregation like the archived layer), then an update MLP on
  [h || aggregated]. All-pairs message tensors are [B, P, P, F] — fine at hypernetwork
  scale (P <= ~64) and fully MXU/VPU-batched, no gather/scatter.
- `graph_attention_layer`: scaled dot-product attention over agents, masked to graph
  edges (+self), multi-head — the dense analogue of the archived attention MPNN.

Parameters are plain pytrees; init helpers mirror `ops/gcn.py` conventions.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from . import gcn


def _mlp_init(key: jax.Array, dims, dtype=jnp.float32) -> list:
    keys = jax.random.split(key, len(dims) - 1)
    return [
        {"w": gcn.xavier_uniform(k, dims[i], dims[i + 1], dtype=dtype),
         "b": jnp.zeros((dims[i + 1],), dtype)}
        for i, k in enumerate(keys)
    ]


def _mlp_apply(layers, x, key, dropout_rate, training):
    for i, lyr in enumerate(layers):
        x = x @ lyr["w"] + lyr["b"]
        if i < len(layers) - 1:
            x = jax.nn.relu(x)
            x = gcn.dropout(jax.random.fold_in(key, i), x, dropout_rate, training)
    return x


def mpnn_init(key: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32) -> dict:
    k_msg, k_upd = jax.random.split(key)
    return {
        "message": _mlp_init(k_msg, [2 * in_dim, out_dim, out_dim], dtype),
        "update": _mlp_init(k_upd, [in_dim + out_dim, out_dim, out_dim], dtype),
    }


def mpnn_layer(
    params: dict,
    key: jax.Array,
    h: jax.Array,          # [B, P, F]
    adj: jax.Array,        # [B, P, P]
    training: bool = True,
    dropout_rate: float = 0.1,
) -> jax.Array:
    """One MPNN step: edge-MLP messages, masked sum aggregation, node-update MLP."""
    B, P, F = h.shape
    k_msg, k_upd = jax.random.split(key)
    pair = jnp.concatenate(
        [jnp.broadcast_to(h[:, :, None, :], (B, P, P, F)),
         jnp.broadcast_to(h[:, None, :, :], (B, P, P, F))],
        axis=-1,
    )                                                     # [B, P, P, 2F]
    msgs = _mlp_apply(params["message"], pair, k_msg, dropout_rate, training)
    agg = jnp.einsum("bpq,bpqf->bpf", adj, msgs)          # sum over neighbors
    upd_in = jnp.concatenate([h, agg], axis=-1)
    return _mlp_apply(params["update"], upd_in, k_upd, dropout_rate, training)


def attention_init(key: jax.Array, dim: int, num_heads: int = 4, dtype=jnp.float32) -> dict:
    """num_heads stays OUT of the params pytree (ints are not differentiable leaves);
    pass it statically to `graph_attention_layer`."""
    assert dim % num_heads == 0, "dim must divide by num_heads"
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "wq": gcn.xavier_uniform(kq, dim, dim, dtype=dtype),
        "wk": gcn.xavier_uniform(kk, dim, dim, dtype=dtype),
        "wv": gcn.xavier_uniform(kv, dim, dim, dtype=dtype),
        "wo": gcn.xavier_uniform(ko, dim, dim, dtype=dtype),
    }


def graph_attention_layer(
    params: dict,
    h: jax.Array,          # [B, P, F]
    adj: jax.Array,        # [B, P, P]
    num_heads: int = 4,
) -> jax.Array:
    """Multi-head scaled-dot-product attention over agents, masked to graph edges
    (self-edges always allowed), with a residual connection."""
    B, P, F = h.shape
    H = num_heads
    d = F // H

    def split(x):
        return x.reshape(B, P, H, d).transpose(0, 2, 1, 3)   # [B, H, P, d]

    q, k, v = split(h @ params["wq"]), split(h @ params["wk"]), split(h @ params["wv"])
    logits = jnp.einsum("bhpd,bhqd->bhpq", q, k) / jnp.sqrt(jnp.asarray(d, h.dtype))
    mask = adj + jnp.eye(P, dtype=adj.dtype)
    logits = jnp.where(mask[:, None, :, :] > 0, logits, -1e9)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhpq,bhqd->bhpd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, P, F) @ params["wo"]
    return h + out
