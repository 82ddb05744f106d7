"""Packed neighbor-list topology: the pod-scale alternative to dense `adj [B, P, P]`.

Dense adjacency is the right call at reference scale (P<=64: the Laplacian product is
one small MXU matmul), but at P=1024+ it costs O(P^2) memory per scenario and O(P^2 n)
consensus FLOPs for graphs whose edge count is ~P log P. The reference's own host-side
representation is per-node neighbor lists (`DADMM_utils.py:40-56` `graph2array`); this
module is that idea as fixed-shape device tensors:

    nbr  [B, P, D] int32   neighbor indices, rows padded to max degree D with self-index
    mask [B, P, D] float   1.0 for real neighbors, 0.0 for padding
    deg  [B, P]    float   true degrees (== mask.sum(-1))

Fixed D keeps every shape static under jit (one compiled program for any graph batch
with the same D cap). The consensus/GCN aggregations become D gather+FMA steps over
`[B, P, n]` blocks — O(P D n) instead of O(P^2 n) — with the loop over D unrolled
statically so XLA pipelines the gathers.

The gather form is exactly equivalent to the dense masked matmul (tested at P=64 and
P=1024 in tests/test_topology.py); padding with the self-index keeps gathers in-bounds
and the mask zeroes their contribution.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class PackedTopology(NamedTuple):
    nbr: jax.Array   # [B, P, D] int32
    mask: jax.Array  # [B, P, D] same float dtype as the solver state
    deg: jax.Array   # [B, P]


def max_degree(adj: np.ndarray) -> int:
    """Batch-wide max degree (the packing width D)."""
    return int(np.asarray(adj).sum(-1).max())


def pack_adjacency(adj: np.ndarray, D: int | None = None) -> PackedTopology:
    """Pack dense `adj [B, P, P]` (or [P, P]) into neighbor-list form (host-side numpy;
    called once per graph batch, off the jit path). Rows are padded with the node's OWN
    index (always a legal gather) and masked out. D defaults to the batch max degree;
    passing a larger D lets one compiled program serve graph batches of varying
    topology density."""
    a = np.asarray(adj)
    squeeze = a.ndim == 2
    if squeeze:
        a = a[None]
    B, P, _ = a.shape
    degs = a.sum(-1).astype(np.int64)
    if D is None:
        D = int(degs.max())
    elif int(degs.max()) > D:
        raise ValueError(f"max degree {int(degs.max())} exceeds packing width D={D}")
    nbr = np.tile(np.arange(P, dtype=np.int32)[None, :, None], (B, 1, D))
    mask = np.zeros((B, P, D), dtype=a.dtype)
    for i in range(B):
        for p in range(P):
            qs = np.nonzero(a[i, p])[0]
            nbr[i, p, : qs.size] = qs
            mask[i, p, : qs.size] = 1.0
    if squeeze:
        nbr, mask, degs = nbr[0], mask[0], degs[0]
    return PackedTopology(
        nbr=jnp.asarray(nbr), mask=jnp.asarray(mask),
        deg=jnp.asarray(degs.astype(a.dtype)),
    )


def to_dense(topo: PackedTopology, P: int) -> jnp.ndarray:
    """Reconstruct dense adjacency [B, P, P] (tests / dense interop)."""
    B, Pr, D = topo.nbr.shape
    out = jnp.zeros((B, Pr, P), topo.mask.dtype)
    b_ix = jnp.arange(B)[:, None, None]
    p_ix = jnp.arange(Pr)[None, :, None]
    return out.at[b_ix, p_ix, topo.nbr].add(topo.mask)


def neighbor_sum(topo: PackedTopology, y: jax.Array) -> jax.Array:
    """`sum_q adj[p,q] y[q]` via D gather+FMA steps: y [B, P, n] -> [B, P, n].

    One gather per padding slot keeps the peak intermediate at [B, P, n] (a
    take_along_axis over the full [B, P, D, n] block would materialize D times that —
    335 MB at P=1024, D=10, n=512, B=16). The D-loop is a static Python unroll: D is
    small (~log P for ER graphs) and static, and XLA overlaps the gathers.
    """
    B = y.shape[0]
    b_ix = jnp.arange(B)[:, None]
    acc = jnp.zeros_like(y)
    D = topo.nbr.shape[-1]
    for d in range(D):
        g = y[b_ix, topo.nbr[:, :, d]]                 # [B, P, n]
        acc = acc + topo.mask[:, :, d][..., None] * g
    return acc


def consensus_delta(topo: PackedTopology, y: jax.Array) -> jax.Array:
    """`delta = 2 * L @ y` in packed form (same identity as
    `ops/graphs.consensus_delta`, reference loop `unfolded_DLASSO.py:127-140`)."""
    return 2.0 * (topo.deg[..., None] * y - neighbor_sum(topo, y))


def gcn_norm_coeffs(topo: PackedTopology) -> tuple[jax.Array, jax.Array]:
    """GCN symmetric-normalization coefficients for packed aggregation.

    Dense form (`ops/graphs.gcn_norm_adj`): `Ahat = D^-1/2 (A + I) D^-1/2` with
    self-loops. Packed: returns (self_coeff [B, P], nbr_coeff [B, P, D]) with
    self_coeff[p] = 1/(deg_p+1) and nbr_coeff[p,d] = mask/(sqrt(deg_p+1) sqrt(deg_q+1)).
    """
    d1 = topo.deg + 1.0
    inv_sqrt = jax.lax.rsqrt(d1)
    b_ix = jnp.arange(topo.nbr.shape[0])[:, None, None]  # [B, 1, 1]
    inv_sqrt_q = inv_sqrt[b_ix, topo.nbr]                # [B, P, D]
    nbr_coeff = topo.mask * inv_sqrt[..., None] * inv_sqrt_q
    return 1.0 / d1, nbr_coeff


def gcn_aggregate(topo: PackedTopology, x: jax.Array,
                  self_coeff: jax.Array, nbr_coeff: jax.Array) -> jax.Array:
    """`Ahat @ x` in packed form: x [B, P, F] -> [B, P, F]. Matches
    `einsum('bpq,bqf', gcn_norm_adj(adj), x)` exactly (test_topology)."""
    B = x.shape[0]
    b_ix = jnp.arange(B)[:, None]
    acc = self_coeff[..., None] * x
    D = topo.nbr.shape[-1]
    for d in range(D):
        g = x[b_ix, topo.nbr[:, :, d]]
        acc = acc + nbr_coeff[:, :, d][..., None] * g
    return acc


# ----------------------------------------------------------------- sharded packing

class ShardedPackedTopology(NamedTuple):
    """Per-shard packed rows for the ppermute ring: shard i holds only its LOCAL
    agent rows' neighbor lists — O(Pl * D) per shard instead of the dense ring's
    O(Pl * P) replicated rows (`parallel/unfolded_sharded.py` adj_rows).

    nbr_shard/nbr_local: the owning agent-shard of each neighbor and its index
    within that shard (precomputed on host so the ring step is mask+gather only).
    """
    nbr_shard: jax.Array  # [B, Pl*s, D] int32  (global layout, sharded over axis 1)
    nbr_local: jax.Array  # [B, Pl*s, D] int32
    mask: jax.Array       # [B, Pl*s, D]
    deg: jax.Array        # [B, Pl*s]


def pack_adjacency_sharded(adj: np.ndarray, num_shards: int,
                           D: int | None = None) -> ShardedPackedTopology:
    """Host-side packing for the ring schedule: splits each neighbor index q into
    (owner shard q // Pl, local index q % Pl). The arrays stay in GLOBAL agent order;
    `shard_map` in_specs split axis 1 so each device receives its own rows."""
    topo = pack_adjacency(adj, D)
    P = topo.nbr.shape[1]
    if P % num_shards:
        raise ValueError(f"P={P} must divide by num_shards={num_shards}")
    Pl = P // num_shards
    nbr = np.asarray(topo.nbr)
    return ShardedPackedTopology(
        nbr_shard=jnp.asarray((nbr // Pl).astype(np.int32)),
        nbr_local=jnp.asarray((nbr % Pl).astype(np.int32)),
        mask=topo.mask,
        deg=topo.deg,
    )


def neighbor_sum_ring_packed(
    nbr_shard: jax.Array, nbr_local: jax.Array, mask: jax.Array,
    y_local: jax.Array, num_shards: int, axis_name: str,
    weights: jax.Array | None = None,
) -> jax.Array:
    """Ring-rotation neighbor sum over packed LOCAL rows (inside shard_map).

    Inputs are the local row blocks: nbr_* / mask [B, Pl, D], y_local [B, Pl, n].
    At ring step t the visiting block holds the y-rows of shard (i+t) mod s; the
    packed gather pulls each row's neighbors that live on that shard. Peak memory is
    O(Pl n) for the visiting block + O(Pl D) for indices — nothing scales with
    global P. The ring is statically unrolled so XLA overlaps ppermute with the
    gather+FMA of the previous step.

    `weights` [B, Pl, D] replaces the 0/1 mask contribution with an arbitrary
    per-edge coefficient (still gated by mask>0) — the GCN-normalized aggregation
    reuses this exact ring with `weights=nbr_coeff`.
    """
    from jax import lax

    s = num_shards
    idx = lax.axis_index(axis_name)
    B, Pl, D = nbr_shard.shape
    b_ix = jnp.arange(B)[:, None]
    acc = jnp.zeros_like(y_local)
    y_vis = y_local
    perm = [((j + 1) % s, j) for j in range(s)]
    for t in range(s):
        src_shard = (idx + t) % s
        for d in range(D):
            sel = (nbr_shard[:, :, d] == src_shard) & (mask[:, :, d] > 0)
            g = y_vis[b_ix, nbr_local[:, :, d]]        # [B, Pl, n]
            if weights is not None:
                g = weights[:, :, d][..., None] * g
            acc = acc + jnp.where(sel[..., None], g, 0.0)
        if t + 1 < s:
            y_vis = lax.ppermute(y_vis, axis_name, perm)
    return acc


def consensus_ring_packed(
    nbr_shard: jax.Array, nbr_local: jax.Array, mask: jax.Array, deg: jax.Array,
    y_local: jax.Array, num_shards: int, axis_name: str,
) -> jax.Array:
    """`delta = 2*(deg*y - adj@y)` for local rows, packed ring schedule."""
    neigh = neighbor_sum_ring_packed(
        nbr_shard, nbr_local, mask, y_local, num_shards, axis_name
    )
    return 2.0 * (deg[..., None] * y_local - neigh)
