"""Agent-graph topology as *data*.

The reference treats graphs as networkx objects traversed by interpreted Python loops
(`unfolded_DLASSO.py:111-140`, `DADMM_utils.py:21-104`). Here a batch of topologies is a
dense tensor `adj [B, P, P]` so one compiled program serves every random graph; the
consensus residual, neighbor-degree products and GCN normalization all become batched
matmuls. Host-side sampling is numpy (optionally accelerated by the native C++ builder in
`native/`, see `fast_sample_connected_er`); everything downstream is JAX.

Key identity (derived from reference `unfolded_DLASSO.py:127-140` `compute_delta`, which
visits every undirected edge from both endpoints): `delta = 2 * L @ y` with
`L = diag(deg) - adj` the graph Laplacian.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import native_graphs


# --------------------------------------------------------------------------- sampling


def sample_er_adjacency(rng: np.random.Generator, P: int, prob: float) -> np.ndarray:
    """One Erdos-Renyi adjacency matrix [P, P] (numpy, host side)."""
    upper = rng.random((P, P)) < prob
    upper = np.triu(upper, k=1)
    return (upper | upper.T).astype(np.float32)


def _connected_components(adj: np.ndarray) -> list:
    P = adj.shape[0]
    seen = np.zeros(P, dtype=bool)
    comps = []
    for s in range(P):
        if seen[s]:
            continue
        stack, comp = [s], []
        seen[s] = True
        while stack:
            v = stack.pop()
            comp.append(v)
            for u in np.nonzero(adj[v])[0]:
                if not seen[u]:
                    seen[u] = True
                    stack.append(int(u))
        comps.append(sorted(comp))
    return comps


def repair_connectivity(adj: np.ndarray) -> np.ndarray:
    """Bridge disconnected components (reference `gnn_dlasso_progressive.py:184-191`):
    add an edge between the first node of each consecutive component."""
    comps = _connected_components(adj)
    for i in range(len(comps) - 1):
        a, b = comps[i][0], comps[i + 1][0]
        adj[a, b] = adj[b, a] = 1.0
    return adj


def sample_connected_er(rng: np.random.Generator, batch: int, P: int, prob: float) -> np.ndarray:
    """Batch of connected ER graphs `adj [B, P, P]` (numpy)."""
    out = np.empty((batch, P, P), dtype=np.float32)
    for i in range(batch):
        out[i] = repair_connectivity(sample_er_adjacency(rng, P, prob))
    return out


_SAMPLER_LOGGED = False


def fast_sample_connected_er(seed: int, batch: int, P: int, prob: float) -> np.ndarray:
    """Connected-ER batch via the native C++ builder when available, else numpy.

    Reproducibility note: the two backends use different PRNGs (SplitMix64 vs numpy
    PCG64), so the same seed yields different — equally valid — topologies depending
    on whether `native/libgraph_builder.so` is built. The active backend is logged
    once so runs are attributable."""
    global _SAMPLER_LOGGED
    use_native = native_graphs.available()
    if not _SAMPLER_LOGGED:
        _SAMPLER_LOGGED = True
        # stderr: bench.py's stdout contract is ONE JSON line for the driver
        import sys
        print(f"[graphs] topology sampler backend: "
              f"{'native C++' if use_native else 'numpy'}", file=sys.stderr)
    if use_native:
        return native_graphs.sample_connected_er(seed, batch, P, prob)
    return sample_connected_er(np.random.default_rng(seed), batch, P, prob)


def sample_geometric(rng: np.random.Generator, P: int, radius: float) -> np.ndarray:
    """Random geometric graph: P points uniform in the unit square, edges within
    `radius`. The reference advertises a 'geometric' `--graph_type`
    (`configurations.py:64-65`) but never implements it; provided here as a working
    capability."""
    pts = rng.random((P, 2))
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    adj = (d2 <= radius * radius).astype(np.float32)
    np.fill_diagonal(adj, 0.0)
    return adj


def sample_graph_batch(
    seed: int, batch: int, P: int, graph_type: str, prob: float
) -> np.ndarray:
    """Batched connected topology sampling dispatched on `--graph_type`.

    'erods_renyi' (reference spelling): edge probability = prob (native fast path).
    'geometric': connection radius = prob.
    """
    if graph_type in ("erods_renyi", "erdos_renyi"):
        return fast_sample_connected_er(seed, batch, P, prob)
    if graph_type == "geometric":
        rng = np.random.default_rng(seed)
        out = np.empty((batch, P, P), dtype=np.float32)
        for i in range(batch):
            out[i] = repair_connectivity(sample_geometric(rng, P, prob))
        return out
    raise ValueError(f"unknown graph_type {graph_type!r}")


# ------------------------------------------------------------------- derived tensors


def degrees(adj) -> jnp.ndarray:
    """Per-node degree `[..., P]` (reference `compute_sum_neighbors`,
    `unfolded_DLASSO.py:111-118`)."""
    return jnp.sum(adj, axis=-1)


def laplacian(adj) -> jnp.ndarray:
    """Graph Laplacian `L = diag(deg) - adj`, batched."""
    adj = jnp.asarray(adj)
    deg = degrees(adj)
    eye = jnp.eye(adj.shape[-1], dtype=adj.dtype)
    return deg[..., :, None] * eye - adj


def consensus_delta(adj, y) -> jnp.ndarray:
    """`delta = 2 * L @ y`: the D-ADMM neighbor-exchange residual.

    Exactly equals the reference triple loop (`unfolded_DLASSO.py:127-140`) because each
    undirected edge contributes twice. adj [B,P,P], y [B,P,n] -> [B,P,n].
    """
    L = laplacian(adj)
    return 2.0 * jnp.einsum("bpq,bqn->bpn", L, y)


def gcn_norm_adj(adj) -> jnp.ndarray:
    """Symmetric GCN normalization `D^-1/2 (A + I) D^-1/2` with self-loops, batched.

    Matches torch_geometric `GCNConv` defaults used by the reference hypernetwork
    (`gnn_dlasso_models_progressive.py:16-20`).
    """
    adj = jnp.asarray(adj)
    P = adj.shape[-1]
    a_hat = adj + jnp.eye(P, dtype=adj.dtype)
    d = jnp.sum(a_hat, axis=-1)
    d_inv_sqrt = jnp.where(d > 0, 1.0 / jnp.sqrt(d), 0.0)
    return a_hat * d_inv_sqrt[..., :, None] * d_inv_sqrt[..., None, :]


# -------------------------------------------------------- classic-path host utilities


def neighbors_lists(adj: np.ndarray) -> list:
    """Sorted per-node neighbor arrays (reference `DADMM_utils.graph2array`,
    `DADMM_utils.py:27-59`). Raises if any node is isolated."""
    P = adj.shape[0]
    out = []
    for p in range(P):
        nb = np.nonzero(adj[p])[0]
        if nb.size == 0:
            raise ValueError(
                "One or more nodes in the graph are not connected; "
                "increase graph_prob and run again"
            )
        out.append(np.sort(nb).astype(np.int64))
    return out


def greedy_coloring(adj: np.ndarray, rng: np.random.Generator | None = None) -> list:
    """Greedy proper coloring over a shuffled node order, returning the color partition
    (list of node arrays), reference `DADMM_utils.proper_coloring_algorithm`
    (`DADMM_utils.py:62-104`)."""
    P = adj.shape[0]
    order = np.arange(P)
    if rng is not None:
        rng.shuffle(order)
    color_of = -np.ones(P, dtype=np.int64)
    for v in order:
        forbidden = {int(color_of[u]) for u in np.nonzero(adj[v])[0] if color_of[u] >= 0}
        c = 0
        while c in forbidden:
            c += 1
        color_of[v] = c
    partition = []
    for c in range(int(color_of.max()) + 1):
        partition.append(np.nonzero(color_of == c)[0].astype(np.int64))
    return partition


def color_masks(partition: list, P: int) -> np.ndarray:
    """Stack the color partition into a dense mask `[C, P]` in {0,1} so the classic
    Gauss-Seidel sweep runs as a masked scan over colors."""
    C = len(partition)
    masks = np.zeros((C, P), dtype=np.float32)
    for c, nodes in enumerate(partition):
        masks[c, nodes] = 1.0
    return masks
