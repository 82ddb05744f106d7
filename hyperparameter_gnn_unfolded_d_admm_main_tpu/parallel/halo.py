"""Edge-cut-aware halo exchange for the agent axis: send boundary rows, not the ring.

The packed ppermute ring (`ops/topology.py:neighbor_sum_ring_packed`) rotates the
ENTIRE visiting primal block `[B, P_local, n]` through all s shards regardless of the
edge structure — each device ships ~the full global primal per solver iteration, which
is why the agent axis projected at 23% efficiency at training shapes
(results_parity/scaling_projection.json, round 4). But the consensus sum
`sum_q adj[p,q] y_q` (reference `unfolded_DLASSO.py:127-140`) only ever READS the
neighbor rows of local agents: on a partitioned graph a shard needs the y-rows of its
*boundary* neighbors, a set whose size is bounded by the edge cut — at P=1024 /
degree ~12 a tiny fraction of the 896 remote rows the ring ships.

This module is that schedule, TPU-shaped:

1. `greedy_equal_partition` (host, numpy): relabel agents into s equal shards
   minimizing cross-shard edges — BFS-seeded linear greedy placement plus
   balanced pairwise-swap refinement. Equal shard sizes keep every device
   program identical (static shapes under jit).
2. `build_halo` (host): per shard-pair offset t, the static send list of local
   rows adjacent to shard (i+t) — padded to the batch/shard max H_t — and a
   precomputed gather map `nbr_buf` into the concatenated
   [local rows ; halo_1 ; ... ; halo_{s-1}] buffer, so the device-side exchange
   is gather -> ppermute -> gather+FMA with zero dynamic shapes.
3. `halo_neighbor_sum` / `halo_consensus_delta` (inside `shard_map`): for each
   offset t with a nonempty halo, gather the send rows `[B, H_t, n]` and
   `ppermute` them offset-t around the agent axis; empty halos cost NOTHING
   (the exchange step is statically absent). Per-device bytes sent per
   iteration drop from the ring's (s-1) * B * Pl * n to B * sum_t H_t * n —
   proportional to the realized edge cut, not to global P.

Numerical note: the gather+FMA accumulation order differs from the dense masked
matmul's, so results match dense to float tolerance (tests/test_halo.py), same as
the packed ring. The GCN-normalized aggregation reuses the exchange via `weights`.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .mesh import AGENT_AXIS


# --------------------------------------------------------------------- partitioner

def edge_cut(adj: np.ndarray, assign: np.ndarray, num_shards: int) -> float:
    """Fraction of (undirected) edges crossing shard boundaries under `assign`
    [P] -> shard id. Batched adj is averaged over the batch."""
    a = np.asarray(adj)
    if a.ndim == 2:
        a = a[None]
    same = (assign[:, None] == assign[None, :])
    tot = a.sum()
    if tot == 0:
        return 0.0
    return float((a * ~same).sum() / tot)


def _ring_order_shards(a: np.ndarray, assign: np.ndarray, s: int) -> np.ndarray:
    """Relabel shards so heavy-exchange pairs sit at adjacent ring offsets —
    minimizes the hop-weighted halo bytes (an offset-t ppermute travels
    min(t, s-t) ICI hops on a bidirectional ring). Exact for s <= 8: brute-force
    over ring orders with shard 0 pinned (ring symmetry)."""
    import itertools

    T = np.zeros((s, s))
    for i in range(s):
        for j in range(s):
            if i != j:
                # traffic proxy: boundary rows i must send to j
                T[i, j] = (a[np.ix_(assign == i, assign == j)].any(1)).sum()
    sym = T + T.T
    best, best_cost = tuple(range(s)), np.inf
    for rest in itertools.permutations(range(1, s)):
        order = (0,) + rest
        pos = np.empty(s, np.int64)
        pos[list(order)] = np.arange(s)
        hops = np.minimum((pos[:, None] - pos[None, :]) % s,
                          (pos[None, :] - pos[:, None]) % s)
        cost = (sym * hops).sum()
        if cost < best_cost - 1e-9:
            best, best_cost = order, cost
    pos = np.empty(s, np.int64)
    pos[list(best)] = np.arange(s)
    return pos          # pos[old shard id] = new ring position


def _partition_once(a: np.ndarray, s: int, refine_passes: int,
                    seed_node: int) -> np.ndarray:
    """One BFS-greedy + swap-refinement run from `seed_node`; returns assign [P]."""
    P = a.shape[0]
    Pl = P // s

    # BFS order (multi-source over components; first component from seed_node,
    # later components from their highest-degree node)
    deg = a.sum(1)
    order: list[int] = []
    seen = np.zeros(P, bool)
    first = True
    while len(order) < P:
        seed = seed_node if first else int(np.argmax(np.where(seen, -1.0, deg)))
        first = False
        if seen[seed]:
            seed = int(np.argmax(np.where(seen, -1.0, deg)))
        queue = [seed]
        seen[seed] = True
        while queue:
            u = queue.pop(0)
            order.append(u)
            nxt = np.nonzero(a[u] * ~seen)[0]
            seen[nxt] = True
            queue.extend(int(v) for v in nxt)

    assign = np.full(P, -1, np.int64)
    load = np.zeros(s, np.int64)
    for u in order:
        # neighbors already placed, per shard
        nb = np.nonzero(a[u])[0]
        counts = np.zeros(s, np.float64)
        for v in nb:
            if assign[v] >= 0:
                counts[assign[v]] += 1.0
        counts[load >= Pl] = -np.inf          # full shards are out
        # tie-break toward the least-loaded shard
        counts = counts - 1e-6 * load
        assign[u] = int(np.argmax(counts))
        load[assign[u]] += 1

    # refinement: balanced steepest-gain swaps. C[u, j] = #neighbors of u in shard j.
    C = np.zeros((P, s), np.float64)
    for j in range(s):
        C[:, j] = a[:, assign == j].sum(1)
    for _ in range(refine_passes):
        improved = False
        for ja in range(s):
            for jb in range(ja + 1, s):
                # drain this pair: swap steepest positive-gain node pairs until
                # none remain (bounded by the shard size)
                for _swap in range(Pl):
                    gain = C - C[np.arange(P), assign][:, None]
                    ua_set = np.nonzero(assign == ja)[0]
                    ub_set = np.nonzero(assign == jb)[0]
                    ua = ua_set[int(np.argmax(gain[ua_set, jb]))]
                    ub = ub_set[int(np.argmax(gain[ub_set, ja]))]
                    # swapping adjacent nodes double-counts their shared edge
                    total = gain[ua, jb] + gain[ub, ja] - 2.0 * a[ua, ub]
                    if total <= 1e-9:
                        break
                    assign[ua], assign[ub] = jb, ja
                    for u, old, new in ((ua, ja, jb), (ub, jb, ja)):
                        nb = np.nonzero(a[:, u])[0]
                        C[nb, old] -= 1.0
                        C[nb, new] += 1.0
                    improved = True
        if not improved:
            break

    return assign


def greedy_equal_partition(adj: np.ndarray, num_shards: int,
                           refine_passes: int = 4,
                           restarts: int = 3) -> np.ndarray:
    """Equal-size edge-cut-minimizing agent relabeling (host-side, deterministic).

    adj: [P, P] or [B, P, P] (a per-sample batch is partitioned on its edge UNION —
    the shard assignment must be one static layout for the whole sharded array).
    Returns `perm` [P] int32 with perm[new] = old: new shard i owns original agents
    perm[i*Pl:(i+1)*Pl]. Algorithm, per restart seed: BFS order (graph locality
    feeds the greedy), linear greedy placement into the shard holding the most
    already-placed neighbors (capacity Pl, ties -> least loaded), then
    `refine_passes` rounds of balanced pairwise swaps by steepest positive gain,
    draining each shard pair. The best-cut restart wins, and shards are finally
    RELABELED so heavy-exchange pairs sit at adjacent ring offsets
    (`_ring_order_shards` — minimizes hop-weighted halo bytes). Deterministic
    seeds (max-degree node + fixed strides) keep artifacts reproducible. On
    expander graphs (ER) the attainable cut stays high — `edge_cut` reports the
    realized number and the scaling model consumes measured halo sizes, not hopes.
    """
    a = np.asarray(adj)
    if a.ndim == 3:
        a = (a.sum(0) > 0).astype(np.float64)
    else:
        a = (a > 0).astype(np.float64)
    P = a.shape[0]
    s = num_shards
    if P % s:
        raise ValueError(f"P={P} must divide by num_shards={s}")
    if s == 1:
        return np.arange(P, dtype=np.int32)

    deg = a.sum(1)
    seeds = [int(np.argmax(deg))] + [int((k * P) // restarts) % P
                                     for k in range(1, restarts)]
    best_assign, best_cut = None, np.inf
    for seed_node in dict.fromkeys(seeds):        # dedup, keep order
        assign = _partition_once(a, s, refine_passes, seed_node)
        cut = edge_cut(a, assign, s)
        if cut < best_cut - 1e-12:
            best_assign, best_cut = assign, cut
    assign = _ring_order_shards(a, best_assign, s)[best_assign]

    perm = np.concatenate([np.nonzero(assign == j)[0] for j in range(s)])
    return perm.astype(np.int32)


def inverse_perm(perm: np.ndarray) -> np.ndarray:
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=perm.dtype)
    return inv


def permute_agents(perm: np.ndarray, *arrays: np.ndarray,
                   axis: int = 1) -> tuple:
    """Reorder the agent axis of each array to partition order (perm[new] = old).
    Dense adjacency is detected by a square agent block — the axis adjacent to
    `axis` having the same length — and gets BOTH agent axes permuted ([P, P]
    and [B, P, P] alike). Don't pass non-adjacency arrays whose neighboring axis
    coincidentally equals P; permute those with np.take directly."""
    out = []
    for arr in arrays:
        x = np.asarray(arr)
        x = np.take(x, perm, axis=axis)
        if axis + 1 < x.ndim and x.shape[axis + 1] == x.shape[axis]:
            x = np.take(x, perm, axis=axis + 1)
        elif axis == x.ndim - 1 and x.ndim >= 2 and x.shape[axis - 1] == x.shape[axis]:
            x = np.take(x, perm, axis=axis - 1)
        out.append(x)
    return tuple(out)


# ----------------------------------------------------------------- halo topology

class HaloTopology(NamedTuple):
    """Device arrays in GLOBAL (partitioned) agent order; shard_map splits the
    agent axis. `send_idx[t-1]` [B, s, H_t] holds, for each shard i, the local
    rows it sends offset-t around the ring (shard i -> shard (i+t) mod s), padded
    with 0 (a legal duplicate row; receivers only read mapped positions).
    `nbr_buf` [B, P, D] indexes the concatenated
    [y_local (Pl) ; halo_1 (H_1) ; ...] buffer; `mask` gates padding slots."""
    send_idx: tuple          # len s-1, each [B, s, H_t] int32
    nbr_buf: jax.Array       # [B, P, D] int32
    mask: jax.Array          # [B, P, D] float
    deg: jax.Array           # [B, P] float

    @property
    def num_shards(self) -> int:
        return len(self.send_idx) + 1

    def halo_sizes(self) -> tuple:
        """Static per-offset halo widths (H_1, ..., H_{s-1})."""
        return tuple(int(s.shape[-1]) for s in self.send_idx)

    def spec(self):
        """shard_map in_specs pytree for this topology."""
        from jax.sharding import PartitionSpec as P
        from .mesh import DATA_AXIS
        return HaloTopology(
            send_idx=tuple(P(DATA_AXIS, AGENT_AXIS, None)
                           for _ in self.send_idx),
            nbr_buf=P(DATA_AXIS, AGENT_AXIS, None),
            mask=P(DATA_AXIS, AGENT_AXIS, None),
            deg=P(DATA_AXIS, AGENT_AXIS),
        )


def build_halo(adj: np.ndarray, num_shards: int, D: int | None = None) -> HaloTopology:
    """Host-side halo construction from dense adjacency ALREADY in partition order
    (apply `permute_agents(greedy_equal_partition(...), adj)` first; an identity
    layout is also valid — the halos are then whatever the contiguous split yields).

    Per offset t in 1..s-1 the send set of shard i is the unique local rows with an
    edge into shard (i+t) mod s in ANY batch sample assigned the same shard layout;
    H_t = max over (sample, shard). Receive positions are precomputed into
    `nbr_buf` so the device exchange never searches."""
    a = np.asarray(adj)
    squeeze = a.ndim == 2
    if squeeze:
        a = a[None]
    B, P, _ = a.shape
    s = num_shards
    if P % s:
        raise ValueError(f"P={P} must divide by num_shards={s}")
    Pl = P // s
    degs = a.sum(-1)
    if D is None:
        D = max(int(degs.max()), 1)

    # send lists per (b, shard, offset)
    send: list[list[list[np.ndarray]]] = []
    H = [0] * s                                    # H[t], t = 1..s-1
    for b in range(B):
        per_shard = []
        for i in range(s):
            rows = a[b, i * Pl:(i + 1) * Pl]       # [Pl, P]
            per_t = [np.empty(0, np.int64)]        # t=0 placeholder
            for t in range(1, s):
                j = (i + t) % s
                block = rows[:, j * Pl:(j + 1) * Pl]
                snd = np.nonzero(block.any(axis=1))[0]
                per_t.append(snd)
                H[t] = max(H[t], snd.size)
            per_shard.append(per_t)
        send.append(per_shard)

    # base offsets into the concat buffer (zero-width halos are skipped on device)
    bases = [0] * s
    run = Pl
    for t in range(1, s):
        bases[t] = run
        run += H[t]

    send_idx = [np.zeros((B, s, H[t]), np.int32) for t in range(1, s)]
    nbr_buf = np.zeros((B, P, D), np.int32)
    mask = np.zeros((B, P, D), a.dtype)
    for b in range(B):
        # position lookup: (shard o, offset t, local row) -> slot in o's send list
        pos = {}
        for o in range(s):
            for t in range(1, s):
                lst = send[b][o][t]
                send_idx[t - 1][b, o, : lst.size] = lst
                for k, r in enumerate(lst):
                    pos[(o, t, int(r))] = k
        for p in range(P):
            j, qs = p // Pl, np.nonzero(a[b, p])[0]
            nbr_buf[b, p, : qs.size] = [
                (q - j * Pl) if q // Pl == j
                else bases[(j - q // Pl) % s] + pos[(q // Pl, (j - q // Pl) % s,
                                                     int(q % Pl))]
                for q in qs
            ]
            mask[b, p, : qs.size] = 1.0

    del squeeze  # output is always batch-shaped ([1, ...] for a single graph)
    return HaloTopology(
        send_idx=tuple(jnp.asarray(x) for x in send_idx),
        nbr_buf=jnp.asarray(nbr_buf),
        mask=jnp.asarray(mask),
        deg=jnp.asarray(degs.astype(a.dtype)),
    )


def halo_bytes_per_device_per_iter(halo_sizes: Sequence[int], B_local: int,
                                   n: int, dtype_bytes: int = 4,
                                   scale_bytes_per_row: int = 0) -> int:
    """Bytes each device SENDS per neighbor-sum call: one [B_local, H_t, n] block
    per nonempty offset (`halo_neighbor_sum` skips H_t == 0 statically). The ring
    equivalent is (s-1) * B_local * Pl * n * dtype_bytes
    (`utils/scaling_model.ring_bytes_per_device_per_iter`). Quantized wire formats
    (`comm_dtype='int8'`: dtype_bytes=1) additionally ship one f32 scale per sent
    row — `scale_bytes_per_row=4`."""
    rows = sum(int(h) for h in halo_sizes) * B_local
    return rows * (n * dtype_bytes + scale_bytes_per_row)


# ------------------------------------------------------------------ device side

def _quantize_rows(blk: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-row int8 quantization of a [Bl, H, n] halo block: one f32
    max-abs scale per sent row (axis -1). The scale rides the same ppermute —
    4 bytes against n*4, <1% overhead at n=512."""
    scale = jnp.max(jnp.abs(blk), axis=-1, keepdims=True).astype(jnp.float32) / 127.0
    scale = jnp.maximum(scale, jnp.float32(1e-30))
    q = jnp.clip(jnp.round(blk.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def halo_neighbor_sum(halo: HaloTopology, y_local: jax.Array, num_shards: int,
                      axis_name: str = AGENT_AXIS,
                      weights: jax.Array | None = None,
                      comm_dtype: str | None = None) -> jax.Array:
    """`sum_q adj[p,q] y_q` for local agent rows via boundary-halo exchange
    (inside shard_map; every `halo` field arrives as its local block).

    y_local [Bl, Pl, n] -> [Bl, Pl, n]. For each offset t with H_t > 0: gather the
    send rows and ppermute them t shards forward (one collective per offset; an
    empty halo emits NO collective — on partitioned geometric graphs only adjacent
    shards exchange at all). Then one packed gather+FMA over the concat buffer.
    `weights` [Bl, Pl, D] replaces the 0/1 mask coefficient (GCN aggregation).

    `comm_dtype` sets the WIRE format of the exchanged rows (local rows and the
    local compute dtype are untouched): 'bfloat16' halves the f32 payload;
    'int8' quarters it via symmetric per-row max-abs quantization (scale f32 per
    row, sent alongside — `_quantize_rows`). Inexact-consensus lever for
    expander graphs whose edge cut keeps the exact halo above break-even
    (`utils/scaling_model.halo_breakeven_rows`); measured accuracy impact in
    results_parity/halo_quantization.json."""
    if comm_dtype not in (None, "bfloat16", "int8"):
        raise ValueError(f"unsupported comm_dtype: {comm_dtype!r}")
    s = num_shards
    Bl = y_local.shape[0]
    b_ix = jnp.arange(Bl)[:, None]
    bufs = [y_local]
    for t in range(1, s):
        send = halo.send_idx[t - 1]
        if send.shape[1] == 1:                     # sliced by shard_map: [Bl,1,H]
            send = send[:, 0]
        if send.shape[-1] == 0:
            continue
        blk = y_local[b_ix, send]                  # [Bl, H_t, n]
        perm = [(j, (j + t) % s) for j in range(s)]
        if comm_dtype == "int8":
            q, scale = _quantize_rows(blk)
            q = lax.ppermute(q, axis_name, perm)
            scale = lax.ppermute(scale, axis_name, perm)
            blk = (q.astype(jnp.float32) * scale).astype(y_local.dtype)
        elif comm_dtype == "bfloat16":
            blk = lax.ppermute(blk.astype(jnp.bfloat16), axis_name, perm)
            blk = blk.astype(y_local.dtype)
        else:
            blk = lax.ppermute(blk, axis_name, perm)
        bufs.append(blk)
    buf = jnp.concatenate(bufs, axis=1) if len(bufs) > 1 else y_local
    acc = jnp.zeros_like(y_local)
    for d in range(halo.nbr_buf.shape[-1]):
        g = buf[b_ix, halo.nbr_buf[:, :, d]]       # [Bl, Pl, n]
        w = halo.mask[:, :, d] if weights is None else weights[:, :, d]
        acc = acc + w[..., None] * g
    return acc


def halo_consensus_delta(halo: HaloTopology, y_local: jax.Array, num_shards: int,
                         axis_name: str = AGENT_AXIS,
                         comm_dtype: str | None = None) -> jax.Array:
    """`delta = 2*(deg*y - adj@y)` for local rows, halo schedule (same identity as
    `ops/graphs.consensus_delta`, reference loop `unfolded_DLASSO.py:127-140`).
    `comm_dtype` compresses the wire format of the exchanged boundary rows
    (see `halo_neighbor_sum`); the local deg*y term stays exact."""
    neigh = halo_neighbor_sum(halo, y_local, num_shards, axis_name,
                              comm_dtype=comm_dtype)
    return 2.0 * (halo.deg[..., None] * y_local - neigh)
