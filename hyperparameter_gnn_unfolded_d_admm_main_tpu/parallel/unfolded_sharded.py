"""Explicitly sharded unfolded D-ADMM solver: `shard_map` over a (data, agents) mesh.

The pod-scale path (BASELINE.md: P=1024 agents across >=2 hosts). State tensors
`[B, P, n]` shard batch over `data` and agents over `agents`; each device runs the local
Jacobi update on its agent block and the consensus residual is a collective
(`parallel/consensus.py`) — the all_gather schedule by default, the ppermute ring for
large P. Identical numerics to the dense single-device `models/dadmm_core.unroll_table`
(tested on the virtual CPU mesh).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..models import dadmm_core
from ..ops import graphs as graph_ops
from . import consensus as consensus_lib
from .mesh import AGENT_AXIS, DATA_AXIS


def _collective_finite_fn(x: jax.Array) -> jax.Array:
    """Global 'all finite' agreed across every shard (both mesh axes)."""
    bad = jnp.sum(~jnp.isfinite(x))
    bad = lax.psum(bad, (DATA_AXIS, AGENT_AXIS))
    return bad == 0


def make_sharded_unroll(
    mesh: Mesh,
    schedule: str = "allgather",
    clamp_fn: Callable = dadmm_core.unfolded_clamps,
    nan_guard: bool = True,
    remat: bool = True,
    gram_mode: str = "gram",
    solver_dtype=None,
    matmul_dtype=None,
    final_only: bool = False,
):
    """Build a jitted `(state, hyp_table, op, Atb, adj) -> Y` over `mesh`.

    Shapes (global): state [B,P,n] x3, hyp_table [K,P,4] (per-agent table; use a
    broadcast table for 'same' mode), Atb [B,P,n], adj [B,P,P]. `op` is the matvec
    operand: the Gram stream `AtA [P,n,n]` when gram_mode='gram', the sensing matrix
    `A [P,m,n]` when gram_mode='factored' (same agent-sharded spec either way; 'auto'
    is disallowed here — the operand's identity must be explicit). solver_dtype (e.g.
    'bfloat16') stores the local scan carry narrow, exactly like the dense path.
    Returns Y [K,B,P,n]. B must divide by the data axis, P by the agent axis.

    final_only=True returns just the final iterate y [B,P,n] with NO stacked
    per-iteration output in the scan — the serving fast path (mirrors the dense
    `UnfoldedDLASSO.apply_final`, measured +26% on the dense path): XLA's DCE of a
    stacked-but-only-[-1]-consumed scan output is not guaranteed, so the K
    snapshot writes are structurally absent rather than hopefully elided.
    """
    if gram_mode not in ("gram", "factored"):
        raise ValueError("sharded unroll needs an explicit gram_mode: 'gram' or 'factored'")
    n_agent_shards = mesh.shape[AGENT_AXIS]
    if schedule == "allgather":
        consensus_fn = consensus_lib.consensus_allgather
    elif schedule == "ppermute":
        consensus_fn = functools.partial(
            consensus_lib.consensus_ppermute, num_shards=n_agent_shards
        )
    else:
        raise ValueError(f"unknown consensus schedule {schedule!r}")

    state_spec = dadmm_core.SolverState(
        y=P(DATA_AXIS, AGENT_AXIS), U=P(DATA_AXIS, AGENT_AXIS), delta=P(DATA_AXIS, AGENT_AXIS)
    )

    def local_unroll(state, hyp_table, op, Atb, adj_rows):
        # Everything here sees LOCAL blocks: y [Bl, Pl, n], adj_rows [Bl, Pl, P].
        deg = jnp.sum(adj_rows, axis=-1)  # full rows present -> true global degrees
        gram_fn = dadmm_core.make_gram_fn(
            op if gram_mode == "gram" else None,
            op if gram_mode == "factored" else None,
            gram_mode,
            matmul_dtype,
        )
        state, Atb = dadmm_core.cast_solver_dtype(state, Atb, solver_dtype)

        def body(carry, xs):
            st, k = carry, xs[0]
            hyp_k = xs[1]
            alpha = hyp_k[None, :, 0:1]
            tau = hyp_k[None, :, 1:2]
            rho = hyp_k[None, :, 2:3]
            eta = hyp_k[None, :, 3:4]
            AtAy = gram_fn(st.y)
            nxt = dadmm_core.dadmm_step(
                st, AtAy, Atb, deg, alpha, tau, rho, eta,
                clamp_fn(k), adj_rows,
                consensus_fn=lambda _adj, y: consensus_fn(adj_rows, y),
                nan_guard=nan_guard,
                finite_fn=_collective_finite_fn,
            )
            return nxt, (None if final_only else nxt.y)

        if remat:
            body = jax.checkpoint(body)
        K = hyp_table.shape[0]
        ks = jnp.arange(K, dtype=jnp.float32)
        st_fin, Y = lax.scan(body, state, (ks, hyp_table))
        return st_fin.y if final_only else Y

    shard_fn = jax.shard_map(
        local_unroll,
        mesh=mesh,
        in_specs=(
            state_spec,
            P(None, AGENT_AXIS),        # hyp_table [K, P, 4]
            P(AGENT_AXIS),              # op: AtA [P, n, n] or A [P, m, n]
            P(DATA_AXIS, AGENT_AXIS),   # Atb
            P(DATA_AXIS, AGENT_AXIS, None),  # adj rows: last dim replicated
        ),
        out_specs=(P(DATA_AXIS, AGENT_AXIS) if final_only
                   else P(None, DATA_AXIS, AGENT_AXIS)),
        check_vma=False,
    )
    return jax.jit(shard_fn)


def make_sharded_unroll_packed(
    mesh: Mesh,
    schedule: str = "ppermute",
    clamp_fn: Callable = dadmm_core.unfolded_clamps,
    nan_guard: bool = True,
    remat: bool = True,
    gram_mode: str = "factored",
    solver_dtype=None,
):
    """Packed-topology sharded unroll: each device stores only its LOCAL agent rows'
    neighbor lists — O(Pl * D) topology bytes per shard instead of the dense path's
    O(Pl * P) replicated adjacency rows (`make_sharded_unroll` in_specs
    `P(DATA, AGENT, None)`). The pod-scale form SURVEY section 7 calls for: at
    P=1024 on ER graphs D ~ log P, so consensus work drops from O(P^2 n) to
    O(P D n) and per-device topology memory by ~P/D.

    Returns a jitted `(state, hyp_table, op, Atb, packed) -> Y` where `packed` is an
    `ops.topology.ShardedPackedTopology` (global agent order; axis 1 sharded over the
    agent axis). Schedules:
      - 'ppermute': ring halo exchange, O(Pl n) peak visiting state — nothing scales
        with global P (the true pod-scale schedule).
      - 'allgather': gather the primal once, packed-gather locally — best when P*n
        fits comfortably (mirrors the dense allgather default).
    Reference topology analogue: neighbor lists at `DADMM_utils.py:40-56`.
    """
    from ..ops import topology as topo_lib

    if gram_mode not in ("gram", "factored"):
        raise ValueError("sharded unroll needs an explicit gram_mode: 'gram' or 'factored'")
    if schedule not in ("ppermute", "allgather"):
        raise ValueError(f"unknown consensus schedule {schedule!r}")
    n_agent_shards = mesh.shape[AGENT_AXIS]

    state_spec = dadmm_core.SolverState(
        y=P(DATA_AXIS, AGENT_AXIS), U=P(DATA_AXIS, AGENT_AXIS), delta=P(DATA_AXIS, AGENT_AXIS)
    )
    packed_spec = topo_lib.ShardedPackedTopology(
        nbr_shard=P(DATA_AXIS, AGENT_AXIS), nbr_local=P(DATA_AXIS, AGENT_AXIS),
        mask=P(DATA_AXIS, AGENT_AXIS), deg=P(DATA_AXIS, AGENT_AXIS),
    )

    def local_unroll(state, hyp_table, op, Atb, packed):
        Pl = packed.nbr_shard.shape[1]

        if schedule == "ppermute":
            def consensus(y_local):
                return topo_lib.consensus_ring_packed(
                    packed.nbr_shard, packed.nbr_local, packed.mask, packed.deg,
                    y_local, num_shards=n_agent_shards, axis_name=AGENT_AXIS,
                )
        else:
            nbr_global = packed.nbr_shard * Pl + packed.nbr_local   # [B, Pl, D]

            def consensus(y_local):
                y_all = lax.all_gather(y_local, AGENT_AXIS, axis=0)  # [s, B, Pl, n]
                s, B, _, n = y_all.shape
                y_full = jnp.moveaxis(y_all, 0, 1).reshape(B, s * Pl, n)
                b_ix = jnp.arange(B)[:, None]
                acc = jnp.zeros_like(y_local)
                for d in range(nbr_global.shape[-1]):
                    g = y_full[b_ix, nbr_global[:, :, d]]
                    acc = acc + packed.mask[:, :, d][..., None] * g
                return 2.0 * (packed.deg[..., None] * y_local - acc)

        gram_fn = dadmm_core.make_gram_fn(
            op if gram_mode == "gram" else None,
            op if gram_mode == "factored" else None,
            gram_mode,
        )
        state, Atb = dadmm_core.cast_solver_dtype(state, Atb, solver_dtype)

        def body(carry, xs):
            st, k = carry, xs[0]
            hyp_k = xs[1]
            alpha = hyp_k[None, :, 0:1]
            tau = hyp_k[None, :, 1:2]
            rho = hyp_k[None, :, 2:3]
            eta = hyp_k[None, :, 3:4]
            AtAy = gram_fn(st.y)
            nxt = dadmm_core.dadmm_step(
                st, AtAy, Atb, packed.deg, alpha, tau, rho, eta,
                clamp_fn(k), None,
                consensus_fn=lambda _adj, y: consensus(y),
                nan_guard=nan_guard,
                finite_fn=_collective_finite_fn,
            )
            return nxt, nxt.y

        if remat:
            body = jax.checkpoint(body)
        K = hyp_table.shape[0]
        ks = jnp.arange(K, dtype=jnp.float32)
        _, Y = lax.scan(body, state, (ks, hyp_table))
        return Y

    shard_fn = jax.shard_map(
        local_unroll,
        mesh=mesh,
        in_specs=(
            state_spec,
            P(None, AGENT_AXIS),        # hyp_table [K, P, 4]
            P(AGENT_AXIS),              # op: AtA [P, n, n] or A [P, m, n]
            P(DATA_AXIS, AGENT_AXIS),   # Atb
            packed_spec,                # O(Pl * D) per shard
        ),
        out_specs=P(None, DATA_AXIS, AGENT_AXIS),
        check_vma=False,
    )
    return jax.jit(shard_fn)


def make_sharded_unroll_halo(
    mesh: Mesh,
    halo_topo,
    clamp_fn: Callable = dadmm_core.unfolded_clamps,
    nan_guard: bool = True,
    remat: bool = True,
    gram_mode: str = "factored",
    solver_dtype=None,
    matmul_dtype=None,
    final_only: bool = False,
    comm_dtype: str | None = None,
):
    """Edge-cut halo-exchange sharded unroll (`parallel/halo.py`): consensus ships
    only the BOUNDARY rows each neighbor shard actually reads — per-device bytes
    drop from the packed ring's (s-1)*B*Pl*n to B*sum_t(H_t)*n, proportional to
    the realized edge cut (6.3x fewer on partitioned geometric graphs at P=1024,
    1.34x on degree-12 ER expanders — results_parity/scaling_projection.json).
    `comm_dtype` ('bfloat16' | 'int8') compresses the WIRE format of the
    exchanged boundary rows only — the inexact-consensus lever for expander
    graphs (accuracy impact measured in results_parity/halo_quantization.json).

    `halo_topo` is a `halo.HaloTopology` built host-side from adjacency ALREADY in
    partition order (`halo.greedy_equal_partition` + `halo.permute_agents` +
    `halo.build_halo`); the returned jitted
    `(state, hyp_table, op, Atb, halo_topo) -> Y` expects every agent-indexed
    operand permuted the same way (un-permute outputs with
    `halo.inverse_perm`). Same numerics as the dense unroll to float tolerance
    (tests/test_halo.py). Reference consensus loop: `unfolded_DLASSO.py:127-140`.
    """
    from . import halo as halo_lib

    if gram_mode not in ("gram", "factored"):
        raise ValueError("sharded unroll needs an explicit gram_mode: 'gram' or 'factored'")
    n_agent_shards = mesh.shape[AGENT_AXIS]

    state_spec = dadmm_core.SolverState(
        y=P(DATA_AXIS, AGENT_AXIS), U=P(DATA_AXIS, AGENT_AXIS), delta=P(DATA_AXIS, AGENT_AXIS)
    )

    def local_unroll(state, hyp_table, op, Atb, halo):
        def consensus(y_local):
            return halo_lib.halo_consensus_delta(
                halo, y_local, num_shards=n_agent_shards, axis_name=AGENT_AXIS,
                comm_dtype=comm_dtype)

        gram_fn = dadmm_core.make_gram_fn(
            op if gram_mode == "gram" else None,
            op if gram_mode == "factored" else None,
            gram_mode,
            matmul_dtype,
        )
        state, Atb = dadmm_core.cast_solver_dtype(state, Atb, solver_dtype)

        def body(carry, xs):
            st, k = carry, xs[0]
            hyp_k = xs[1]
            alpha = hyp_k[None, :, 0:1]
            tau = hyp_k[None, :, 1:2]
            rho = hyp_k[None, :, 2:3]
            eta = hyp_k[None, :, 3:4]
            AtAy = gram_fn(st.y)
            nxt = dadmm_core.dadmm_step(
                st, AtAy, Atb, halo.deg, alpha, tau, rho, eta,
                clamp_fn(k), None,
                consensus_fn=lambda _adj, y: consensus(y),
                nan_guard=nan_guard,
                finite_fn=_collective_finite_fn,
            )
            return nxt, (None if final_only else nxt.y)

        if remat:
            body = jax.checkpoint(body)
        K = hyp_table.shape[0]
        ks = jnp.arange(K, dtype=jnp.float32)
        st_fin, Y = lax.scan(body, state, (ks, hyp_table))
        return st_fin.y if final_only else Y

    shard_fn = jax.shard_map(
        local_unroll,
        mesh=mesh,
        in_specs=(
            state_spec,
            P(None, AGENT_AXIS),        # hyp_table [K, P, 4]
            P(AGENT_AXIS),              # op: AtA [P, n, n] or A [P, m, n]
            P(DATA_AXIS, AGENT_AXIS),   # Atb
            halo_topo.spec(),           # O(Pl*D + sum H_t) per shard
        ),
        out_specs=(P(DATA_AXIS, AGENT_AXIS) if final_only
                   else P(None, DATA_AXIS, AGENT_AXIS)),
        check_vma=False,
    )
    return jax.jit(shard_fn)


def make_sharded_dlr_ghyp_unroll(
    mesh: Mesh,
    model,
    schedule: str = "allgather",
    remat: bool = True,
):
    """Agent/data-sharded one-shot dlr hypernetwork tiers (GHyp1 / GHyp1c —
    `models/unfolded_dlr.py:DLRGNNHypOneShot[Corrected]`).

    The one-shot table is a SINGLE tiny GNN evaluation over [B, P, h] features
    (O(B*P*h) — never solver-state-sized), so it runs densely replicated; the
    K-iteration unroll, where all the state and FLOPs live, runs shard_map'd with
    collective neighbor sums. GHyp1c's per-iteration corrector is per-agent local
    and runs inside the shard ('same' mode pools via pmean over the agent axis —
    `make_step_fn(agent_axis=...)`).

    Why the state-conditioned DLRGNNHyp tier is NOT here: its decoder is the
    reference-faithful flattened head (out_dim = 6*P from a pooled feature vector,
    `models/unfolded_dlr.py:DLRGNNHyp.__init__`), which consumes a global tensor
    every iteration — the same reason the dlasso flagship only agent-shards with
    `decoder_type='nodewise'` (`parallel/gnn_sharded.py`). It data-shards via GSPMD.

    Returns a jitted `(params, key, x, y, adj, training=False) ->
    (final DLRState, per_kp [K, P])` matching `model.apply_losses` semantics.
    """
    from ..models import unfolded_dlr

    n_agent_shards = mesh.shape[AGENT_AXIS]
    if schedule == "allgather":
        nsum = consensus_lib.neighbor_sum_allgather
    elif schedule == "ppermute":
        nsum = functools.partial(
            consensus_lib.neighbor_sum_ppermute, num_shards=n_agent_shards
        )
    else:
        raise ValueError(f"unknown consensus schedule {schedule!r}")

    state_spec = unfolded_dlr.DLRState(
        a=P(DATA_AXIS, AGENT_AXIS), w=P(DATA_AXIS, AGENT_AXIS),
        mu=P(DATA_AXIS, AGENT_AXIS), lamda=P(DATA_AXIS, AGENT_AXIS),
    )
    # per-sample table [B, K, Pp, 6]: 'same' mode has Pp=1 (replicated over agents)
    table_spec = (P(DATA_AXIS, None, None) if model.Pp == 1
                  else P(DATA_AXIS, None, AGENT_AXIS))
    agent_axis = AGENT_AXIS if n_agent_shards > 1 else None

    def local_unroll(params, state, table, x, y, adj_rows):
        st, per_kp = unfolded_dlr.unroll_table(
            state, table, x, y, adj_rows, remat=remat,
            neighbor_fn=lambda v: nsum(adj_rows, v),
            step_hyp_fn=model.make_step_fn(params, agent_axis=agent_axis),
        )
        per_kp = lax.pmean(per_kp, DATA_AXIS)
        per_kp = lax.all_gather(per_kp, AGENT_AXIS, axis=1)    # [K, s, Pl]
        return st, per_kp.reshape(per_kp.shape[0], -1)         # [K, P]

    shard_fn = jax.shard_map(
        local_unroll,
        mesh=mesh,
        in_specs=(
            P(),                             # params (replicated; corrector weights)
            state_spec,
            table_spec,
            P(DATA_AXIS, AGENT_AXIS),        # x [B, P, d]
            P(DATA_AXIS, AGENT_AXIS),        # y [B, P, 1]
            P(DATA_AXIS, AGENT_AXIS, None),  # adj rows
        ),
        out_specs=(state_spec, P()),
        check_vma=False,
    )

    def run(params, key, x, y, adj, training=False):
        table = model.table(params, x, y, adj, training=training)  # [B, K, Pp, 6]
        st0 = unfolded_dlr.init_state(key, x.shape[0], model.P, model.d,
                                      dtype=x.dtype)
        return shard_fn(params, st0, table, x, y, adj)

    return jax.jit(run, static_argnames="training")


def make_sharded_dlr_unroll(
    mesh: Mesh,
    schedule: str = "allgather",
    remat: bool = True,
):
    """Agent/data-sharded unfolded dlr solver (beyond-reference family —
    models/unfolded_dlr.py): build a jitted
    `(state, hyp_table, x, y, adj) -> (final state, per_kp [K, P])` over `mesh`.

    State fields a/w/mu/lamda and the observations x/y shard [B, P, ...] over
    (data, agents); the dlr's neighbor sums (`sum_N(a)`, `sum_N(w)`) become the
    plain neighbor-sum collectives (`consensus.neighbor_sum_*`). Per-agent MSEs are
    psum-averaged over the data axis and gathered over agents so every device
    returns the same [K, P].
    """
    from ..models import unfolded_dlr

    n_agent_shards = mesh.shape[AGENT_AXIS]
    if schedule == "allgather":
        nsum = consensus_lib.neighbor_sum_allgather
    elif schedule == "ppermute":
        nsum = functools.partial(
            consensus_lib.neighbor_sum_ppermute, num_shards=n_agent_shards
        )
    else:
        raise ValueError(f"unknown consensus schedule {schedule!r}")

    state_spec = unfolded_dlr.DLRState(
        a=P(DATA_AXIS, AGENT_AXIS), w=P(DATA_AXIS, AGENT_AXIS),
        mu=P(DATA_AXIS, AGENT_AXIS), lamda=P(DATA_AXIS, AGENT_AXIS),
    )

    def local_unroll(state, hyp_table, x, y, adj_rows):
        st, per_kp = unfolded_dlr.unroll_table(
            state, hyp_table, x, y, adj_rows, remat=remat,
            neighbor_fn=lambda v: nsum(adj_rows, v),
        )
        # per_kp is the local agents' MSE over the LOCAL batch shard: average over
        # the data axis, then gather agent blocks so outputs are replicated.
        per_kp = lax.pmean(per_kp, DATA_AXIS)
        per_kp = lax.all_gather(per_kp, AGENT_AXIS, axis=1)    # [K, s, Pl]
        per_kp = per_kp.reshape(per_kp.shape[0], -1)           # [K, P]
        return st, per_kp

    shard_fn = jax.shard_map(
        local_unroll,
        mesh=mesh,
        in_specs=(
            state_spec,
            P(None, AGENT_AXIS),             # hyp_table [K, P, 6]
            P(DATA_AXIS, AGENT_AXIS),        # x [B, P, d]
            P(DATA_AXIS, AGENT_AXIS),        # y [B, P, 1]
            P(DATA_AXIS, AGENT_AXIS, None),  # adj rows
        ),
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    return jax.jit(shard_fn)
