"""Unfolded D-ADMM iteration core (Jacobi form), as pure JAX functions.

One D-ADMM iteration per agent p, per scenario (reference `unfolded_DLASSO.py:69-99`
and `gnn_dlasso_models_progressive.py:199-232`):

    g      = A_p^T A_p y_p - A_p^T b_p + tau * sign(y_p) + deg_p * U_p + rho * delta_p
    y_p   <- clamp(y_p - alpha * g)
    delta  = 2 * L @ y        (neighbor consensus; graph-Laplacian exchange)
    U_p   <- clamp(U_p + eta * delta_p)

Everything is batched: states are `[B, P, n]`, the per-agent matvec is one einsum on the
MXU, and consensus is a batched Laplacian matmul (`ops/graphs.py:consensus_delta`) or a
collective-backed callable injected by `parallel/`. The K-iteration unroll is a
`lax.scan` with optional rematerialization; the clamp ladders and NaN-reset guards of the
reference are reproduced exactly (flag-gated) so loss trajectories can be matched.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import graphs as graph_ops
from ..ops import sensing


class SolverState(NamedTuple):
    y: jax.Array      # primal iterate        [B, P, n]
    U: jax.Array      # dual variable         [B, P, n]
    delta: jax.Array  # consensus residual    [B, P, n]


class Clamps(NamedTuple):
    """Per-iteration clamp ladder. `delta` is None when delta is unclamped."""
    grad: jax.Array
    value: jax.Array
    delta: Optional[jax.Array]
    dual: jax.Array


def unfolded_clamps(k) -> Clamps:
    """Adaptive ladder of the scalar-table model (`unfolded_DLASSO.py:80,92`):
    grad +-max(1, 30-k); values +-max(10, 200-3k); delta unclamped; dual same as value."""
    k = jnp.asarray(k, jnp.float32)
    grad = jnp.maximum(1.0, 30.0 - k)
    val = jnp.maximum(10.0, 200.0 - 3.0 * k)
    return Clamps(grad=grad, value=val, delta=None, dual=val)


def gnn_clamps(k) -> Clamps:
    """Fixed ladder of the GNN-hypernetwork model
    (`gnn_dlasso_models_progressive.py:212-232`)."""
    del k
    one = jnp.float32(1.0)
    return Clamps(grad=10.0 * one, value=100.0 * one, delta=20.0 * one, dual=100.0 * one)


def init_state(key: jax.Array, batch: int, P: int, n: int, dtype=jnp.float32) -> SolverState:
    """Small random init, `1e-2 * N(0,1)` (`unfolded_DLASSO.py:49-51`)."""
    ky, ku, kd = jax.random.split(key, 3)
    shape = (batch, P, n)
    return SolverState(
        y=1e-2 * jax.random.normal(ky, shape, dtype),
        U=1e-2 * jax.random.normal(ku, shape, dtype),
        delta=1e-2 * jax.random.normal(kd, shape, dtype),
    )


def gram_matvec(AtA: jax.Array, y: jax.Array, matmul_dtype=None) -> jax.Array:
    """`A_p^T A_p y_p` batched over agents: AtA [P,n,n], y [B,P,n] -> [B,P,n].

    Replaces the reference per-agent loop (`unfolded_DLASSO.py:69-71`) with one einsum.
    `matmul_dtype='bfloat16'` feeds the MXU in bf16 with f32 accumulation (2x MXU
    throughput; iterate/output precision stays f32).
    """
    if matmul_dtype is not None:
        dt = jnp.dtype(matmul_dtype)
        return jnp.einsum(
            "pij,bpj->bpi", AtA.astype(dt), y.astype(dt),
            preferred_element_type=jnp.float32,
        ).astype(y.dtype)
    return jnp.einsum("pij,bpj->bpi", AtA, y)


def make_gram_fn(
    AtA: Optional[jax.Array],
    A: Optional[jax.Array],
    gram_mode: str = "gram",
    matmul_dtype=None,
) -> Callable[[jax.Array], jax.Array]:
    """Build the `y -> A^T A y` operator used inside every iteration.

    gram_mode:
      - 'gram':     precomputed Gram stream, `AtA [P,n,n] @ y` — the reference's
                    form (`unfolded_DLASSO.py:16,69-71`); bit-matches parity tests.
      - 'factored': `A^T (A y)` with A [P,m,n] — same math up to fp association,
                    but 2m/n of the FLOPs and m/n of the per-iteration HBM weight
                    traffic. Wins whenever 2m < n (reference shapes: m=100, n=500).
      - 'auto':     'factored' when A is available and 2m < n, else 'gram'.
    """
    if gram_mode not in ("gram", "factored", "auto"):
        raise ValueError(f"unknown gram_mode {gram_mode!r}")
    use_factored = gram_mode == "factored" or (
        gram_mode == "auto" and A is not None and 2 * A.shape[-2] < A.shape[-1]
    )
    if use_factored:
        if A is None:
            raise ValueError("gram_mode='factored' requires the sensing matrix A")
        if matmul_dtype is not None:
            dt = jnp.dtype(matmul_dtype)
            A_lo = A.astype(dt)

            def factored_lo(y: jax.Array) -> jax.Array:
                Ay = jnp.einsum(
                    "pmn,bpn->bpm", A_lo, y.astype(dt),
                    preferred_element_type=jnp.float32,
                )
                return jnp.einsum(
                    "pmn,bpm->bpn", A_lo, Ay.astype(dt),
                    preferred_element_type=jnp.float32,
                ).astype(y.dtype)

            return factored_lo

        return lambda y: sensing.At_apply(A, sensing.A_apply(A, y))
    if AtA is None:
        raise ValueError("gram_mode='gram' requires the precomputed Gram AtA")
    return lambda y: gram_matvec(AtA, y, matmul_dtype)


def default_finite_fn(x: jax.Array) -> jax.Array:
    """Scalar 'is the whole tensor finite'. Sharded callers substitute a collective
    version so the reset decision agrees across shards.

    Implemented as `isfinite(sum(x))` rather than `all(isfinite(x))`: a sum is NaN/Inf
    iff the tensor holds any NaN/Inf *or* overflows — and overflow is impossible here
    because every guarded tensor is clamp-bounded (|x| <= 200, |grad| <= its ladder),
    so the decisions are identical while the reduction fuses into the surrounding
    elementwise graph (~35% faster guarded iteration, measured)."""
    return jnp.isfinite(jnp.sum(x))


def _reset_if_nonfinite(x: jax.Array, fallback: jax.Array, finite_fn=default_finite_fn) -> jax.Array:
    """Whole-tensor reset when ANY entry is non-finite, matching the reference guards
    (`unfolded_DLASSO.py:55-61,84-87,102-104`).

    Measured (v5e, P=64 benchmark shape): `jnp.where` with a scalar predicate fuses
    into the surrounding elementwise graph (1833 iter/s guarded vs 2491 unguarded);
    a `lax.cond` branch looks cheaper on paper but serializes the pipeline and more
    than halves throughput (841 iter/s) — keep the select.
    """
    ok = finite_fn(x)
    return jnp.where(ok, x, fallback)


def cast_solver_dtype(state: SolverState, Atb: jax.Array, solver_dtype):
    """Cast the scan carry (and Atb, which is read every iteration) to the serving
    dtype; no-op when solver_dtype is None. Single definition for the dense,
    loss-reducing, and sharded unrolls."""
    if solver_dtype is None:
        return state, Atb
    sd = jnp.dtype(solver_dtype)
    return SolverState(*(x.astype(sd) for x in state)), Atb.astype(sd)


ConsensusFn = Callable[[jax.Array, jax.Array], jax.Array]


def resolve_remat_policy(name):
    """Map a config string to a jax.checkpoint rematerialization policy.

    - None/"full": recompute everything in the backward (max memory savings —
      the default, optimal when the workload is HBM-bound: PARITY.md training
      ablation showed storing ALL activations is slower).
    - "dots": `dots_saveable` — save matmul/einsum OUTPUTS (the Gram matvec and
      the consensus matmul, i.e. the FLOPs) and recompute only elementwise ops.
      Trades ~one state-sized HBM write+read per dot for skipping its recompute.
    """
    if name in (None, "", "none", "full"):
        return None
    policies = {
        "dots": jax.checkpoint_policies.dots_saveable,
        "dots_no_batch": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    }
    if name not in policies:
        raise ValueError(f"unknown remat policy {name!r}; one of "
                         f"{['full'] + sorted(policies)}")
    return policies[name]


def _scan_iterations(body, state, hyp_table: jax.Array, remat: bool,
                     remat_policy=None):
    """Shared K-scan plumbing: optional remat on the body (with an optional
    checkpoint policy — see `resolve_remat_policy`), scanned over
    `(k, hyp_table[k])`, returning the stacked per-iteration outputs."""
    if remat:
        policy = (resolve_remat_policy(remat_policy)
                  if isinstance(remat_policy, (str, type(None))) else remat_policy)
        body = jax.checkpoint(body, policy=policy)
    K = hyp_table.shape[0]
    ks = jnp.arange(K, dtype=jnp.float32)
    _, outs = jax.lax.scan(body, state, (ks, hyp_table))
    return outs


def dadmm_step(
    state: SolverState,
    AtAy: jax.Array,
    Atb: jax.Array,
    deg: jax.Array,
    alpha: jax.Array,
    tau: jax.Array,
    rho: jax.Array,
    eta: jax.Array,
    clamps: Clamps,
    adj: jax.Array,
    consensus_fn: ConsensusFn = graph_ops.consensus_delta,
    nan_guard: bool = True,
    finite_fn=default_finite_fn,
) -> SolverState:
    """One Jacobi D-ADMM iteration.

    Hyperparameters broadcast against `[B, P, n]` (shape `[B_or_1, P_or_1, 1]`).
    `AtAy` is passed in (not computed here) so hypernetwork callers can reuse it as the
    conditioning feature without a second Gram matvec.
    """
    y, U, delta = state
    dt = y.dtype  # keep the scan carry in the caller's solver dtype (bf16 halves
    #               the per-iteration HBM state traffic; intermediates may promote
    #               to f32 in registers, which fuses away)
    if nan_guard:
        y = _reset_if_nonfinite(y, jnp.zeros_like(y), finite_fn)
        U = _reset_if_nonfinite(U, jnp.zeros_like(U), finite_fn)

    grad = AtAy - Atb + jnp.sign(y) * tau + U * deg[..., None] + delta * rho
    grad = jnp.clip(grad, -clamps.grad, clamps.grad)
    if nan_guard:
        grad = _reset_if_nonfinite(grad, jnp.zeros_like(grad), finite_fn)

    y_next = jnp.clip(y - alpha * grad, -clamps.value, clamps.value).astype(dt)

    delta_next = consensus_fn(adj, y_next)
    if clamps.delta is not None:
        delta_next = jnp.clip(delta_next, -clamps.delta, clamps.delta)
    delta_next = delta_next.astype(dt)

    U_next = jnp.clip(U + eta * delta_next, -clamps.dual, clamps.dual).astype(dt)

    if nan_guard:
        y_next = _reset_if_nonfinite(y_next, y.astype(dt), finite_fn)
    return SolverState(y=y_next, U=U_next, delta=delta_next)


def unroll_table(
    state: SolverState,
    hyp_table: jax.Array,
    AtA: jax.Array,
    Atb: jax.Array,
    adj: jax.Array,
    clamp_fn: Callable[[jax.Array], Clamps] = unfolded_clamps,
    consensus_fn: ConsensusFn = graph_ops.consensus_delta,
    nan_guard: bool = True,
    remat: bool = True,
    use_pallas: bool = False,
    matmul_dtype=None,
    A: Optional[jax.Array] = None,
    gram_mode: str = "gram",
    solver_dtype=None,
    topo=None,
) -> jax.Array:
    """Scan K iterations driven by a precomputed hyperparameter table.

    hyp_table: [K, Pp, 4] with Pp in {1, P}, columns (alpha, tau, rho, eta) — the output
    of `models.seq_hyperparam` for every k at once. Returns the stacked per-iteration
    primal iterates `Y [K, B, P, n]` (reference `unfolded_DLASSO.py:107-110`).

    topo: an `ops.topology.PackedTopology` replaces the dense adjacency entirely
    (pass adj=None): consensus becomes the packed gather form — O(P·D·n) instead of
    O(P²·n) — the pod-scale (P=1024+) representation. Ignored by use_pallas.

    use_pallas routes the primal update through the fused TPU kernel
    (`kernels/fused_iteration.py`); the consensus + dual steps stay in XLA (and
    ignores gram_mode/solver_dtype — the kernel owns its own layout). The
    mid-iteration grad NaN-guard collapses into the terminal y guard on that path.

    solver_dtype (e.g. 'bfloat16') stores the scan carry — y/U/delta and Atb — in a
    narrower dtype, halving the dominant per-iteration HBM state traffic. The
    trajectory diverges from f32 through the sign() discontinuity (any precision
    change does); use for throughput-critical inference where solution quality, not
    trajectory parity, is the bar — and gate on NMSE (see bench.py).
    """
    if topo is not None:
        if use_pallas:
            raise ValueError("use_pallas and packed topology are mutually exclusive "
                             "(the fused kernel owns its own dense layout)")
        from ..ops import topology as topo_lib

        deg = topo.deg
        consensus_fn = lambda _adj, y: topo_lib.consensus_delta(topo, y)  # noqa: E731
    else:
        deg = graph_ops.degrees(adj)
        P = adj.shape[-1]
    if not use_pallas:
        state, Atb = cast_solver_dtype(state, Atb, solver_dtype)

    if use_pallas:
        # Entire unroll runs in [P, B, n] layout (one transpose in, one out) so the
        # fused kernel's grid layout never forces per-iteration HBM transposes.
        from ..kernels.fused_iteration import fused_primal_update_pbn

        t = lambda x: jnp.transpose(x, (1, 0, 2))  # [B,P,n] <-> [P,B,n]
        Atb_t = t(Atb)
        deg_t = jnp.transpose(deg)                  # [P, B]
        state = SolverState(y=t(state.y), U=t(state.U), delta=t(state.delta))

        def consensus_pbn(y_t):
            # delta = 2*(deg*y - adj@y) in [P,B,n]: contract adj against the agent dim.
            neigh = jnp.einsum("bpq,qbn->pbn", adj, y_t)
            return 2.0 * (deg_t[..., None] * y_t - neigh)

        def body(carry, xs):
            st, k = carry, xs[0]
            hyp_k = jnp.broadcast_to(xs[1], (P, 4))
            y, U, delta = st
            if nan_guard:
                y = _reset_if_nonfinite(y, jnp.zeros_like(y))
                U = _reset_if_nonfinite(U, jnp.zeros_like(U))
            c = clamp_fn(k)
            clips = jnp.stack([c.grad, c.value])
            y_next = fused_primal_update_pbn(AtA, y, U, delta, Atb_t, deg_t, hyp_k, clips)
            delta_next = consensus_pbn(y_next)
            if c.delta is not None:
                delta_next = jnp.clip(delta_next, -c.delta, c.delta)
            eta = hyp_k[:, 3][:, None, None]
            U_next = jnp.clip(U + eta * delta_next, -c.dual, c.dual)
            if nan_guard:
                y_next = _reset_if_nonfinite(y_next, y)
            nxt = SolverState(y=y_next, U=U_next, delta=delta_next)
            return nxt, nxt.y

        Y_t = _scan_iterations(body, state, hyp_table, remat)
        return jnp.transpose(Y_t, (0, 2, 1, 3))    # [K,P,B,n] -> [K,B,P,n]

    gram_fn = make_gram_fn(AtA, A, gram_mode, matmul_dtype)

    def body(carry, xs):
        st, k = carry, xs[0]
        hyp_k = xs[1]  # [Pp, 4]
        alpha = hyp_k[None, :, 0:1]
        tau = hyp_k[None, :, 1:2]
        rho = hyp_k[None, :, 2:3]
        eta = hyp_k[None, :, 3:4]
        AtAy = gram_fn(st.y)
        nxt = dadmm_step(
            st, AtAy, Atb, deg, alpha, tau, rho, eta,
            clamp_fn(k), adj, consensus_fn, nan_guard,
        )
        return nxt, nxt.y

    return _scan_iterations(body, state, hyp_table, remat)


def unroll_table_final(
    state: SolverState,
    hyp_table: jax.Array,
    AtA: jax.Array,
    Atb: jax.Array,
    adj: jax.Array,
    clamp_fn: Callable[[jax.Array], Clamps] = unfolded_clamps,
    consensus_fn: ConsensusFn = graph_ops.consensus_delta,
    nan_guard: bool = True,
    matmul_dtype=None,
    A: Optional[jax.Array] = None,
    gram_mode: str = "gram",
    solver_dtype=None,
    topo=None,
) -> jax.Array:
    """Serving fast path: the K-iteration unroll emitting ONLY the final iterate
    `y [B, P, n]` — no per-iteration Y materialization.

    Measured (v5e, P=64 B=256 n=512 K=15, bf16 state + factored operand): 4,685
    iter/s vs 3,721 for the stacked-Y unroll — the per-iteration [B,P,n] snapshot
    write is ~20% of the iteration's HBM traffic, and serving (`cli/serve.py:solve`,
    `cli/evaluate` NMSE) only ever consumes Y[-1]. Same trajectory as
    `unroll_table(...)[-1]` (tested). No remat knob: there is no backward pass to
    rematerialize for."""
    if topo is not None:
        from ..ops import topology as topo_lib

        deg = topo.deg
        consensus_fn = lambda _adj, y: topo_lib.consensus_delta(topo, y)  # noqa: E731
    else:
        deg = graph_ops.degrees(adj)
    gram_fn = make_gram_fn(AtA, A, gram_mode, matmul_dtype)
    state, Atb = cast_solver_dtype(state, Atb, solver_dtype)

    def body(carry, xs):
        st, k = carry, xs[0]
        hyp_k = xs[1]
        alpha = hyp_k[None, :, 0:1]
        tau = hyp_k[None, :, 1:2]
        rho = hyp_k[None, :, 2:3]
        eta = hyp_k[None, :, 3:4]
        AtAy = gram_fn(st.y)
        nxt = dadmm_step(
            st, AtAy, Atb, deg, alpha, tau, rho, eta,
            clamp_fn(k), adj, consensus_fn, nan_guard,
        )
        return nxt, None

    K = hyp_table.shape[0]
    ks = jnp.arange(K, dtype=jnp.float32)
    last, _ = jax.lax.scan(body, state, (ks, hyp_table))
    return last.y


def unroll_table_losses(
    state: SolverState,
    hyp_table: jax.Array,
    AtA: jax.Array,
    Atb: jax.Array,
    adj: jax.Array,
    label: jax.Array,
    clamp_fn: Callable[[jax.Array], Clamps] = unfolded_clamps,
    consensus_fn: ConsensusFn = graph_ops.consensus_delta,
    nan_guard: bool = True,
    remat: bool = True,
    matmul_dtype=None,
    A: Optional[jax.Array] = None,
    gram_mode: str = "gram",
    solver_dtype=None,
    topo=None,
    remat_policy=None,
) -> jax.Array:
    """Like `unroll_table` but emits per-iteration per-agent MSEs `[K, P]` instead of
    the stacked iterates `Y [K, B, P, n]`. `topo` as in `unroll_table`.

    Training only needs the per-layer scalar losses (`train/losses.compute_loss`
    averages them), so materializing Y wastes one full state-sized HBM write+read per
    iteration in the forward and again in the backward; reducing inside the scan
    removes it. label [B, n]. Losses are always accumulated in float32 even under a
    narrow solver_dtype.
    """
    if topo is not None:
        from ..ops import topology as topo_lib

        deg = topo.deg
        consensus_fn = lambda _adj, y: topo_lib.consensus_delta(topo, y)  # noqa: E731
    else:
        deg = graph_ops.degrees(adj)
    gram_fn = make_gram_fn(AtA, A, gram_mode, matmul_dtype)
    state, Atb = cast_solver_dtype(state, Atb, solver_dtype)

    def body(carry, xs):
        st, k = carry, xs[0]
        hyp_k = xs[1]
        alpha = hyp_k[None, :, 0:1]
        tau = hyp_k[None, :, 1:2]
        rho = hyp_k[None, :, 2:3]
        eta = hyp_k[None, :, 3:4]
        AtAy = gram_fn(st.y)
        nxt = dadmm_step(
            st, AtAy, Atb, deg, alpha, tau, rho, eta,
            clamp_fn(k), adj, consensus_fn, nan_guard,
        )
        diff = (nxt.y - label[:, None, :]).astype(jnp.float32)
        per_p = jnp.mean(diff * diff, axis=(0, 2))   # [P]
        return nxt, per_p

    return _scan_iterations(body, state, hyp_table, remat, remat_policy)
