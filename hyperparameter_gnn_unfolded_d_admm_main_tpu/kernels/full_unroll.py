"""Pallas TPU kernel: the ENTIRE K-iteration D-ADMM unroll in one kernel.

Motivation (measured, see PARITY.md): the per-iteration XLA graph is HBM-bound — every
iteration re-reads/rewrites the y/U/delta/Atb state from HBM. This kernel holds the
full solver state for a batch tile *resident in VMEM across all K iterations*; the
recurring HBM traffic is the AtA stream (double-buffered DMA, one [n, n] Gram block per
agent per iteration) and one y-snapshot write per iteration.

Layout: everything inside the kernel is agent-leading `[P, Bt, n]` so every dynamic
index (agent p in the matvec loop, source agent q in the consensus loop) is a LEADING
-dimension or `pl.ds` slice — traced *middle*-dimension indexing miscompiles silently
on TPU for wide tiles (observed: exact at Bt=8, garbage at Bt=64). The host wrapper
pre-transposes inputs once per call and transposes the stacked output back.

Structure per program (grid over batch tiles of `block_b` scenarios):
    for k in range(K):                       # static unroll
        fori_loop over agents p:             # double-buffered DMA of AtA[p]
            AtAy[p] = y[p] @ AtA_p           # [Bt, n] @ [n, n] on the MXU
        grad  = AtAy - Atb + tau_k*sign(y) + deg*U + rho_k*delta   (vectorized, VPU)
        y     = clip(y - alpha_k * clip(grad, g_k), v_k)
        fori_loop over source agents q:      # consensus as broadcast FMAs
            neigh += adjP[:, :, q:q+1] * y[q]
        delta = 2*(deg*y - neigh)            (clipped when the ladder says so)
        U     = clip(U + eta_k*delta, d_k)
        DMA y -> Y_out[k, :, tile]

Semantics: identical to `dadmm_core.unroll_table` with `nan_guard=False` (the NaN
whole-tensor reset needs a cross-tile reduction; use the XLA path when you want the
reference's guard behavior) up to floating-point association: the consensus FMA loop
accumulates in a different order than the einsum dot products, and the sign()
discontinuity chaotically amplifies that ~1e-7 difference over many iterations — both
trajectories are equally valid solver runs. Gradients via custom VJP that recomputes
through the jnp unroll (the same recompute a remat'd scan performs).

Measured status (v5e single chip, see PARITY.md): correct, but SLOWER than the XLA
scan path at both benchmark shapes (P=8: 7.5k vs 10.5k iter/s; P=64: 0.2k vs 2.5k) —
Mosaic serializes the DMA waits and small-M matmuls that XLA's fused per-iteration
graph pipelines. XLA is within ~75% of the HBM roofline here, so this kernel is kept
as infrastructure (and as the template for a multi-chip RDMA variant), not wired into
the production paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import sensing


def _make_kernel(K: int, P: int, n: int, block_b: int):
    def kernel(hyp_ref, clip_ref, AtA_hbm, y0_hbm, U0_hbm, d0_hbm, Atb_hbm,
               adjQ_ref, Y_hbm, y_sc, U_sc, d_sc, atay_sc, neigh_sc, Atb_sc, ata_buf,
               dma_sems, out_sem):
        j = pl.program_id(0)
        # Load this batch tile's state/observations HBM -> VMEM scratch once (keeping
        # them as grid inputs would double-buffer four tile-sized VMEM blocks on top
        # of the scratch and blow the VMEM budget).
        tile = pl.ds(j * block_b, block_b)
        for src, dst in ((y0_hbm, y_sc), (U0_hbm, U_sc), (d0_hbm, d_sc), (Atb_hbm, Atb_sc)):
            cp = pltpu.make_async_copy(src.at[:, tile], dst, out_sem)
            cp.start()
            cp.wait()
        Atb = Atb_sc[:]
        # Degrees derived from the (full-row) adjacency block: deg[p,b] = sum_q adj.
        deg_bq = jnp.sum(adjQ_ref[:], axis=0)           # [Bt, P]: deg[b,p]
        deg = jnp.transpose(deg_bq)[..., None]         # [P, Bt, 1]

        def ata_dma(slot, p):
            return pltpu.make_async_copy(
                AtA_hbm.at[p], ata_buf.at[slot], dma_sems.at[slot]
            )

        for k in range(K):
            # ---- primal: per-agent Gram matvec with double-buffered AtA stream
            ata_dma(0, 0).start()

            def body(p, _):
                slot = jax.lax.rem(p, 2)
                nxt = jax.lax.rem(p + 1, 2)

                @pl.when(p + 1 < P)
                def _():
                    ata_dma(nxt, p + 1).start()

                ata_dma(slot, p).wait()
                atay_sc[p] = jnp.dot(
                    y_sc[p], ata_buf[slot], preferred_element_type=jnp.float32
                )
                return 0

            jax.lax.fori_loop(0, P, body, 0)

            hyp_k = hyp_ref[k]                         # [P, 4] (VMEM)
            alpha = hyp_k[:, 0][:, None, None]
            tau = hyp_k[:, 1][:, None, None]
            rho = hyp_k[:, 2][:, None, None]
            eta = hyp_k[:, 3][:, None, None]
            gclip = clip_ref[k, 0]
            vclip = clip_ref[k, 1]
            dclip = clip_ref[k, 2]
            uclip = clip_ref[k, 3]

            y = y_sc[:]
            grad = atay_sc[:] - Atb + jnp.sign(y) * tau + U_sc[:] * deg + d_sc[:] * rho
            grad = jnp.clip(grad, -gclip, gclip)
            y = jnp.clip(y - alpha * grad, -vclip, vclip)
            y_sc[:] = y

            # ---- consensus: neigh[p,b] = sum_q adj[b,p,q] y[q,b] as broadcast FMAs.
            # adjQ is source-agent-leading so every dynamic index is a leading-dim
            # ref read (lane/sublane dynamic slices don't lower).
            def cons(q, acc):
                w = jnp.transpose(adjQ_ref[q])         # [Bt, P] -> [P, Bt]
                return acc + w[..., None] * y_sc[q][None, :, :]

            neigh = jax.lax.fori_loop(0, P, cons, jnp.zeros_like(neigh_sc))
            neigh_sc[:] = neigh
            delta = 2.0 * (deg * y_sc[:] - neigh_sc[:])
            delta = jnp.clip(delta, -dclip, dclip)
            d_sc[:] = delta
            U_sc[:] = jnp.clip(U_sc[:] + eta * delta, -uclip, uclip)

            # ---- stream this iteration's snapshot out
            out_dma = pltpu.make_async_copy(
                y_sc, Y_hbm.at[k, :, tile], out_sem
            )
            out_dma.start()
            out_dma.wait()

    return kernel


def _pick_block_b(B: int, P: int, n: int) -> int:
    """Largest batch tile whose 6 state buffers + AtA double-buffer fit the VMEM
    budget. Bigger tiles mean fuller MXU rows in the per-agent matvec — at the
    reference's small-P shapes (P<=8, n=512) this reaches Bt=128 (full MXU); at
    P=64 it degrades to Bt=8 (where the XLA path wins; see PARITY.md)."""
    budget = 12 * 1024 * 1024 - 2 * n * n * 4
    for cand in (256, 128, 64, 32, 16, 8, 4, 2):
        if B % cand == 0 and 6 * cand * P * n * 4 <= budget:
            return cand
    return 0  # sentinel: nothing fits/divides -> caller takes the jnp fallback


def _jnp_unroll_with_matvec(matvec, y0, U0, d0, Atb, deg, adj, hyp_table, clip_table):
    """Shared jnp restatement in [B,P,n] layout (fallback + VJP recompute for both
    kernels); the Gram-vs-factored difference is entirely in `matvec`."""
    def body(carry, xs):
        y, U, d = carry
        hyp_k, clips = xs
        alpha = hyp_k[None, :, 0:1]
        tau = hyp_k[None, :, 1:2]
        rho = hyp_k[None, :, 2:3]
        eta = hyp_k[None, :, 3:4]
        AtAy = matvec(y)
        grad = AtAy - Atb + jnp.sign(y) * tau + U * deg[..., None] + d * rho
        grad = jnp.clip(grad, -clips[0], clips[0])
        y = jnp.clip(y - alpha * grad, -clips[1], clips[1])
        neigh = jnp.einsum("bpq,bqn->bpn", adj, y)
        d = 2.0 * (deg[..., None] * y - neigh)
        d = jnp.clip(d, -clips[2], clips[2])
        U = jnp.clip(U + eta * d, -clips[3], clips[3])
        return (y, U, d), y

    _, Y = jax.lax.scan(body, (y0, U0, d0), (hyp_table, clip_table))
    return Y


def _jnp_unroll(AtA, y0, U0, d0, Atb, deg, adj, hyp_table, clip_table):
    """Gram-operand restatement (fallback + VJP)."""
    return _jnp_unroll_with_matvec(
        lambda y: jnp.einsum("pij,bpj->bpi", AtA, y),
        y0, U0, d0, Atb, deg, adj, hyp_table, clip_table,
    )


@jax.custom_vjp
def fused_unroll(AtA, y0, U0, d0, Atb, deg, adj, hyp_table, clip_table):
    """Full-K fused unroll. Shapes: AtA [P,n,n]; y0/U0/d0/Atb [B,P,n]; deg [B,P];
    adj [B,P,P]; hyp_table [K,P,4] (alpha,tau,rho,eta); clip_table [K,4]
    (grad, value, delta, dual — use large finite values for "no clamp").
    Returns Y [K,B,P,n]."""
    B, P, n = y0.shape
    K = hyp_table.shape[0]
    block_b = _pick_block_b(B, P, n)
    if not block_b or B % block_b or n % 128 or P % 8:
        return _jnp_unroll(AtA, y0, U0, d0, Atb, deg, adj, hyp_table, clip_table)

    t = lambda x: jnp.transpose(x, (1, 0, 2))          # [B,P,n] -> [P,B,n]
    adjQ = jnp.transpose(adj, (2, 0, 1))               # [P(q), B, P(p)]
    kernel = _make_kernel(K, P, n, block_b)
    grid = (B // block_b,)
    Y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K, P, B, n), y0.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),   # hyp_table [K,P,4]
                pl.BlockSpec(memory_space=pltpu.SMEM),   # clip_table [K,4]
                pl.BlockSpec(memory_space=pl.ANY),       # AtA stays in HBM
                pl.BlockSpec(memory_space=pl.ANY),       # y0 [P,B,n] (DMA'd to scratch)
                pl.BlockSpec(memory_space=pl.ANY),       # U0
                pl.BlockSpec(memory_space=pl.ANY),       # d0
                pl.BlockSpec(memory_space=pl.ANY),       # Atb
                pl.BlockSpec((P, block_b, P), lambda j: (0, j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),  # Y [K,P,B,n] via DMA
            scratch_shapes=[
                pltpu.VMEM((P, block_b, n), jnp.float32),  # y
                pltpu.VMEM((P, block_b, n), jnp.float32),  # U
                pltpu.VMEM((P, block_b, n), jnp.float32),  # delta
                pltpu.VMEM((P, block_b, n), jnp.float32),  # AtAy
                pltpu.VMEM((P, block_b, n), jnp.float32),  # neigh
                pltpu.VMEM((P, block_b, n), jnp.float32),  # Atb
                pltpu.VMEM((2, n, n), jnp.float32),        # AtA double buffer
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * B * P * n * (n + P),
            bytes_accessed=4 * K * (P * n * n + B * P * n),
            transcendentals=0,
        ),
    )(hyp_table, clip_table, AtA, t(y0), t(U0), t(d0), t(Atb), adjQ)
    return jnp.transpose(Y, (0, 2, 1, 3))              # [K,P,B,n] -> [K,B,P,n]


def _fwd(*args):
    return fused_unroll(*args), args


def _bwd(res, g):
    _, vjp = jax.vjp(_jnp_unroll, *res)
    return vjp(g)


fused_unroll.defvjp(_fwd, _bwd)


def unfolded_clip_table(K: int) -> jnp.ndarray:
    """The unfolded model's adaptive ladder (`unfolded_DLASSO.py:80,92`) as a [K,4]
    table: (grad, value, delta=huge, dual=value)."""
    ks = jnp.arange(K, dtype=jnp.float32)
    g = jnp.maximum(1.0, 30.0 - ks)
    v = jnp.maximum(10.0, 200.0 - 3.0 * ks)
    huge = jnp.full((K,), 3.4e38, jnp.float32)
    return jnp.stack([g, v, huge, v], axis=1)


# ---------------------------------------------------------------------------
# Factored resident-operand variant: A^T(A y) with A ENTIRELY VMEM-RESIDENT.
#
# The Gram-streaming kernel above is HBM-bound on the AtA stream (P * n*n f32 per
# iteration PER BATCH TILE — at P=64 that re-stream is why it loses to XLA). In the
# factored form the operand is A [P, m, n] with m << n: at the reference shapes
# (P<=8, m=100, n=512) A + A^T together are ~3 MB, so they fit VMEM *alongside* the
# full solver state for a 64-scenario tile. Per-iteration HBM traffic collapses to
# the y-snapshot stream out — everything else stays on-chip for all K iterations.
#
# Measured status (v5e, P=8 B=256 n=512 K=15): exact on hardware (K=1 gate 0.0 rel
# err), 9.8k iter/s vs XLA factored 11.0k. Phase ablation on-chip: removing the 16
# MXU dots per iteration changes nothing (matvec fully overlapped), removing the
# consensus loop changes nothing, removing the per-iteration Y DMA buys ~8%. The
# iteration is VPU-ELEMENTWISE-BOUND — the clamp/sign/FMA chain over [P,Bt,n] is the
# floor, and XLA's fused per-iteration graph already sits at it. Kept because it
# pins the roofline (proves XLA is at speed-of-light here, not leaving 10x on the
# table) and as the template for shapes where residency does pay.
# ---------------------------------------------------------------------------


def _make_factored_kernel(K: int, P: int, mp: int, n: int, block_b: int):
    def kernel(hyp_ref, clip_ref, A_ref, At_ref, y0_hbm, U0_hbm, d0_hbm, Atb_hbm,
               adjQ_ref, Y_hbm, y_sc, U_sc, d_sc, atay_sc, Atb_sc, out_sem):
        j = pl.program_id(0)
        tile = pl.ds(j * block_b, block_b)
        for src, dst in ((y0_hbm, y_sc), (U0_hbm, U_sc), (d0_hbm, d_sc), (Atb_hbm, Atb_sc)):
            cp = pltpu.make_async_copy(src.at[:, tile], dst, out_sem)
            cp.start()
            cp.wait()
        Atb = Atb_sc[:]
        deg_bq = jnp.sum(adjQ_ref[:], axis=0)          # [Bt, P]
        deg = jnp.transpose(deg_bq)[..., None]         # [P, Bt, 1]

        for k in range(K):
            # ---- primal: per-agent factored matvec, operands resident in VMEM.
            for p in range(P):                          # static unroll (small P)
                Ay = jnp.dot(y_sc[p], At_ref[p], preferred_element_type=jnp.float32)
                atay_sc[p] = jnp.dot(Ay, A_ref[p], preferred_element_type=jnp.float32)

            hyp_k = hyp_ref[k]
            alpha = hyp_k[:, 0][:, None, None]
            tau = hyp_k[:, 1][:, None, None]
            rho = hyp_k[:, 2][:, None, None]
            eta = hyp_k[:, 3][:, None, None]
            gclip = clip_ref[k, 0]
            vclip = clip_ref[k, 1]
            dclip = clip_ref[k, 2]
            uclip = clip_ref[k, 3]

            y = y_sc[:]
            grad = atay_sc[:] - Atb + jnp.sign(y) * tau + U_sc[:] * deg + d_sc[:] * rho
            grad = jnp.clip(grad, -gclip, gclip)
            y = jnp.clip(y - alpha * grad, -vclip, vclip)
            y_sc[:] = y

            # ---- consensus: broadcast FMAs over source agents (leading-dim reads).
            def cons(q, acc):
                w = jnp.transpose(adjQ_ref[q])          # [Bt, P] -> [P, Bt]
                return acc + w[..., None] * y_sc[q][None, :, :]

            neigh = jax.lax.fori_loop(0, P, cons, jnp.zeros_like(y))
            delta = 2.0 * (deg * y - neigh)
            delta = jnp.clip(delta, -dclip, dclip)
            d_sc[:] = delta
            U_sc[:] = jnp.clip(U_sc[:] + eta * delta, -uclip, uclip)

            out_dma = pltpu.make_async_copy(y_sc, Y_hbm.at[k, :, tile], out_sem)
            out_dma.start()
            out_dma.wait()

    return kernel


def _pick_block_b_factored(B: int, P: int, mp: int, n: int) -> int:
    """Largest batch tile such that A + A^T + state buffers (5 scratches + the
    consensus accumulator + elementwise temps -> budget 7 tile-sized buffers) +
    adjQ fit VMEM."""
    budget = 12 * 1024 * 1024 - 2 * P * mp * n * 4
    for cand in (128, 64, 32, 16, 8):
        if B % cand == 0 and (7 * cand * P * n + cand * P * P) * 4 <= budget:
            return cand
    return 0


def _jnp_unroll_factored(A, y0, U0, d0, Atb, deg, adj, hyp_table, clip_table):
    """Factored restatement (fallback + VJP recompute): AtAy = A^T (A y)."""
    return _jnp_unroll_with_matvec(
        lambda y: sensing.At_apply(A, sensing.A_apply(A, y)),
        y0, U0, d0, Atb, deg, adj, hyp_table, clip_table,
    )


@jax.custom_vjp
def fused_unroll_factored(A, y0, U0, d0, Atb, deg, adj, hyp_table, clip_table):
    """Full-K fused unroll, factored operand resident in VMEM. Shapes: A [P,m,n];
    y0/U0/d0/Atb [B,P,n]; deg [B,P]; adj [B,P,P]; hyp_table [K,P,4];
    clip_table [K,4]. Returns Y [K,B,P,n]. Falls back to the jnp scan when the
    resident working set does not fit VMEM (large P) or shapes are unaligned."""
    B, P, n = y0.shape
    K = hyp_table.shape[0]
    m = A.shape[1]
    mp = -(-m // 128) * 128                          # pad m: zero rows keep A^T A exact
    block_b = _pick_block_b_factored(B, P, mp, n)
    if not block_b or n % 128 or P % 8:
        return _jnp_unroll_factored(A, y0, U0, d0, Atb, deg, adj, hyp_table, clip_table)

    A_pad = jnp.pad(A, ((0, 0), (0, mp - m), (0, 0)))   # [P, mp, n]
    At_pad = jnp.transpose(A_pad, (0, 2, 1))            # [P, n, mp]
    t = lambda x: jnp.transpose(x, (1, 0, 2))           # [B,P,n] -> [P,B,n]
    adjQ = jnp.transpose(adj, (2, 0, 1))                # [P(q), B, P(p)]
    kernel = _make_factored_kernel(K, P, mp, n, block_b)
    grid = (B // block_b,)
    Y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K, P, B, n), y0.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),   # hyp_table [K,P,4]
                pl.BlockSpec(memory_space=pltpu.SMEM),   # clip_table [K,4]
                pl.BlockSpec(memory_space=pltpu.VMEM),   # A_pad resident
                pl.BlockSpec(memory_space=pltpu.VMEM),   # At_pad resident
                pl.BlockSpec(memory_space=pl.ANY),       # y0 [P,B,n] (DMA'd to scratch)
                pl.BlockSpec(memory_space=pl.ANY),       # U0
                pl.BlockSpec(memory_space=pl.ANY),       # d0
                pl.BlockSpec(memory_space=pl.ANY),       # Atb
                pl.BlockSpec((P, block_b, P), lambda j: (0, j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),  # Y [K,P,B,n] via DMA
            scratch_shapes=[
                pltpu.VMEM((P, block_b, n), jnp.float32),  # y
                pltpu.VMEM((P, block_b, n), jnp.float32),  # U
                pltpu.VMEM((P, block_b, n), jnp.float32),  # delta
                pltpu.VMEM((P, block_b, n), jnp.float32),  # AtAy
                pltpu.VMEM((P, block_b, n), jnp.float32),  # Atb
                pltpu.SemaphoreType.DMA,
            ],
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * B * P * n * (2 * mp + P),
            bytes_accessed=4 * K * B * P * n,
            transcendentals=0,
        ),
    )(hyp_table, clip_table, A_pad, At_pad, t(y0), t(U0), t(d0), t(Atb), adjQ)
    return jnp.transpose(Y, (0, 2, 1, 3))              # [K,P,B,n] -> [K,B,P,n]


def _factored_fwd(*args):
    return fused_unroll_factored(*args), args


def _factored_bwd(res, g):
    _, vjp = jax.vjp(_jnp_unroll_factored, *res)
    return vjp(g)


fused_unroll_factored.defvjp(_factored_fwd, _factored_bwd)


# ---------------------------------------------------------------------------
# bf16 VMEM-resident variant for LARGE P (the headline P=64 shape).
#
# Round-1's kernels assumed a ~12 MB VMEM budget (the conservative "~16 MB/core"
# guide figure) and lost at P=64 because nothing stayed resident. Measured on the
# actual v5e chip: a 120 MB VMEM scratch compiles and runs — v5e has ~128 MB of
# VMEM per core. That changes the design space completely:
#
#   * A and A^T live in VMEM in bf16 for the WHOLE call (P=64, m->128, n=512:
#     16.8 MB total) — zero per-iteration operand traffic.
#   * The solver state (y, U, delta, Atb) for a 64-scenario batch tile lives in
#     bf16 scratch across all K iterations — zero per-iteration state traffic.
#     (The XLA scan path re-reads + re-writes ~140 MB of HBM state per iteration;
#     that traffic is exactly what this kernel deletes.)
#   * Consensus runs on the MXU as per-scenario [P,P] @ [P,n] matmuls in a
#     [Bt, P, n] layout (the O(P) broadcast-FMA loop of the small-P kernels is
#     VPU-bound at P=64: ~128 VPU ops/element/iteration). The layout swap between
#     the agent-leading matvec view and the batch-leading consensus view is done
#     with STATIC-index sublane copies — traced middle-dim indexing is the known
#     silent-miscompile on TPU (see the module docstring).
#
# Grid = (B/Bt, K): K advances fastest, state scratch persists across grid steps
# (TPU grids execute sequentially), and each step's y snapshot streams out through
# the pipelined out_spec block, overlapping the DMA with the next iteration.
#
# Numerics: bf16 storage everywhere, f32 MXU accumulation, f32 elementwise math —
# the same contract as the XLA `solver_dtype='bfloat16'` serving mode (NMSE-gated,
# not trajectory-parity; see bench.py). Reference anchor for the fused step:
# `unfolded_DLASSO.py:69-99` (SURVEY section 3.5).
# ---------------------------------------------------------------------------

_BF = jnp.bfloat16

# Mosaic needs headroom above our accounted buffers (register spills, pipeline
# bookkeeping); cap our own accounting well below the ~128 MB physical VMEM.
_RESIDENT_VMEM_BUDGET = 100 * 1024 * 1024
_RESIDENT_VMEM_LIMIT = 120 * 1024 * 1024


def _make_resident_kernel(K: int, P: int, mp: int, n: int, block_b: int, n_tiles: int):
    def kernel(hyp_ref, clip_ref, A_hbm, At_hbm, y0_hbm, U0_hbm, d0_hbm, Atb_hbm,
               adjB_ref, Y_ref,
               A_sc, At_sc, y_sc, U_sc, d_sc, Atb_sc, atay_sc, yB_sc, nB_sc, nP_sc,
               dma_sems):
        j = pl.program_id(0)
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _load_tile():
            # Operands once per call, state once per batch tile.
            @pl.when(j == 0)
            def _():
                for i, (src, dst) in enumerate(((A_hbm, A_sc), (At_hbm, At_sc))):
                    cp = pltpu.make_async_copy(src, dst, dma_sems.at[i])
                    cp.start()
                for i, (src, dst) in enumerate(((A_hbm, A_sc), (At_hbm, At_sc))):
                    pltpu.make_async_copy(src, dst, dma_sems.at[i]).wait()

            # Atb stays f32 (read every iteration, written once; bf16-rounding the
            # constant observation term measurably degrades the trajectory — 9%
            # divergence from the dtype-contract restatement in interpret mode).
            tile = pl.ds(j * block_b, block_b)
            srcs = ((y0_hbm, y_sc), (U0_hbm, U_sc), (d0_hbm, d_sc), (Atb_hbm, Atb_sc))
            for i, (src, dst) in enumerate(srcs):
                pltpu.make_async_copy(src.at[:, tile], dst, dma_sems.at[i]).start()
            for i, (src, dst) in enumerate(srcs):
                pltpu.make_async_copy(src.at[:, tile], dst, dma_sems.at[i]).wait()

        # deg[p, b] from the batch-leading adjacency block (0/1 entries are exact
        # in bf16; sums <= P-1 stay exact under f32 accumulation).
        deg_bp = jnp.sum(adjB_ref[:].astype(jnp.float32), axis=-1)   # [Bt, P]
        deg = jnp.transpose(deg_bp)[..., None]                        # [P, Bt, 1]

        # ---- primal: per-agent factored matvec, operands resident (fori: leading
        # -dim dynamic indexing only).
        def mv(p, _):
            Ay = jnp.dot(y_sc[p], At_sc[p], preferred_element_type=jnp.float32)
            atay_sc[p] = jnp.dot(Ay.astype(_BF), A_sc[p],
                                 preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, P, mv, 0)

        hyp_k = hyp_ref[k]                       # [P, 4] f32
        alpha = hyp_k[:, 0][:, None, None]
        tau = hyp_k[:, 1][:, None, None]
        rho = hyp_k[:, 2][:, None, None]
        eta = hyp_k[:, 3][:, None, None]
        gclip = clip_ref[k, 0]
        vclip = clip_ref[k, 1]
        dclip = clip_ref[k, 2]
        uclip = clip_ref[k, 3]

        y = y_sc[:].astype(jnp.float32)
        grad = (atay_sc[:] - Atb_sc[:]
                + jnp.sign(y) * tau
                + U_sc[:].astype(jnp.float32) * deg
                + d_sc[:].astype(jnp.float32) * rho)
        grad = jnp.clip(grad, -gclip, gclip)
        y = jnp.clip(y - alpha * grad, -vclip, vclip)
        y_sc[:] = y.astype(_BF)

        # ---- layout swap [P,Bt,n] <-> [Bt,P,n]: ONE major-dims transpose each way.
        # (Mosaic lowers leading-dims transposes to vector shuffles; the earlier
        # static per-agent sublane-copy loop made compile time explode super-linearly
        # in P — 2.1s at P=16, >40min at P=64 — while a traced middle-dim index is
        # the known silent-miscompile. The transpose is both correct and compiles.)
        yB_sc[:] = jnp.transpose(y_sc[:], (1, 0, 2))

        # ---- consensus on the MXU: per-scenario adj_b [P,P] @ y_b [P,n].
        def cons(b, _):
            nB_sc[b] = jnp.dot(adjB_ref[b], yB_sc[b],
                               preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, block_b, cons, 0)

        nP_sc[:] = jnp.transpose(nB_sc[:], (1, 0, 2))

        delta = 2.0 * (deg * y - nP_sc[:])
        delta = jnp.clip(delta, -dclip, dclip)
        d_sc[:] = delta.astype(_BF)
        U = jnp.clip(U_sc[:].astype(jnp.float32) + eta * delta, -uclip, uclip)
        U_sc[:] = U.astype(_BF)

        Y_ref[0] = y_sc[:]

    return kernel


def _pick_block_b_resident(B: int, P: int, mp: int, n: int) -> int:
    """Largest bf16 batch tile fitting the measured VMEM budget: fixed cost is the
    resident A + A^T; per-Bt cost is 4 bf16 state buffers + 1 f32 matvec output +
    1 bf16 + 2 f32 layout-swap buffers + the double-buffered out block and
    adjacency block."""
    fixed = 2 * P * mp * n * 2
    # per-Bt VMEM bytes per agent-row element: y/U/d bf16 (6) + Atb f32 (4) +
    # AtAy f32 (4) + batch-leading y bf16 (2) + neigh f32 x2 views (8)
    per_bt = P * n * (3 * 2 + 4 + 4 + 2 + 4 + 4) + 2 * (P * n * 2) + 2 * (2 * P * P)
    for cand in (128, 64, 32, 16):
        if B % cand == 0 and fixed + cand * per_bt <= _RESIDENT_VMEM_BUDGET:
            return cand
    return 0


def _jnp_unroll_resident(A, y0, U0, d0, Atb, deg, adj, hyp_table, clip_table):
    """jnp restatement with the kernel's exact dtype contract (bf16 storage, bf16
    MXU operands, f32 accumulate/elementwise) — fallback + VJP recompute."""
    A_lo = A.astype(_BF)

    def matvec(y):
        Ay = jnp.einsum("pmn,bpn->bpm", A_lo, y.astype(_BF),
                        preferred_element_type=jnp.float32)
        return jnp.einsum("pmn,bpm->bpn", A_lo, Ay.astype(_BF),
                          preferred_element_type=jnp.float32)

    adj_lo = adj.astype(_BF)

    def body(carry, xs):
        y, U, d = carry
        hyp_k, clips = xs
        alpha = hyp_k[None, :, 0:1]
        tau = hyp_k[None, :, 1:2]
        rho = hyp_k[None, :, 2:3]
        eta = hyp_k[None, :, 3:4]
        yf = y.astype(jnp.float32)
        grad = (matvec(y) - Atb.astype(jnp.float32) + jnp.sign(yf) * tau
                + U.astype(jnp.float32) * deg[..., None]
                + d.astype(jnp.float32) * rho)
        grad = jnp.clip(grad, -clips[0], clips[0])
        yf = jnp.clip(yf - alpha * grad, -clips[1], clips[1])
        y = yf.astype(_BF)
        neigh = jnp.einsum("bpq,bqn->bpn", adj_lo, y,
                           preferred_element_type=jnp.float32)
        df = 2.0 * (deg[..., None] * yf - neigh)
        df = jnp.clip(df, -clips[2], clips[2])
        d = df.astype(_BF)
        U = jnp.clip(U.astype(jnp.float32) + eta * df, -clips[3], clips[3]).astype(_BF)
        return (y, U, d), y

    st = tuple(x.astype(_BF) for x in (y0, U0, d0))
    _, Y = jax.lax.scan(body, st, (hyp_table, clip_table))
    return Y


@jax.custom_vjp
def fused_unroll_resident(A, y0, U0, d0, Atb, deg, adj, hyp_table, clip_table):
    """Full-K fused unroll with EVERYTHING resident in VMEM, bf16 storage.

    Shapes: A [P,m,n]; y0/U0/d0/Atb [B,P,n]; deg [B,P]; adj [B,P,P]; hyp_table
    [K,P,4] (alpha,tau,rho,eta); clip_table [K,4]. Returns Y [K,B,P,n] bf16.
    Falls back to the jnp bf16 restatement when shapes are unaligned or nothing
    fits (P not multiple of 8, n not multiple of 128, no viable batch tile).
    """
    B, P, n = y0.shape
    K = hyp_table.shape[0]
    m = A.shape[1]
    mp = -(-m // 128) * 128
    block_b = _pick_block_b_resident(B, P, mp, n)
    if not block_b or n % 128 or P % 8:
        return _jnp_unroll_resident(A, y0, U0, d0, Atb, deg, adj, hyp_table, clip_table)

    A_pad = jnp.pad(A, ((0, 0), (0, mp - m), (0, 0))).astype(_BF)   # [P, mp, n]
    At_pad = jnp.transpose(A_pad, (0, 2, 1))                         # [P, n, mp]
    t = lambda x: jnp.transpose(x.astype(_BF), (1, 0, 2))            # [B,P,n]->[P,B,n]
    n_tiles = B // block_b
    kernel = _make_resident_kernel(K, P, mp, n, block_b, n_tiles)
    Y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K, P, B, n), _BF),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_tiles, K),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),   # hyp_table [K,P,4]
                pl.BlockSpec(memory_space=pltpu.SMEM),   # clip_table [K,4]
                pl.BlockSpec(memory_space=pl.ANY),       # A (DMA'd once)
                pl.BlockSpec(memory_space=pl.ANY),       # At (DMA'd once)
                pl.BlockSpec(memory_space=pl.ANY),       # y0 [P,B,n]
                pl.BlockSpec(memory_space=pl.ANY),       # U0
                pl.BlockSpec(memory_space=pl.ANY),       # d0
                pl.BlockSpec(memory_space=pl.ANY),       # Atb
                pl.BlockSpec((block_b, P, P), lambda j, k: (j, 0, 0),
                             memory_space=pltpu.VMEM),   # adj tile (bf16)
            ],
            out_specs=pl.BlockSpec((1, P, block_b, n), lambda j, k: (k, 0, j, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((P, mp, n), _BF),             # A resident
                pltpu.VMEM((P, n, mp), _BF),             # At resident
                pltpu.VMEM((P, block_b, n), _BF),        # y
                pltpu.VMEM((P, block_b, n), _BF),        # U
                pltpu.VMEM((P, block_b, n), _BF),        # delta
                pltpu.VMEM((P, block_b, n), jnp.float32),  # Atb (kept f32)
                pltpu.VMEM((P, block_b, n), jnp.float32),  # AtAy
                pltpu.VMEM((block_b, P, n), _BF),        # y, batch-leading view
                pltpu.VMEM((block_b, P, n), jnp.float32),  # neigh, batch-leading
                pltpu.VMEM((P, block_b, n), jnp.float32),  # neigh, agent-leading
                pltpu.SemaphoreType.DMA((4,)),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_RESIDENT_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * B * P * n * (2 * mp + P),
            bytes_accessed=2 * K * B * P * n + 2 * 2 * P * mp * n + 4 * 2 * B * P * n,
            transcendentals=0,
        ),
    )(hyp_table, clip_table, A_pad, At_pad, t(y0), t(U0), t(d0),
      jnp.transpose(Atb, (1, 0, 2)),    # Atb stays f32
      adj.astype(_BF))
    return jnp.transpose(Y, (0, 2, 1, 3))              # [K,P,B,n] -> [K,B,P,n]


def _resident_fwd(*args):
    return fused_unroll_resident(*args), args


def _resident_bwd(res, g):
    _, vjp = jax.vjp(_jnp_unroll_resident, *res)
    return vjp(g.astype(_BF))


fused_unroll_resident.defvjp(_resident_fwd, _resident_bwd)
