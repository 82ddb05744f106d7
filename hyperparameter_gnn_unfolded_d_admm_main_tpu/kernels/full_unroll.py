"""Pallas TPU kernel: the ENTIRE K-iteration D-ADMM unroll in one kernel.

Motivation (measured, see PARITY.md): the per-iteration XLA graph is HBM-bound — every
iteration re-reads/rewrites the y/U/delta/Atb state (~300 MB per iteration at the
benchmark shape), capping throughput near 1.8k iter/s. This kernel holds the full
solver state for a batch tile *resident in VMEM across all K iterations*; the only
recurring HBM traffic is the AtA stream (double-buffered DMA, one [n, n] Gram block per
agent per iteration) and one y-snapshot write per iteration. That moves the bound from
~300 MB/iter to ~(P·n·n·4 + tile) bytes/iter — several times faster at the benchmark
shape.

Structure per program (grid over batch tiles of `block_b` scenarios):
    for k in range(K):                       # static unroll
        fori_loop over agents p:             # double-buffered DMA of AtA[p]
            AtAy[:, p, :] = y[:, p, :] @ AtA_p
        grad  = AtAy - Atb + tau_k*sign(y) + deg*U + rho_k*delta   (vectorized, VPU)
        y     = clip(y - alpha_k * clip(grad, g_k), v_k)
        fori_loop over scenarios b:          # consensus: per-sample [P,P]@[P,n]
            neigh[b] = adj[b] @ y[b]
        delta = 2*(deg*y - neigh)  (clipped when the ladder says so)
        U     = clip(U + eta_k*delta, d_k)
        DMA y -> Y_out[k, tile]

Semantics: identical to `dadmm_core.unroll_table` with `nan_guard=False` (the NaN
whole-tensor reset needs a cross-tile reduction; use the XLA path when you want the
reference's guard behavior). Gradients via custom VJP that recomputes through the jnp
unroll (the same recompute a remat'd scan performs).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(K: int, P: int, n: int, block_b: int, has_delta_clip: bool):
    def kernel(hyp_ref, clip_ref, AtA_hbm, y0_hbm, U0_hbm, d0_hbm, Atb_hbm, deg_ref,
               adj_ref, Y_hbm, y_sc, U_sc, d_sc, atay_sc, neigh_sc, Atb_sc, ata_buf,
               dma_sems, out_sem):
        j = pl.program_id(0)
        # Load this batch tile's state/observations HBM -> VMEM scratch once. Keeping
        # these as grid inputs would double-buffer four 1-tile VMEM blocks on top of
        # the scratch and blow the 16MB VMEM budget.
        tile = pl.ds(j * block_b, block_b)
        for src, dst in ((y0_hbm, y_sc), (U0_hbm, U_sc), (d0_hbm, d_sc), (Atb_hbm, Atb_sc)):
            cp = pltpu.make_async_copy(src.at[tile], dst, out_sem)
            cp.start()
            cp.wait()
        Atb = Atb_sc[:]
        deg = deg_ref[:][..., None]                    # [Bt, P, 1]

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
                yp = y_sc[:, p, :]                     # [Bt, n]
                atay_sc[:, p, :] = jnp.dot(
                    yp, ata_buf[slot], preferred_element_type=jnp.float32
                )
                return 0

            jax.lax.fori_loop(0, P, body, 0)

            hyp_k = hyp_ref[k]                         # [P, 4] (VMEM)
            alpha = hyp_k[:, 0][None, :, None]
            tau = hyp_k[:, 1][None, :, None]
            rho = hyp_k[:, 2][None, :, None]
            eta = hyp_k[:, 3][None, :, None]
            gclip = clip_ref[k, 0]
            vclip = clip_ref[k, 1]
            dclip = clip_ref[k, 2]
            uclip = clip_ref[k, 3]

            y = y_sc[:]
            grad = atay_sc[:] - Atb + jnp.sign(y) * tau + U_sc[:] * deg + d_sc[:] * rho
            grad = jnp.clip(grad, -gclip, gclip)
            y = jnp.clip(y - alpha * grad, -vclip, vclip)
            y_sc[:] = y

            # ---- consensus: per-scenario neighbor aggregation on the MXU
            def cons(b, _):
                neigh_sc[b] = jnp.dot(
                    adj_ref[b], y_sc[b], preferred_element_type=jnp.float32
                )
                return 0

            jax.lax.fori_loop(0, block_b, cons, 0)
            delta = 2.0 * (deg * y_sc[:] - neigh_sc[:])
            if has_delta_clip:
                delta = jnp.clip(delta, -dclip, dclip)
            d_sc[:] = delta
            U_sc[:] = jnp.clip(U_sc[:] + eta * delta, -uclip, uclip)

            # ---- stream this iteration's snapshot out
            out_dma = pltpu.make_async_copy(
                y_sc, Y_hbm.at[k, pl.ds(j * block_b, block_b)], out_sem
            )
            out_dma.start()
            out_dma.wait()

    return kernel


def _pick_block_b(B: int) -> int:
    for cand in (8, 16, 4, 2):
        if B % cand == 0:
            return cand
    return B


def _jnp_unroll(AtA, y0, U0, d0, Atb, deg, adj, hyp_table, clip_table):
    """Reference jnp restatement in [B,P,n] layout (fallback + VJP)."""
    def body(carry, xs):
        y, U, d = carry
        hyp_k, clips = xs
        alpha = hyp_k[None, :, 0:1]
        tau = hyp_k[None, :, 1:2]
        rho = hyp_k[None, :, 2:3]
        eta = hyp_k[None, :, 3:4]
        AtAy = jnp.einsum("pij,bpj->bpi", AtA, y)
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


@jax.custom_vjp
def fused_unroll(AtA, y0, U0, d0, Atb, deg, adj, hyp_table, clip_table):
    """Full-K fused unroll. Shapes: AtA [P,n,n]; y0/U0/d0/Atb [B,P,n]; deg [B,P];
    adj [B,P,P]; hyp_table [K,P,4] (alpha,tau,rho,eta); clip_table [K,4]
    (grad, value, delta, dual — use jnp.inf-free big values for "no clamp").
    Returns Y [K,B,P,n]."""
    B, P, n = y0.shape
    K = hyp_table.shape[0]
    block_b = _pick_block_b(B)
    if B % block_b or n % 128 or P % 8:
        return _jnp_unroll(AtA, y0, U0, d0, Atb, deg, adj, hyp_table, clip_table)

    kernel = _make_kernel(K, P, n, block_b, has_delta_clip=True)
    grid = (B // block_b,)
    Y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K, B, P, n), y0.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),   # hyp_table [K,P,4]
                pl.BlockSpec(memory_space=pltpu.SMEM),   # clip_table [K,4]
                pl.BlockSpec(memory_space=pl.ANY),       # AtA stays in HBM
                pl.BlockSpec(memory_space=pl.ANY),       # y0 (DMA'd into scratch)
                pl.BlockSpec(memory_space=pl.ANY),       # U0
                pl.BlockSpec(memory_space=pl.ANY),       # d0
                pl.BlockSpec(memory_space=pl.ANY),       # Atb
                pl.BlockSpec((block_b, P), lambda j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, P, P), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),  # Y written via DMA
            scratch_shapes=[
                pltpu.VMEM((block_b, P, n), jnp.float32),  # y
                pltpu.VMEM((block_b, P, n), jnp.float32),  # U
                pltpu.VMEM((block_b, P, n), jnp.float32),  # delta
                pltpu.VMEM((block_b, P, n), jnp.float32),  # AtAy
                pltpu.VMEM((block_b, P, n), jnp.float32),  # neigh
                pltpu.VMEM((block_b, P, n), jnp.float32),  # Atb
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
    )(hyp_table, clip_table, AtA, y0, U0, d0, Atb, deg, adj)
    return Y


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
