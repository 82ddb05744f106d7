"""Pallas TPU kernel: fused D-ADMM primal update.

The per-iteration hot op (SURVEY.md section 3.5, reference `unfolded_DLASSO.py:69-93`):

    g     = AtA_p @ y_p - Atb_p + tau*sign(y_p) + deg*U_p + rho*delta_p
    y_new = clip(y_p - alpha * clip(g, +-gclip), +-vclip)

One kernel invocation fuses the Gram matvec (MXU) with every elementwise term (VPU) so
the gradient tensor never round-trips HBM: inputs stream HBM->VMEM once, output once —
5 tensor reads + 1 write instead of the ~10 intermediate tensors XLA materializes for
the unfused graph. Grid: (agents, batch tiles); each program computes a
[block_b, n] @ [n, n] matmul plus fused epilogue.

Gradients: `fused_primal_update` carries a custom VJP whose backward re-derives the
cotangents through an equivalent jnp restatement (rematerialized), so the op is safe
inside `jax.grad` — forward runs the Pallas kernel, backward runs XLA.

Layout note: arrays arrive as [B, P, n] (framework convention) and are transposed to
[P, B, n] here so the batch tile is the sublane dimension (P=1 slices would violate the
(8, 128) f32 min tile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(hyp_ref, clip_ref, AtA_ref, y_ref, Udeg_ref, delta_ref, Atb_ref, out_ref):
    p = pl.program_id(0)
    y = y_ref[0]                    # [Bt, n]
    # AtA is symmetric (A^T A), so y @ AtA == (AtA @ y^T)^T rowwise.
    AtAy = jnp.dot(y, AtA_ref[0], preferred_element_type=jnp.float32)
    alpha = hyp_ref[p, 0]
    tau = hyp_ref[p, 1]
    rho = hyp_ref[p, 2]
    gclip = clip_ref[0, 0]
    vclip = clip_ref[0, 1]
    g = AtAy - Atb_ref[0] + jnp.sign(y) * tau + Udeg_ref[0] + delta_ref[0] * rho
    g = jnp.clip(g, -gclip, gclip)
    out_ref[0] = jnp.clip(y - alpha * g, -vclip, vclip)


def _pallas_forward(AtA, y_t, Udeg_t, delta_t, Atb_t, hyp, clips, block_b):
    P, B, n = y_t.shape
    grid = (P, B // block_b)

    def tile(i, j):
        return (i, j, 0)

    data_spec = pl.BlockSpec((1, block_b, n), tile, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((P, B, n), y_t.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                # SMEM refs are whole-array (TPU lowering requires full or
                # tile-divisible blocks); the kernel indexes by program id.
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, n, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                data_spec,
                data_spec,
                data_spec,
                data_spec,
            ],
            out_specs=data_spec,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * P * B * n * n,
            bytes_accessed=4 * (P * n * n + 5 * P * B * n),
            transcendentals=0,
        ),
    )(hyp, clips, AtA, y_t, Udeg_t, delta_t, Atb_t)


def _jnp_reference(AtA, y, U, delta, Atb, deg, hyp, clips):
    """Equivalent jnp math in [B, P, n] layout (used for the VJP and for testing)."""
    alpha = hyp[None, :, 0:1]
    tau = hyp[None, :, 1:2]
    rho = hyp[None, :, 2:3]
    AtAy = jnp.einsum("pij,bpj->bpi", AtA, y)
    g = AtAy - Atb + jnp.sign(y) * tau + U * deg[..., None] + delta * rho
    g = jnp.clip(g, -clips[0], clips[0])
    return jnp.clip(y - alpha * g, -clips[1], clips[1])


def _pick_block_b(B: int) -> int:
    for cand in (256, 128, 64, 32, 16, 8):
        if B % cand == 0:
            return cand
    return 0  # sentinel: no 8-multiple tile divides B -> caller takes the jnp fallback


def _jnp_reference_pbn(AtA, y_t, U_t, delta_t, Atb_t, deg_t, hyp, clips):
    """Equivalent jnp math in [P, B, n] layout (VJP/fallback for the transposed path)."""
    alpha = hyp[:, 0][:, None, None]
    tau = hyp[:, 1][:, None, None]
    rho = hyp[:, 2][:, None, None]
    AtAy = jnp.einsum("pij,pbj->pbi", AtA, y_t)
    g = AtAy - Atb_t + jnp.sign(y_t) * tau + U_t * deg_t[..., None] + delta_t * rho
    g = jnp.clip(g, -clips[0], clips[0])
    return jnp.clip(y_t - alpha * g, -clips[1], clips[1])


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_primal_update_pbn(AtA, y_t, U_t, delta_t, Atb_t, deg_t, hyp, clips):
    """Fused primal update in [P, B, n] layout — no per-call transposes; the layout the
    Pallas grid wants. deg_t [P, B]; hyp [P, 4]; clips [2]."""
    P, B, n = y_t.shape
    block_b = _pick_block_b(B)
    if not block_b or B % block_b or n % 128:
        return _jnp_reference_pbn(AtA, y_t, U_t, delta_t, Atb_t, deg_t, hyp, clips)
    Udeg_t = U_t * deg_t[..., None]
    return _pallas_forward(AtA, y_t, Udeg_t, delta_t, Atb_t, hyp, clips[None, :], block_b)


def _fwd_pbn(*args):
    return fused_primal_update_pbn(*args), args


def _bwd_pbn(res, g_out):
    _, vjp = jax.vjp(_jnp_reference_pbn, *res)
    return vjp(g_out)


fused_primal_update_pbn.defvjp(_fwd_pbn, _bwd_pbn)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_primal_update(AtA, y, U, delta, Atb, deg, hyp, clips):
    """Fused primal update. [B,P,n] layout in/out.

    AtA [P,n,n]; y/U/delta/Atb [B,P,n]; deg [B,P]; hyp [P,4] (alpha,tau,rho,eta — eta
    unused here); clips [2] = (grad clip, value clip).
    """
    B, P, n = y.shape
    block_b = _pick_block_b(B)
    if not block_b or B % block_b or n % 128:
        return _jnp_reference(AtA, y, U, delta, Atb, deg, hyp, clips)
    to_t = lambda x: jnp.transpose(x, (1, 0, 2))
    Udeg = U * deg[..., None]
    out_t = _pallas_forward(
        AtA, to_t(y), to_t(Udeg), to_t(delta), to_t(Atb), hyp, clips[None, :], block_b
    )
    return jnp.transpose(out_t, (1, 0, 2))


def _fwd(AtA, y, U, delta, Atb, deg, hyp, clips):
    out = fused_primal_update(AtA, y, U, delta, Atb, deg, hyp, clips)
    return out, (AtA, y, U, delta, Atb, deg, hyp, clips)


def _bwd(res, g_out):
    args = res
    _, vjp = jax.vjp(_jnp_reference, *args)
    return vjp(g_out)


fused_primal_update.defvjp(_fwd, _bwd)
