"""Sharded full-training-step: GSPMD-partitioned flagship train step over a mesh.

The GNN-hypernetwork training step (forward K-scan + backward + AdamW update) is jitted
with explicit `NamedSharding` annotations: batch over `data`, agent dimension over
`agents`, parameters/optimizer state replicated. XLA's SPMD partitioner inserts the
collectives (all-gathers for the cross-agent GCN/Laplacian matmuls, psums for the grad
reduction) — the idiomatic TPU counterpart of the reference's single-process loop.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ..models.gnn_hypernet import DLASSOGNNHyp
from ..train import losses
from .mesh import AGENT_AXIS, DATA_AXIS, sharding


def make_gnn_train_step(mesh: Mesh, model: DLASSOGNNHyp, tx: optax.GradientTransformation,
                        masked_k: bool = False):
    """Returns jitted `(params, norm_state, opt_state, key, (b, y, adj), K) -> ...` with
    data/agent sharding constraints. K is static (one compiled program per distinct K
    of the progressive schedule) unless `masked_k`, where K is traced and ONE max-K
    program serves the whole curriculum (models/gnn_hypernet.py:_freeze_inactive)."""
    repl = sharding(mesh)
    s_bpa = sharding(mesh, DATA_AXIS, AGENT_AXIS)
    s_b = sharding(mesh, DATA_AXIS)

    @functools.partial(
        jax.jit,
        static_argnums=() if masked_k else (5,),
        in_shardings=(repl, repl, repl, repl, (s_bpa, s_b, s_bpa)) + ((repl,) if masked_k else ()),
        # Keep params/opt state replicated on the way OUT too, so the next call's
        # in_shardings match without a reshard.
        out_shardings=(repl, repl, repl, repl, repl),
    )
    def _step(params, norm_state, opt_state, key, batch, K):
        b, y, adj = batch

        def loss_fn(p):
            if masked_k:
                # In-scan [Kmax, P] loss reduction — never materializes the stacked
                # Y [Kmax, B, P, n] through forward+backward (matters at mesh scale).
                per_kp, _, new_state = model.apply_losses(
                    p, norm_state, key, b, adj, y, training=True, k_active=K
                )
                lm, lf = losses.masked_losses_from_per_kp(per_kp, K)
                return lf, (lm, new_state)
            out = model.apply(p, norm_state, key, b, adj,
                              training_iterations=K, training=True)
            lm, lf = losses.compute_loss(out.Y, y)
            return lf, (lm, out.state)

        (lf, (lm, new_state)), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, lm, lf

    if masked_k:
        def train_step(params, norm_state, opt_state, key, batch, K):
            return _step(params, norm_state, opt_state, key, batch, jnp.int32(K))
        return train_step
    return _step


def make_unfolded_train_step(mesh: Mesh, model, tx: optax.GradientTransformation):
    """GSPMD-partitioned TABLE-TIER train step (UnfoldedDLASSO): forward K-scan with
    in-scan loss + backward + Adam update, batch over `data` / agents over `agents`,
    table+optimizer replicated. The partitioner turns the dense-Laplacian consensus
    (`2*L@y`) into the cross-agent collectives. Enables END-TO-END sharded training
    of the reference's `unfolded_train_new.py` workload (multi-epoch trajectory
    parity vs dense: tests/test_sharded_training_e2e.py)."""
    repl = sharding(mesh)
    s_bpa = sharding(mesh, DATA_AXIS, AGENT_AXIS)
    s_b = sharding(mesh, DATA_AXIS)

    @functools.partial(
        jax.jit,
        in_shardings=(repl, repl, repl, s_bpa, s_bpa, s_b),
        out_shardings=(repl, repl, repl, repl, repl),
    )
    def _step(params, opt_state, key, b, adj, y):
        def loss_fn(p):
            per_kp, hyp = model.apply_losses(p, key, b, adj, y, training=True)
            lm, lf = losses.losses_from_per_kp(per_kp)
            return lf, (lm, hyp)

        (lf, (lm, hyp)), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, lm, lf, hyp

    return _step


def make_unfolded_eval_step(mesh: Mesh, model):
    repl = sharding(mesh)
    s_bpa = sharding(mesh, DATA_AXIS, AGENT_AXIS)
    s_b = sharding(mesh, DATA_AXIS)

    @functools.partial(
        jax.jit,
        in_shardings=(repl, repl, s_bpa, s_bpa, s_b),
    )
    def _eval(params, key, b, adj, y):
        # training=True mirrors the dense eval_step (reference validation never
        # calls model.eval(), `unfolded_train_new.py:102-125` — table penalty active)
        Y, hyp = model.apply(params, key, b, adj, training=True)
        lm, lf = losses.compute_loss(Y, y)
        nm = losses.nmse(Y[-1], y)
        return lm, lf, nm

    return _eval


def make_dlr_train_step(mesh: Mesh, model, tx: optax.GradientTransformation,
                        use_gnn: bool):
    """GSPMD-partitioned dlr train step (beyond-reference family,
    models/unfolded_dlr.py): x/y/adj shard over (data, agents); params/opt
    replicated; the partitioner turns the neighbor sums into collectives.
    `use_gnn` selects the state-conditioned DLRGNNHyp signature (threads
    norm_state) vs the stateless table/one-shot tiers."""
    from ..train import losses as losses_lib

    repl = sharding(mesh)
    s_bpa = sharding(mesh, DATA_AXIS, AGENT_AXIS)

    @functools.partial(
        jax.jit,
        in_shardings=(repl, repl, repl, repl, s_bpa, s_bpa, s_bpa),
        out_shardings=(repl, repl, repl, repl, repl),
    )
    def _step(params, norm_state, opt_state, key, x, y, adj):
        def loss_fn(p):
            if use_gnn:
                per_kp, new_state = model.apply_losses(p, norm_state, key, x, y,
                                                       adj, training=True)
            else:
                per_kp = model.apply_losses(p, key, x, y, adj, training=True)[0]
                new_state = norm_state
            lm, lf = losses_lib.losses_from_per_kp(per_kp)
            return lf, (lm, new_state)

        (lf, (lm, new_state)), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), new_state, opt_state, lm, lf

    return _step


def make_dlr_eval_step(mesh: Mesh, model, use_gnn: bool):
    from ..train import losses as losses_lib

    repl = sharding(mesh)
    s_bpa = sharding(mesh, DATA_AXIS, AGENT_AXIS)

    @functools.partial(
        jax.jit,
        in_shardings=(repl, repl, repl, s_bpa, s_bpa, s_bpa),
    )
    def _eval(params, norm_state, key, x, y, adj):
        if use_gnn:
            per_kp, _ = model.apply_losses(params, norm_state, key, x, y, adj,
                                           training=False)
        else:
            # training=True mirrors the dense eval_step (table-tier penalty
            # stays active at eval, reference parity — train/loop.py)
            per_kp, _ = model.apply_losses(params, key, x, y, adj, training=True)
        return losses_lib.losses_from_per_kp(per_kp)

    return _eval


def make_gnn_eval_step(mesh: Mesh, model: DLASSOGNNHyp, masked_k: bool = False):
    repl = sharding(mesh)
    s_bpa = sharding(mesh, DATA_AXIS, AGENT_AXIS)
    s_b = sharding(mesh, DATA_AXIS)

    @functools.partial(
        jax.jit,
        static_argnums=() if masked_k else (4,),
        in_shardings=(repl, repl, repl, (s_bpa, s_b, s_bpa)) + ((repl,) if masked_k else ()),
    )
    def _eval(params, norm_state, key, batch, K):
        b, y, adj = batch
        if masked_k:
            out = model.apply(params, norm_state, key, b, adj, training=False, k_active=K)
            lm, lf = losses.masked_compute_loss(out.Y, y, K)
        else:
            out = model.apply(params, norm_state, key, b, adj,
                              training_iterations=K, training=False)
            lm, lf = losses.compute_loss(out.Y, y)
        nm = losses.nmse(out.Y[-1], y)   # masked: freeze carries iterate K-1 forward
        return lm, lf, nm

    if masked_k:
        def eval_step(params, norm_state, key, batch, K):
            return _eval(params, norm_state, key, batch, jnp.int32(K))
        return eval_step
    return _eval
