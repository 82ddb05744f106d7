"""Agent-sharded flagship forward: the state-conditioned GNN hypernetwork solver
running with the P agents SHARDED across the device mesh.

Round 1 could shard the GNN family only over the data axis (`cli/evaluate.py`):
the GCN layers needed the whole adjacency row-space, and the reference-faithful
flattened decoder consumed a global `P*4h` feature vector, so the agent axis was
unsplittable. Round 2's pieces make agent sharding possible:

- packed topology (`ops/topology.py`): each shard holds only its LOCAL agents'
  neighbor lists (O(Pl*D)), and the GCN aggregation is the SAME ppermute ring as
  the solver consensus, with per-edge GCN-normalization weights
  (`neighbor_sum_ring_packed(weights=nbr_coeff)`);
- the nodewise decoder (`--decoder_type nodewise`): per-agent MLP, no global
  flatten — agent-local by construction ('same' mode needs one pmean).

Per K-iteration the collective cost is (5 GCN layers + 1 consensus) ring
exchanges of the local feature/primal block — all riding ICI along the agent
axis; nothing materializes a global [B, P, ...] tensor on any device.

Eval/serving mode (training=False semantics: batch-norm running stats, no
dropout) — the serving surface this path exists for. Reference anchor: the
per-iteration hypernetwork forward `gnn_dlasso_models_progressive.py:131-243`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..models import dadmm_core
from ..ops import gcn, sensing
from ..ops import topology as topo_lib
from .mesh import AGENT_AXIS, DATA_AXIS
from .unfolded_sharded import _collective_finite_fn


class ShardedGNNTopology:
    """Host-side bundle of everything the sharded flagship needs about one graph
    batch, all in GLOBAL agent order (axis 1 shards over the agent axis):
    packed neighbor lists + solver degrees + GCN normalization coefficients."""

    def __init__(self, adj, num_shards: int, D: int | None = None):
        import numpy as np

        a = np.asarray(adj)
        self.packed = topo_lib.pack_adjacency_sharded(a, num_shards, D)
        full = topo_lib.pack_adjacency(a, D)
        self.self_coeff, self.nbr_coeff = topo_lib.gcn_norm_coeffs(full)

    def tree(self):
        return (self.packed, self.self_coeff, self.nbr_coeff)

    @staticmethod
    def specs():
        sp = topo_lib.ShardedPackedTopology(
            nbr_shard=P(DATA_AXIS, AGENT_AXIS), nbr_local=P(DATA_AXIS, AGENT_AXIS),
            mask=P(DATA_AXIS, AGENT_AXIS), deg=P(DATA_AXIS, AGENT_AXIS),
        )
        return (sp, P(DATA_AXIS, AGENT_AXIS), P(DATA_AXIS, AGENT_AXIS))


_DROPOUT = 0.1  # matches models/gnn_hypernet._DROPOUT


def _collective_batch_norm(x, bnp, bns, training, momentum=0.1, eps=1e-5):
    """Batch-norm whose training statistics run over the GLOBAL B*P node axis via
    psum over both mesh axes — bit-comparable to the dense `gcn.batch_norm`
    (two-pass mean/var, same formula). Eval mode reads running stats locally."""
    if not training:
        y, _ = gcn.batch_norm(x, bnp, bns, training=False)
        return y, bns
    count = lax.psum(jnp.asarray(x.shape[0] * x.shape[1], x.dtype),
                     (DATA_AXIS, AGENT_AXIS)) / 1.0
    mean = lax.psum(jnp.sum(x, axis=(0, 1)), (DATA_AXIS, AGENT_AXIS)) / count
    var = lax.psum(jnp.sum((x - mean) ** 2, axis=(0, 1)),
                   (DATA_AXIS, AGENT_AXIS)) / count
    new_state = {
        "mean": (1 - momentum) * bns["mean"] + momentum * mean,
        "var": (1 - momentum) * bns["var"] + momentum * var,
    }
    y = (x - mean) * lax.rsqrt(var + eps) * bnp["scale"] + bnp["bias"]
    return y, new_state


def _sliced_dropout(key, x, B, Pg, training):
    """Dense-exact dropout under sharding: draw the GLOBAL [B, Pg, F] mask (feature
    maps are small — this never materializes solver-state-sized tensors) and slice
    this shard's block, so the sharded forward reproduces the dense forward's
    randomness bit-for-bit. Statistically-independent per-shard masks would also be
    valid but untestable against the dense path. Pg == x.shape[1] means the node
    axis is replicated (the 'same'-mode pooled row): only the batch axis slices."""
    if not training:
        return x
    keep = 1.0 - _DROPOUT
    mask = jax.random.bernoulli(key, keep, (B, Pg) + x.shape[2:])
    bl, pl = x.shape[0], x.shape[1]
    b0 = lax.axis_index(DATA_AXIS) * bl
    p0 = 0 if Pg == pl else lax.axis_index(AGENT_AXIS) * pl
    mask_loc = lax.dynamic_slice(mask, (b0, p0) + (0,) * (x.ndim - 2),
                                 x.shape)
    return jnp.where(mask_loc, x / keep, 0.0)


def make_sharded_gnn_forward(mesh: Mesh, model, remat: bool = True,
                             training: bool = False, _raw: bool = False):
    """Build a jitted agent+data-sharded flagship forward.

    Signature: `(params, norm_state, state0, key, b, topo_tree) -> (Y, new_state)`
    with Y [K, B, P, n]; `new_state` is the updated batch-norm running stats
    (== input state in eval mode).

    `model` is a `DLASSOGNNHyp` with `encoder_type='gcn'` and
    `decoder_type='nodewise'` (the two agent-local choices; anything else needs
    global tensors and is rejected). Params/norm-state replicated; b shards
    [B, P, m] over (data, agents); `topo_tree` is `ShardedGNNTopology.tree()`.

    training=True runs the full training-mode semantics COLLECTIVELY: batch-norm
    statistics psum over the global node axis, dropout masks drawn globally and
    sliced per shard — bit-comparable to the dense `model.apply(training=True)`
    (tested on the virtual mesh, tests/test_gnn_sharded.py)."""
    if model.cfg.encoder_type != "gcn":
        raise ValueError("agent-sharded flagship needs encoder_type='gcn'")
    if model.cfg.decoder_type != "nodewise":
        raise ValueError("agent-sharded flagship needs decoder_type='nodewise' "
                         "(the flattened reference head consumes a global P*4h "
                         "vector and cannot shard over agents)")
    n_shards = mesh.shape[AGENT_AXIS]
    K = model.K
    Pg = model.P
    same_mode = model.mode == "same"
    maxes = model.maxes

    def ring_sum(packed, x, weights=None):
        return topo_lib.neighbor_sum_ring_packed(
            packed.nbr_shard, packed.nbr_local, packed.mask, x,
            num_shards=n_shards, axis_name=AGENT_AXIS, weights=weights)

    def local_forward(params, norm_state, state, key, A_loc, b,
                      packed, self_c, nbr_c):
        B_global = b.shape[0] * mesh.shape[DATA_AXIS]
        Atb = sensing.At_apply(A_loc, b)
        # Same solver-dtype cast as the dense flagship apply (gnn_hypernet.py:560):
        # with cfg.dtype='bfloat16' the scan carry and Atb run narrow here too, so
        # agent-sharded serving honors --dtype instead of silently staying f32.
        state, Atb = dadmm_core.cast_solver_dtype(state, Atb, model.solver_dtype)
        gram_fn = dadmm_core.make_gram_fn(
            None if model.cfg.gram_mode == "factored" else sensing.gram(A_loc),
            A_loc if model.cfg.gram_mode != "gram" else None,
            model.cfg.gram_mode)
        deg = packed.deg

        def encoder(x, bn_state, k_enc):
            # 5 GCN layers; aggregation = self term + GCN-weighted ring sum.
            n_convs = len(params["encoder"]["convs"])
            keys = jax.random.split(k_enc, n_convs)
            new_bn = []
            for i, (conv, bnp, bns) in enumerate(zip(
                    params["encoder"]["convs"], params["encoder"]["bn"],
                    bn_state["bn"])):
                agg = self_c[..., None] * x + ring_sum(packed, x, weights=nbr_c)
                x = gcn.leaky_relu(agg @ conv["w"] + conv["b"])
                x, s = _collective_batch_norm(x, bnp, bns, training)
                new_bn.append(s)
                if i < n_convs - 1:
                    x = _sliced_dropout(keys[i], x, B_global, Pg, training)
            ln = params["encoder"]["ln"]
            return gcn.layer_norm(x, ln["scale"], ln["bias"]), {"bn": new_bn}

        def decoder(h_nodes, k_dec):
            if same_mode:
                pooled = jnp.mean(h_nodes, axis=1, keepdims=True)
                h_nodes = lax.pmean(pooled, AGENT_AXIS)
            x = h_nodes
            keys = jax.random.split(k_dec, 2)
            p_mask = 1 if same_mode else Pg
            for i, lyr in enumerate(params["decoder"]["layers"]):
                x = x @ lyr["w"] + lyr["b"]
                x = _sliced_dropout(keys[i], x, B_global, p_mask, training)
                x = gcn.layer_norm(x, lyr["ln_scale"], lyr["ln_bias"])
                x = gcn.leaky_relu(x)
            fc = params["decoder"]["fc"]
            return x @ fc["w"] + fc["b"]

        k_init, k_scan = jax.random.split(key)
        del k_init  # state0 is an explicit input; k_init kept for key parity

        def body(carry, k):
            st, bn_state = carry
            kk = jax.random.fold_in(k_scan, k)
            k_enc, k_dec = jax.random.split(kk)
            AtAy = gram_fn(st.y)
            feats = jnp.concatenate([AtAy, Atb], axis=-1)
            h, new_bn = encoder(feats, bn_state, k_enc)
            out = decoder(h, k_dec)                       # [B, Pl|1, 4]
            hyp = jnp.clip(jax.nn.sigmoid(out), 1e-4, 0.9999)
            scaled = hyp * maxes[None, None, :]
            alpha = scaled[..., 0:1]
            tau = jnp.minimum(scaled[..., 1:2], 0.9999)
            rho = jnp.minimum(scaled[..., 2:3], 0.9999)
            eta = jnp.minimum(scaled[..., 3:4], 0.9999)
            nxt = dadmm_core.dadmm_step(
                st, AtAy, Atb, deg, alpha, tau, rho, eta,
                dadmm_core.gnn_clamps(k), None,
                consensus_fn=lambda _a, y: 2.0 * (
                    deg[..., None] * y - ring_sum(packed, y)),
                nan_guard=model.cfg.nan_guard,
                finite_fn=_collective_finite_fn,
            )
            return (nxt, new_bn), nxt.y

        if remat:
            body = jax.checkpoint(body)
        (st, bn_state), Y = lax.scan(
            body, (state, norm_state), jnp.arange(K, dtype=jnp.int32))
        return Y, bn_state

    state_spec = dadmm_core.SolverState(
        y=P(DATA_AXIS, AGENT_AXIS), U=P(DATA_AXIS, AGENT_AXIS),
        delta=P(DATA_AXIS, AGENT_AXIS))
    shard_fn = jax.shard_map(
        local_forward,
        mesh=mesh,
        in_specs=(P(), P(), state_spec, P(), P(AGENT_AXIS),
                  P(DATA_AXIS, AGENT_AXIS)) + ShardedGNNTopology.specs(),
        out_specs=(P(None, DATA_AXIS, AGENT_AXIS), P()),
        check_vma=False,
    )
    A = model.A
    fn = lambda params, norm_state, state, key, b, topo_tree: shard_fn(  # noqa: E731
        params, norm_state, state, key, A, b, *topo_tree)
    return fn if _raw else jax.jit(fn)


def make_sharded_gnn_train_step(mesh: Mesh, model, tx, remat: bool = True):
    """Full agent+data-sharded flagship TRAINING step: value_and_grad through the
    shard-mapped forward (shard_map is differentiable — psum/ppermute transpose to
    the correct cross-shard gradient flow), loss + AdamW update outside.

    Signature: `(params, norm_state, opt_state, state0, key, b, y_label,
    topo_tree) -> (params, norm_state, opt_state, lm, lf)`. Params/opt replicated;
    `state0` is the solver init (callers derive it from the step key exactly like
    the dense `apply` does, so trajectories match the dense step — tested).

    This differs from `shard_step.make_gnn_train_step` (GSPMD: annotate + let the
    partitioner choose collectives, dense adjacency) in being the EXPLICIT
    -schedule path: packed O(Pl*D) topology, ppermute-ring GCN aggregation and
    consensus — the pod-scale flagship trainer where dense [B,P,P] no longer fits.
    """
    import optax

    from ..train import losses as losses_lib

    fwd = make_sharded_gnn_forward(mesh, model, remat=remat, training=True,
                                   _raw=True)

    @jax.jit
    def step(params, norm_state, opt_state, state0, key, b, y_label, topo_tree):
        def loss_fn(p):
            Y, new_state = fwd(p, norm_state, state0, key, b, topo_tree)
            lm, lf = losses_lib.compute_loss(Y, y_label)
            return lf, (lm, new_state)

        (lf, (lm, new_state)), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(g, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_state, new_opt, lm, lf

    return step
