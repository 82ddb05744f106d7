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


def make_sharded_gnn_forward(mesh: Mesh, model, remat: bool = True):
    """Build a jitted `(params, norm_state, state0, b, topo_tree) -> Y [K,B,P,n]`
    agent+data-sharded flagship forward (eval semantics).

    `model` is a `DLASSOGNNHyp` with `encoder_type='gcn'` and
    `decoder_type='nodewise'` (the two agent-local choices; anything else needs
    global tensors and is rejected). Params/norm-state are replicated; b shards
    [B, P, m] over (data, agents); `topo_tree` is `ShardedGNNTopology.tree()`.
    Equivalence to the dense `model.apply(training=False)` is tested on the
    virtual mesh (tests/test_gnn_sharded.py).
    """
    if model.cfg.encoder_type != "gcn":
        raise ValueError("agent-sharded flagship needs encoder_type='gcn'")
    if model.cfg.decoder_type != "nodewise":
        raise ValueError("agent-sharded flagship needs decoder_type='nodewise' "
                         "(the flattened reference head consumes a global P*4h "
                         "vector and cannot shard over agents)")
    n_shards = mesh.shape[AGENT_AXIS]
    K = model.K
    same_mode = model.mode == "same"
    maxes = model.maxes

    def ring_sum(packed, x, weights=None):
        return topo_lib.neighbor_sum_ring_packed(
            packed.nbr_shard, packed.nbr_local, packed.mask, x,
            num_shards=n_shards, axis_name=AGENT_AXIS, weights=weights)

    def local_forward(params, norm_state, state, A_loc, b, packed, self_c, nbr_c):
        Atb = sensing.At_apply(A_loc, b)
        gram_fn = dadmm_core.make_gram_fn(
            None if model.cfg.gram_mode == "factored" else sensing.gram(A_loc),
            A_loc if model.cfg.gram_mode != "gram" else None,
            model.cfg.gram_mode)
        deg = packed.deg

        def encoder(x):
            # 5 GCN layers; aggregation = self term + GCN-weighted ring sum.
            for conv, bnp, bns in zip(params["encoder"]["convs"],
                                      params["encoder"]["bn"],
                                      norm_state["bn"]):
                agg = self_c[..., None] * x + ring_sum(packed, x, weights=nbr_c)
                x = gcn.leaky_relu(agg @ conv["w"] + conv["b"])
                x, _ = gcn.batch_norm(x, bnp, bns, training=False)
            ln = params["encoder"]["ln"]
            return gcn.layer_norm(x, ln["scale"], ln["bias"])

        def decoder(h_nodes):
            if same_mode:
                pooled = jnp.mean(h_nodes, axis=1, keepdims=True)
                h_nodes = lax.pmean(pooled, AGENT_AXIS)
            x = h_nodes
            for lyr in params["decoder"]["layers"]:
                x = x @ lyr["w"] + lyr["b"]
                x = gcn.layer_norm(x, lyr["ln_scale"], lyr["ln_bias"])
                x = gcn.leaky_relu(x)
            fc = params["decoder"]["fc"]
            return x @ fc["w"] + fc["b"]

        def body(st, k):
            AtAy = gram_fn(st.y)
            feats = jnp.concatenate([AtAy, Atb], axis=-1)
            h = encoder(feats)
            out = decoder(h)                              # [B, Pl|1, 4]
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
            return nxt, nxt.y

        if remat:
            body = jax.checkpoint(body)
        _, Y = lax.scan(body, state, jnp.arange(K, dtype=jnp.int32))
        return Y

    state_spec = dadmm_core.SolverState(
        y=P(DATA_AXIS, AGENT_AXIS), U=P(DATA_AXIS, AGENT_AXIS),
        delta=P(DATA_AXIS, AGENT_AXIS))
    shard_fn = jax.shard_map(
        local_forward,
        mesh=mesh,
        in_specs=(P(), P(), state_spec, P(AGENT_AXIS),
                  P(DATA_AXIS, AGENT_AXIS)) + ShardedGNNTopology.specs(),
        out_specs=P(None, DATA_AXIS, AGENT_AXIS),
        check_vma=False,
    )
    A = model.A
    return jax.jit(lambda params, norm_state, state, b, topo_tree: shard_fn(
        params, norm_state, state, A, b, *topo_tree))
