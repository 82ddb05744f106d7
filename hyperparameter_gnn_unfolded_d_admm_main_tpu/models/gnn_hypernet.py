"""GNN hypernetwork D-ADMM: per-agent, per-iteration hyperparameters from a GCN stack.

TPU-native re-design of reference `gnn_dlasso_models_progressive.py`:

- `GNNHypernetwork3` (`:9-72`): 5 GCNConv layers m->h->2h->4h->4h->4h with BatchNorm +
  LeakyReLU + Dropout(0.1) and a final LayerNorm. Here the per-sample conv loop
  (`:37-44`) is one batched einsum over the normalized adjacency; batch-norm statistics
  run over the B*P node axis (documented in `ops/gcn.py:batch_norm`).
- `DLASSO_GNNHyp3_Progressive` (`:75-243`): the D-ADMM core of `models/dadmm_core.py`
  where (alpha, tau, rho, eta) are recomputed EVERY iteration from the current state:
  features `[A^T A y_k || A^T b]` -> encoder -> flatten -> decoder MLP -> fc -> sigmoid
  -> clamp [1e-4, 0.9999] -> scale by (alpha_max, tau_max, rho_max, eta_max). The K loop
  is a `lax.scan` whose carry includes the batch-norm running stats; `training_iterations`
  drives the progressive schedule (one compiled program per distinct K).

Parameters and norm state are plain pytrees; `apply` is pure.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops import gcn, graphs as graph_ops, mpnn, sensing
from . import dadmm_core


# Encoder channel multipliers relative to hidden_dim (reference `:16-20`).
_ENC_MULT = [1, 2, 4, 4, 4]
_DROPOUT = 0.1


def _init_encoder(key: jax.Array, in_dim: int, hidden: int, dtype,
                  encoder_type: str = "gcn") -> Tuple[dict, dict]:
    dims = [in_dim] + [m * hidden for m in _ENC_MULT]
    keys = jax.random.split(key, len(_ENC_MULT) + 1)
    ln = {"scale": jnp.ones((dims[-1],), dtype), "bias": jnp.zeros((dims[-1],), dtype)}
    if encoder_type == "gcn":
        convs, bn_params, bn_state = [], [], []
        for i in range(len(_ENC_MULT)):
            w = gcn.xavier_uniform(keys[i], dims[i], dims[i + 1], dtype=dtype)
            b = jnp.zeros((dims[i + 1],), dtype)
            convs.append({"w": w, "b": b})
            p, s = gcn.batch_norm_init(dims[i + 1], dtype)
            bn_params.append(p)
            bn_state.append(s)
        return {"convs": convs, "bn": bn_params, "ln": ln}, {"bn": bn_state}
    if encoder_type == "mpnn":
        layers, bn_params, bn_state = [], [], []
        for i in range(len(_ENC_MULT)):
            layers.append(mpnn.mpnn_init(keys[i], dims[i], dims[i + 1], dtype))
            p, s = gcn.batch_norm_init(dims[i + 1], dtype)
            bn_params.append(p)
            bn_state.append(s)
        return {"mpnn": layers, "bn": bn_params, "ln": ln}, {"bn": bn_state}
    if encoder_type == "attention":
        lift = {
            "w": gcn.xavier_uniform(keys[0], in_dim, dims[-1], dtype=dtype),
            "b": jnp.zeros((dims[-1],), dtype),
        }
        attn = [mpnn.attention_init(keys[i + 1], dims[-1]) for i in range(3)]
        return {"lift": lift, "attn": attn, "ln": ln}, {"bn": []}
    raise ValueError(f"unknown encoder_type {encoder_type!r}")


def _apply_encoder(
    params: dict,
    state: dict,
    key: jax.Array,
    x: jax.Array,
    norm_adj: jax.Array,
    adj: jax.Array,
    training: bool,
) -> Tuple[jax.Array, dict]:
    """x [B,P,2n] -> flattened [B, P*4h] (reference `:37-72` for the gcn stack)."""
    B = x.shape[0]
    if "convs" in params:
        new_bn = []
        keys = jax.random.split(key, len(params["convs"]))
        for i, (conv, bnp, bns) in enumerate(zip(params["convs"], params["bn"], state["bn"])):
            x = gcn.leaky_relu(gcn.gcn_layer(norm_adj, x, conv["w"], conv["b"]))
            x, s = gcn.batch_norm(x, bnp, bns, training)
            new_bn.append(s)
            if i < len(params["convs"]) - 1:
                x = gcn.dropout(keys[i], x, _DROPOUT, training)
        # Final layer: BatchNorm then LayerNorm, no dropout (reference `:68-70`).
        x = gcn.layer_norm(x, params["ln"]["scale"], params["ln"]["bias"])
        return x.reshape(B, -1), {"bn": new_bn}
    if "mpnn" in params:
        new_bn = []
        keys = jax.random.split(key, len(params["mpnn"]))
        for i, (lyr, bnp, bns) in enumerate(zip(params["mpnn"], params["bn"], state["bn"])):
            x = mpnn.mpnn_layer(lyr, keys[i], x, adj, training, _DROPOUT)
            x, s = gcn.batch_norm(x, bnp, bns, training)
            new_bn.append(s)
        x = gcn.layer_norm(x, params["ln"]["scale"], params["ln"]["bias"])
        return x.reshape(B, -1), {"bn": new_bn}
    # attention encoder
    x = gcn.leaky_relu(x @ params["lift"]["w"] + params["lift"]["b"])
    for lyr in params["attn"]:
        x = mpnn.graph_attention_layer(lyr, x, adj)
    x = gcn.layer_norm(x, params["ln"]["scale"], params["ln"]["bias"])
    return x.reshape(B, -1), state


def _init_decoder(key: jax.Array, P: int, hidden: int, out_dim: int, dtype,
                  bias_init=None) -> dict:
    """3-layer MLP P*4h -> 4h -> 2h -> h with LayerNorm (reference `:93-106`), plus the
    fc head with xavier(gain=0.1) and the conservative bias init (reference `:108-123`).

    bias_init: full-length [out_dim] fc-bias vector for non-LASSO heads. When None,
    the reference's LASSO behavior is kept: only flat entries 0..3 are set (which in
    'diff' mode land on agent 0..3's first hyperparameter — faithful to
    `gnn_dlasso_models_progressive.py:118-123`)."""
    dims = [P * 4 * hidden, 4 * hidden, 2 * hidden, hidden]
    keys = jax.random.split(key, 4)
    layers = []
    for i in range(3):
        fan_in, fan_out = dims[i], dims[i + 1]
        limit = jnp.sqrt(1.0 / fan_in)  # torch Linear default: U(-1/sqrt(fan_in), ..)
        w = jax.random.uniform(keys[i], (fan_in, fan_out), dtype, -limit, limit)
        b = jax.random.uniform(jax.random.fold_in(keys[i], 1), (fan_out,), dtype, -limit, limit)
        layers.append({
            "w": w, "b": b,
            "ln_scale": jnp.ones((fan_out,), dtype),
            "ln_bias": jnp.zeros((fan_out,), dtype),
        })
    fc_w = gcn.xavier_uniform(keys[3], hidden, out_dim, gain=0.1, dtype=dtype)
    if bias_init is not None:
        fc_b = jnp.asarray(bias_init, dtype)
    else:
        fc_b = jnp.zeros((out_dim,), dtype)
        # Conservative start (reference `:118-123`): only the first 4 entries are set.
        fc_b = fc_b.at[0].set(-0.5).at[1].set(-1.0).at[2].set(-0.8).at[3].set(-1.2)
    return {"layers": layers, "fc": {"w": fc_w, "b": fc_b}}


def _apply_decoder(params: dict, key: jax.Array, x: jax.Array, training: bool) -> jax.Array:
    keys = jax.random.split(key, 3)
    for i, lyr in enumerate(params["layers"]):
        x = x @ lyr["w"] + lyr["b"]
        x = gcn.dropout(keys[i], x, _DROPOUT, training)
        x = gcn.layer_norm(x, lyr["ln_scale"], lyr["ln_bias"])
        x = gcn.leaky_relu(x)
    return x @ params["fc"]["w"] + params["fc"]["b"]


def _init_decoder_nodewise(key: jax.Array, hidden: int, mode: str, dtype) -> dict:
    """P-scalable head (`--decoder_type nodewise`): a SHARED per-agent MLP
    4h -> 2h -> h -> 4 applied to each node embedding, so the parameter count is
    independent of P (the reference's flattened decoder is O(P) parameters by
    construction, `gnn_dlasso_models_progressive.py:93-106` — the published design's
    scalability ceiling). 'same' mode mean-pools node embeddings before the MLP.

    fc uses the same conservative start as the flattened head (xavier gain 0.1 and
    the reference's bias values `:118-123`) — here the bias applies to every agent's
    (alpha, tau, rho, eta) rather than flat entries 0..3, which is the scalable
    generalization of that intent."""
    dims = [4 * hidden, 2 * hidden, hidden]
    keys = jax.random.split(key, 3)
    layers = []
    for i in range(2):
        fan_in, fan_out = dims[i], dims[i + 1]
        limit = jnp.sqrt(1.0 / fan_in)
        w = jax.random.uniform(keys[i], (fan_in, fan_out), dtype, -limit, limit)
        b = jax.random.uniform(jax.random.fold_in(keys[i], 1), (fan_out,), dtype, -limit, limit)
        layers.append({
            "w": w, "b": b,
            "ln_scale": jnp.ones((fan_out,), dtype),
            "ln_bias": jnp.zeros((fan_out,), dtype),
        })
    fc_w = gcn.xavier_uniform(keys[2], hidden, 4, gain=0.1, dtype=dtype)
    fc_b = jnp.asarray([-0.5, -1.0, -0.8, -1.2], dtype)
    del mode  # pooling happens at apply time; params are mode-independent
    return {"layers": layers, "fc": {"w": fc_w, "b": fc_b}}


def _apply_decoder_nodewise(params: dict, key: jax.Array, h_nodes: jax.Array,
                            mode: str, training: bool) -> jax.Array:
    """h_nodes [B, P, 4h] -> raw hyp logits: [B, P, 4] ('diff') or [B, 1, 4] ('same').
    The MLP weights are shared across agents — one batched matmul over B*P rows."""
    if mode == "same":
        h_nodes = jnp.mean(h_nodes, axis=1, keepdims=True)
    x = h_nodes
    keys = jax.random.split(key, 2)
    for i, lyr in enumerate(params["layers"]):
        x = x @ lyr["w"] + lyr["b"]
        x = gcn.dropout(keys[i], x, _DROPOUT, training)
        x = gcn.layer_norm(x, lyr["ln_scale"], lyr["ln_bias"])
        x = gcn.leaky_relu(x)
    return x @ params["fc"]["w"] + params["fc"]["b"]


def _check_k_args(training_iterations, k_active):
    """The two K knobs are mutually exclusive: `training_iterations` truncates the
    scan statically (one program per K), `k_active` masks a max-K scan (one program
    total). Passing both would silently mask a truncated scan against an unrelated
    bound — reject loudly instead."""
    if training_iterations is not None and k_active is not None:
        raise ValueError("pass either training_iterations (static K) or k_active "
                         "(masked max-K), not both")


def _freeze_inactive(k, k_active, new_tree, old_tree):
    """Masked-K scan step gate: keep `new_tree` while `k < k_active`, else carry
    `old_tree` forward unchanged. jnp.where on a scalar predicate gives exact zero
    gradient through the frozen branch, so a max-K scan masked to k_active is
    gradient-equivalent to a scan of length k_active."""
    act = jnp.asarray(k, jnp.int32) < jnp.asarray(k_active, jnp.int32)
    return jax.tree_util.tree_map(
        lambda new, old: jnp.where(act, new, old), new_tree, old_tree
    )


class GNNHypOutput(NamedTuple):
    Y: jax.Array           # [K, B, P, n] per-iteration primal iterates
    hyp_last: Tuple[jax.Array, jax.Array, jax.Array, jax.Array]  # (alpha,tau,rho,eta) [B,Pp,1]
    state: dict            # updated batch-norm running stats


class DLASSOGNNHypOneShot(object):
    """One-shot GNN hypernetwork: the whole `[K, Pp, 4]` hyperparameter table from a
    SINGLE graph-conditioned GNN evaluation, then a plain table-driven unroll.

    Re-design of the reference's first hypernetwork generation
    (`old code/gnn_dlasso_models.py:9-160`): MLP encoder on the per-agent observations
    -> 2 GCN layers -> global mean pool -> MLP head emitting the full table, with the
    cumulative-sum-over-K parameterization of `:43` (later iterations are learned
    offsets), sigmoid + cap scaling as in `models/seq_hyperparam.py`.

    Capability tier between the scalar table (graph-independent) and the flagship
    state-conditioned model (K GNN evaluations per forward): topology-adaptive but ONE
    hypernetwork call per solve — on TPU the unroll itself then runs at table-tier
    speed, which is the serving-relevant point of this design. Because the table is
    cumsum-parameterized along K, truncating to the progressive schedule's K is exactly
    the table of the truncated problem (prefix property), so the same progressive
    trainer drives it (select with `--hyp_mode GHyp1`).
    """

    def __init__(self, A: jax.Array, cfg: Config):
        self.A = A
        self.AtA = sensing.gram(A)
        self.gram_fn = dadmm_core.make_gram_fn(self.AtA, A, cfg.gram_mode)
        self.solver_dtype = cfg.dtype if cfg.dtype != "float32" else None
        self.P, self.m, self.n = A.shape
        self.K = cfg.GHN_iter_num
        self.hidden = int(cfg.GHyp_hidden)
        self.mode = cfg.DADMM_mode
        self.cfg = cfg
        self.Pp = 1 if cfg.DADMM_mode == "same" else self.P
        self.maxes = jnp.asarray(
            [cfg.alpha_max, cfg.tau_max, cfg.rho_max, cfg.eta_max], dtype=A.dtype
        )

    def init(self, key: jax.Array) -> Tuple[dict, dict]:
        h, dt = self.hidden, self.A.dtype
        ks = jax.random.split(key, 6)
        dense = lambda k, i, o: {
            "w": gcn.xavier_uniform(k, i, o, dtype=dt), "b": jnp.zeros((o,), dt)
        }
        # Head parameter count: the faithful pooled head emits the whole K*Pp*4
        # table (O(K*P) params in 'diff' mode — the v1 design's scalability
        # ceiling, like the flagship's flattened decoder); `--decoder_type
        # nodewise` instead applies a SHARED per-node head emitting each agent's
        # K*4 rows from its own embedding — P-independent parameters. Both heads
        # keep the zero-init final layer (see the stability note below).
        nodewise = self.cfg.decoder_type == "nodewise" and self.mode != "same"
        head_out = self.K * 4 if nodewise else self.K * self.Pp * 4
        params = {
            # per-agent observation encoder (reference v1 flattens b into an MLP,
            # `old code/gnn_dlasso_models.py:36-38`)
            "enc": [dense(ks[0], self.m, h), dense(ks[1], h, h)],
            # 2 graph-conv layers (v1 `:39-40`), batched norm-adjacency matmuls
            "convs": [dense(ks[2], h, 2 * h), dense(ks[3], 2 * h, 2 * h)],
            # head -> full table; zero-init final layer => the table starts at
            # EXACTLY sigmoid(0)*max for every sample, the same starting point as the
            # zero-init scalar table (models/seq_hyperparam.py). A nonzero (even
            # gain-0.1 Xavier) init here proved unstable in K=25 training: gradients
            # through the cumsum accumulate over all later iterations AND the head's
            # ~4h-dim feature dot products amplify the effective step on `raw`, driving
            # tau/rho/eta into the 0.99 clamp within two epochs.
            "head": [
                dense(ks[4], 2 * h, 4 * h),
                {
                    "w": jnp.zeros((4 * h, head_out), dt),
                    "b": jnp.zeros((head_out,), dt),
                },
            ],
        }
        return params, {}

    # Damping on the head's raw output before the cumsum: the gradient of iteration
    # k's hyperparameters reaches every raw[j], j<=k, so head updates are effectively
    # K-fold amplified relative to the scalar table's directly-owned raw params. 0.1
    # keeps the per-step table drift comparable to the stable scalar-table tier.
    RAW_SCALE = 0.1

    def table(self, params: dict, b: jax.Array, adj: jax.Array,
              K: Optional[int] = None, training: bool = True) -> jax.Array:
        """Per-sample hyperparameter table `[B, K, Pp, 4]` from one GNN evaluation."""
        K = self.K if K is None else int(K)
        B = b.shape[0]
        x = b
        for lyr in params["enc"]:
            x = gcn.leaky_relu(x @ lyr["w"] + lyr["b"])          # [B,P,h]
        norm_adj = graph_ops.gcn_norm_adj(adj)
        for lyr in params["convs"]:
            x = gcn.leaky_relu(gcn.gcn_layer(norm_adj, x, lyr["w"], lyr["b"]))
        if self.cfg.decoder_type == "nodewise" and self.mode != "same":
            # P-scalable head: each agent's K*4 table rows from ITS embedding via
            # the shared MLP (no pooling, no O(K*P) output layer)
            h = gcn.leaky_relu(x @ params["head"][0]["w"] + params["head"][0]["b"])
            raw = h @ params["head"][1]["w"] + params["head"][1]["b"]  # [B,P,K*4]
            raw = jnp.moveaxis(raw.reshape(B, self.P, self.K, 4), 1, 2)
            raw = self.RAW_SCALE * raw[:, :K]
        else:
            pooled = jnp.mean(x, axis=1)                          # global mean pool (v1 `:41`)
            h = gcn.leaky_relu(pooled @ params["head"][0]["w"] + params["head"][0]["b"])
            raw = h @ params["head"][1]["w"] + params["head"][1]["b"]
            raw = self.RAW_SCALE * raw.reshape(B, self.K, self.Pp, 4)[:, :K]
        # cumsum over K (v1 `:43`) + sigmoid/cap as in seq_hyperparam.hyp_table
        table = jax.nn.sigmoid(jnp.cumsum(raw, axis=1)) * self.maxes
        if training:
            # Same soft anti-saturation penalty as the scalar table
            # (seq_hyperparam.hyp_table / reference unfolded_DLASSO.py:160-165),
            # applied per sample per iteration.
            means = jnp.mean(table, axis=(2, 3))                  # [B,K]
            scale = jnp.where(means > 0.8, 0.95, 1.0)
            table = table * scale[..., None, None]
        return jnp.clip(table, 1e-4, 0.99)

    def _unroll(self, params, key, b, adj, K, with_losses, label=None, training=True,
                k_active=None):
        B = b.shape[0]
        Atb = sensing.At_apply(self.A, b)
        deg = graph_ops.degrees(adj)
        table = self.table(params, b, adj, K, training=training)  # [B,K,Pp,4]
        table_k = jnp.moveaxis(table, 1, 0)                       # scan xs: [K,B,Pp,4]
        st0 = dadmm_core.init_state(key, B, self.P, self.n, dtype=b.dtype)
        st0, Atb = dadmm_core.cast_solver_dtype(st0, Atb, self.solver_dtype)
        nan_guard = self.cfg.nan_guard

        def body(st, xs):
            k, hyp_k = xs                                         # hyp_k [B,Pp,4]
            AtAy = self.gram_fn(st.y)
            hyp_k = self._step_hyp(params, st, AtAy, Atb, hyp_k)  # hook (GHyp1c)
            nxt = dadmm_core.dadmm_step(
                st, AtAy, Atb, deg,
                hyp_k[..., 0:1], hyp_k[..., 1:2], hyp_k[..., 2:3], hyp_k[..., 3:4],
                dadmm_core.gnn_clamps(k), adj, nan_guard=nan_guard,
            )
            if k_active is not None:
                # masked-K: the cumsum table's prefix property makes the full table
                # valid for any truncation; freezing k >= k_active reproduces the
                # sliced scan exactly (state AND gradients)
                nxt = _freeze_inactive(k, k_active, nxt, st)
            if with_losses:
                diff = (nxt.y - label[:, None, :]).astype(jnp.float32)
                return nxt, jnp.mean(diff * diff, axis=(0, 2))    # [P]
            return nxt, nxt.y

        if self.cfg.remat:
            body = jax.checkpoint(body)
        ks = jnp.arange(table_k.shape[0], dtype=jnp.int32)
        _, out = jax.lax.scan(body, st0, (ks, table_k))
        if k_active is not None:
            idx = jnp.maximum(jnp.asarray(k_active, jnp.int32) - 1, 0)
            hyp_last = tuple(table_k[idx][..., i:i + 1] for i in range(4))
        else:
            hyp_last = tuple(table_k[-1][..., i:i + 1] for i in range(4))
        return out, hyp_last

    def _step_hyp(self, params, st, AtAy, Atb, hyp_k):
        """Per-iteration hyperparameter hook: the plain one-shot tier uses the table
        row as-is; the corrected tier (DLASSOGNNHypOneShotCorrected) multiplies in a
        state-conditioned factor."""
        del params, st, AtAy, Atb
        return hyp_k

    def apply(self, params, state, key, b, adj,
              training_iterations: Optional[int] = None, training: bool = True,
              k_active=None):
        # no dropout/batch-norm in this tier (v1 has none either); `training` only
        # gates the table's anti-saturation penalty
        _check_k_args(training_iterations, k_active)
        K = self.K if training_iterations is None else int(training_iterations)
        Y, hyp_last = self._unroll(params, key, b, adj, K, with_losses=False,
                                   training=training, k_active=k_active)
        return GNNHypOutput(Y=Y, hyp_last=hyp_last, state=state)

    def apply_losses(self, params, state, key, b, adj, label,
                     training_iterations: Optional[int] = None, training: bool = True,
                     k_active=None):
        _check_k_args(training_iterations, k_active)
        K = self.K if training_iterations is None else int(training_iterations)
        per_kp, hyp_last = self._unroll(params, key, b, adj, K,
                                        with_losses=True, label=label,
                                        training=training, k_active=k_active)
        return per_kp, hyp_last, state

    def apply_final(self, params, state, key, b, adj,
                    training_iterations: Optional[int] = None,
                    training: bool = False) -> jax.Array:
        """Serving fast path: final iterate `y [B, P, n]` only — the scan emits
        NO stacked per-iteration output, so the [K,B,P,n] materialization is
        structurally absent (the table-tier analogue measured +26%,
        `UnfoldedDLASSO.apply_final`). Trajectory-identical to `apply(...).Y[-1]`
        (tests/test_gnn_hypernet.py)."""
        K = self.K if training_iterations is None else int(training_iterations)
        B = b.shape[0]
        Atb = sensing.At_apply(self.A, b)
        deg = graph_ops.degrees(adj)
        table_k = jnp.moveaxis(
            self.table(params, b, adj, K, training=training), 1, 0)
        st0 = dadmm_core.init_state(key, B, self.P, self.n, dtype=b.dtype)
        st0, Atb = dadmm_core.cast_solver_dtype(st0, Atb, self.solver_dtype)
        nan_guard = self.cfg.nan_guard

        def body(st, xs):
            k, hyp_k = xs
            AtAy = self.gram_fn(st.y)
            hyp_k = self._step_hyp(params, st, AtAy, Atb, hyp_k)
            nxt = dadmm_core.dadmm_step(
                st, AtAy, Atb, deg,
                hyp_k[..., 0:1], hyp_k[..., 1:2], hyp_k[..., 2:3], hyp_k[..., 3:4],
                dadmm_core.gnn_clamps(k), adj, nan_guard=nan_guard,
            )
            return nxt, None

        ks = jnp.arange(table_k.shape[0], dtype=jnp.int32)
        st_fin, _ = jax.lax.scan(body, st0, (ks, table_k))
        del state  # no norm state in this tier
        return st_fin.y


class DLASSOGNNHypOneShotCorrected(DLASSOGNNHypOneShot):
    """One-shot table + cheap state-conditioned correction (`--hyp_mode GHyp1c`).

    Beyond-reference tier between the one-shot hypernetwork (topology-adaptive but
    state-blind after iteration 0) and the flagship (a full GNN evaluation per
    iteration): the GHyp1 table is multiplied per iteration by
    `1 + 0.5*tanh(mlp(state features))`, where the features are three per-agent
    magnitude summaries — mean |A^T A y - A^T b| (gradient residual), mean |delta|
    (consensus residual), mean |y| — log1p-compressed. The corrector is a 3 -> 32 ->
    4*Pp MLP whose OUTPUT layer is zero-initialized, so at init this tier is exactly
    GHyp1 (tanh(0)=0); training can then bend each table entry by at most 2x/0.5x
    based on the live solver state. Serving cost stays table-tier: one GNN evaluation
    plus K tiny (3x32x4) MLPs — no per-iteration graph convolutions.
    """

    CORR_HIDDEN = 32
    CORR_SCALE = 0.5

    def init(self, key: jax.Array) -> Tuple[dict, dict]:
        k_base, k_corr = jax.random.split(key)
        params, state = super().init(k_base)
        h, dt = self.CORR_HIDDEN, self.A.dtype
        params["corr"] = {
            "w1": gcn.xavier_uniform(k_corr, 3, h, dtype=dt),
            "b1": jnp.zeros((h,), dt),
            # zero-init head => correction factor exactly 1.0 at init (= GHyp1)
            "w2": jnp.zeros((h, 4), dt),
            "b2": jnp.zeros((4,), dt),
        }
        return params, state

    def _step_hyp(self, params, st, AtAy, Atb, hyp_k):
        c = params["corr"]
        feats = jnp.stack([
            jnp.mean(jnp.abs(AtAy - Atb), axis=-1),    # [B, P] gradient residual
            jnp.mean(jnp.abs(st.delta), axis=-1),      # [B, P] consensus residual
            jnp.mean(jnp.abs(st.y), axis=-1),          # [B, P] iterate magnitude
        ], axis=-1)                                     # [B, P, 3]
        feats = jnp.log1p(feats.astype(c["w1"].dtype))
        raw = gcn.leaky_relu(feats @ c["w1"] + c["b1"]) @ c["w2"] + c["b2"]  # [B,P,4]
        if self.Pp == 1:
            raw = jnp.mean(raw, axis=1, keepdims=True)  # 'same' mode: shared factor
        factor = 1.0 + self.CORR_SCALE * jnp.tanh(raw)
        return jnp.clip(hyp_k.astype(factor.dtype) * factor, 1e-4, 0.99)


def _topology_ops(adj, topo, encoder_type: str = "gcn"):
    """Shared topology prelude: returns (deg, norm_adj_or_agg, consensus_fn, adj).

    Dense: precomputed normalized adjacency + dense Laplacian consensus. Packed
    (`topo` an `ops.topology.PackedTopology`, adj=None): gather-based GCN aggregation
    + packed consensus — O(P·D) topology memory, the pod-scale encoder+solver form
    (requires the gcn encoder; mpnn/attention have no packed form)."""
    if topo is None:
        return (graph_ops.degrees(adj), graph_ops.gcn_norm_adj(adj),
                graph_ops.consensus_delta, adj)
    if encoder_type != "gcn":
        raise ValueError(f"packed topology requires the gcn encoder; "
                         f"encoder_type={encoder_type!r} has no packed form")
    from ..ops import topology as topo_lib

    sc, nc = topo_lib.gcn_norm_coeffs(topo)
    agg = lambda x: topo_lib.gcn_aggregate(topo, x, sc, nc)          # noqa: E731
    consensus = lambda _adj, y: topo_lib.consensus_delta(topo, y)    # noqa: E731
    return topo.deg, agg, consensus, None


class DLASSOGNNHyp(object):
    """Progressive GNN-hypernetwork D-ADMM model (flagship)."""

    def __init__(self, A: jax.Array, cfg: Config):
        self.A = A
        self.AtA = sensing.gram(A)
        self.gram_fn = dadmm_core.make_gram_fn(self.AtA, A, cfg.gram_mode)
        self.solver_dtype = cfg.dtype if cfg.dtype != "float32" else None
        self.P, self.m, self.n = A.shape
        self.K = cfg.GHN_iter_num
        self.hidden = int(cfg.GHyp_hidden)
        self.mode = cfg.DADMM_mode
        self.cfg = cfg
        self.out_dim = 4 if cfg.DADMM_mode == "same" else 4 * self.P
        self.maxes = jnp.asarray(
            [cfg.alpha_max, cfg.tau_max, cfg.rho_max, cfg.eta_max], dtype=A.dtype
        )

    def init(self, key: jax.Array) -> Tuple[dict, dict]:
        k_enc, k_dec = jax.random.split(key)
        enc, enc_state = _init_encoder(
            k_enc, 2 * self.n, self.hidden, self.A.dtype, self.cfg.encoder_type
        )
        if self.cfg.decoder_type == "nodewise":
            dec = _init_decoder_nodewise(k_dec, self.hidden, self.mode, self.A.dtype)
        elif self.cfg.decoder_type == "flattened":
            dec = _init_decoder(k_dec, self.P, self.hidden, self.out_dim, self.A.dtype)
        else:
            raise ValueError(f"unknown decoder_type {self.cfg.decoder_type!r}")
        return {"encoder": enc, "decoder": dec}, enc_state

    def _hyper(self, params, state, key, AtAy, Atb, norm_adj, adj, training):
        """One hypernetwork evaluation -> ((alpha,tau,rho,eta) each [B,Pp,1], state)."""
        B = AtAy.shape[0]
        feats = jnp.concatenate([AtAy, Atb], axis=-1)  # [B,P,2n] (reference `:165`)
        k_enc, k_dec = jax.random.split(key)
        h, new_state = _apply_encoder(
            params["encoder"], state, k_enc, feats, norm_adj, adj, training
        )
        Pp = 1 if self.mode == "same" else self.P
        if self.cfg.decoder_type == "nodewise":
            h_nodes = h.reshape(B, self.P, -1)        # un-flatten the encoder output
            out = _apply_decoder_nodewise(
                params["decoder"], k_dec, h_nodes, self.mode, training
            )                                          # [B, Pp, 4]
            hyp = jnp.clip(jax.nn.sigmoid(out), 1e-4, 0.9999)
            hyp = jnp.transpose(hyp, (0, 2, 1))        # [B, 4, Pp]
        else:
            out = _apply_decoder(params["decoder"], k_dec, h, training)
            hyp = jnp.clip(jax.nn.sigmoid(out), 1e-4, 0.9999)  # (reference `:169-172`)
            hyp = hyp.reshape(B, 4, Pp)
        scaled = hyp * self.maxes[None, :, None]
        alpha = scaled[:, 0, :, None]
        # tau/rho/eta get an extra (no-op at default maxes) cap (reference `:194-196`).
        tau = jnp.minimum(scaled[:, 1, :, None], 0.9999)
        rho = jnp.minimum(scaled[:, 2, :, None], 0.9999)
        eta = jnp.minimum(scaled[:, 3, :, None], 0.9999)
        return (alpha, tau, rho, eta), new_state

    def apply(
        self,
        params: dict,
        state: dict,
        key: jax.Array,
        b: jax.Array,
        adj: jax.Array,
        training_iterations: Optional[int] = None,
        training: bool = True,
        k_active: Optional[jax.Array] = None,
        topo=None,
    ) -> GNNHypOutput:
        """Full unrolled forward (reference `forward`, `:131-243`).

        b [B,P,m], adj [B,P,P]. `training_iterations` overrides K for the progressive
        schedule (static -> one compiled program per distinct K, cached by jit).
        `k_active` (a TRACED int) instead runs the max-K scan with iterations
        k >= k_active masked out (state frozen, zero gradient) — ONE compiled program
        serves every K of the schedule; Y[-1] equals the K=k_active final iterate
        because the freeze carries it forward. `topo` (adj=None) runs BOTH the GCN
        encoder and the solver consensus on packed neighbor lists (pod scale).
        """
        _check_k_args(training_iterations, k_active)
        K = self.K if training_iterations is None else int(training_iterations)
        B = b.shape[0]
        Atb = sensing.At_apply(self.A, b)
        deg, norm_adj, consensus_fn, adj = _topology_ops(adj, topo, self.cfg.encoder_type)
        k_init, k_scan = jax.random.split(key)
        st0 = dadmm_core.init_state(k_init, B, self.P, self.n, dtype=b.dtype)
        st0, Atb = dadmm_core.cast_solver_dtype(st0, Atb, self.solver_dtype)
        nan_guard = self.cfg.nan_guard

        def body(carry, k):
            st, bn_state = carry
            kk = jax.random.fold_in(k_scan, k)
            AtAy = self.gram_fn(st.y)
            (alpha, tau, rho, eta), new_bn = self._hyper(
                params, bn_state, kk, AtAy, Atb, norm_adj, adj, training
            )
            nxt = dadmm_core.dadmm_step(
                st, AtAy, Atb, deg, alpha, tau, rho, eta,
                dadmm_core.gnn_clamps(k), adj, consensus_fn=consensus_fn,
                nan_guard=nan_guard,
            )
            if k_active is not None:
                nxt, new_bn = _freeze_inactive(k, k_active, (nxt, new_bn), (st, bn_state))
            return (nxt, new_bn), (nxt.y, (alpha, tau, rho, eta))

        if self.cfg.remat:
            body = jax.checkpoint(body)
        (st, bn_state), (Y, hyps) = jax.lax.scan(
            body, (st0, state), jnp.arange(K, dtype=jnp.int32)
        )
        if k_active is not None:
            # hyp emitted at the last ACTIVE iteration (later stack rows are computed
            # from the frozen state and are logging noise)
            idx = jnp.maximum(jnp.asarray(k_active, jnp.int32) - 1, 0)
            hyp_last = tuple(h[idx] for h in hyps)
        else:
            hyp_last = tuple(h[-1] for h in hyps)
        return GNNHypOutput(Y=Y, hyp_last=hyp_last, state=bn_state)

    def apply_final(
        self,
        params: dict,
        state: dict,
        key: jax.Array,
        b: jax.Array,
        adj: jax.Array,
        training_iterations: Optional[int] = None,
        training: bool = False,
        topo=None,
    ) -> jax.Array:
        """Serving fast path: final iterate `y [B, P, n]` only — no stacked-Y
        output in the scan (the table-tier analogue measured +26%; serving
        consumes Y[-1] exclusively). Eval-mode norm state is read-only, so no
        state is returned. Trajectory-identical to `apply(...).Y[-1]`."""
        K = self.K if training_iterations is None else int(training_iterations)
        B = b.shape[0]
        Atb = sensing.At_apply(self.A, b)
        deg, norm_adj, consensus_fn, adj = _topology_ops(adj, topo, self.cfg.encoder_type)
        k_init, k_scan = jax.random.split(key)
        st0 = dadmm_core.init_state(k_init, B, self.P, self.n, dtype=b.dtype)
        st0, Atb = dadmm_core.cast_solver_dtype(st0, Atb, self.solver_dtype)
        nan_guard = self.cfg.nan_guard

        def body(carry, k):
            st, bn_state = carry
            kk = jax.random.fold_in(k_scan, k)
            AtAy = self.gram_fn(st.y)
            (alpha, tau, rho, eta), new_bn = self._hyper(
                params, bn_state, kk, AtAy, Atb, norm_adj, adj, training
            )
            nxt = dadmm_core.dadmm_step(
                st, AtAy, Atb, deg, alpha, tau, rho, eta,
                dadmm_core.gnn_clamps(k), adj, consensus_fn=consensus_fn,
                nan_guard=nan_guard,
            )
            return (nxt, new_bn), None

        (st_fin, _), _ = jax.lax.scan(
            body, (st0, state), jnp.arange(K, dtype=jnp.int32)
        )
        return st_fin.y

    def apply_losses(
        self,
        params: dict,
        state: dict,
        key: jax.Array,
        b: jax.Array,
        adj: jax.Array,
        label: jax.Array,
        training_iterations: Optional[int] = None,
        training: bool = True,
        k_active: Optional[jax.Array] = None,
        topo=None,
    ):
        """Training fast path: per-iteration per-agent MSEs `[K, P]` reduced inside the
        scan (no stacked-Y materialization). Returns (per_kp, hyp_last, new_state).

        With `k_active` (traced int), scans max-K with iterations >= k_active frozen
        (reduce the result with `losses.masked_losses_from_per_kp`). `topo` as in
        `apply` (packed encoder + consensus, pod scale)."""
        _check_k_args(training_iterations, k_active)
        K = self.K if training_iterations is None else int(training_iterations)
        B = b.shape[0]
        Atb = sensing.At_apply(self.A, b)
        deg, norm_adj, consensus_fn, adj = _topology_ops(adj, topo, self.cfg.encoder_type)
        k_init, k_scan = jax.random.split(key)
        st0 = dadmm_core.init_state(k_init, B, self.P, self.n, dtype=b.dtype)
        st0, Atb = dadmm_core.cast_solver_dtype(st0, Atb, self.solver_dtype)
        nan_guard = self.cfg.nan_guard

        def body(carry, k):
            st, bn_state = carry
            kk = jax.random.fold_in(k_scan, k)
            AtAy = self.gram_fn(st.y)
            (alpha, tau, rho, eta), new_bn = self._hyper(
                params, bn_state, kk, AtAy, Atb, norm_adj, adj, training
            )
            nxt = dadmm_core.dadmm_step(
                st, AtAy, Atb, deg, alpha, tau, rho, eta,
                dadmm_core.gnn_clamps(k), adj, consensus_fn=consensus_fn,
                nan_guard=nan_guard,
            )
            if k_active is not None:
                nxt, new_bn = _freeze_inactive(k, k_active, (nxt, new_bn), (st, bn_state))
            diff = nxt.y - label[:, None, :]
            per_p = jnp.mean(diff * diff, axis=(0, 2))
            return (nxt, new_bn), (per_p, (alpha, tau, rho, eta))

        if self.cfg.remat:
            body = jax.checkpoint(body)
        (st, bn_state), (per_kp, hyps) = jax.lax.scan(
            body, (st0, state), jnp.arange(K, dtype=jnp.int32)
        )
        if k_active is not None:
            idx = jnp.maximum(jnp.asarray(k_active, jnp.int32) - 1, 0)
            hyp_last = tuple(h[idx] for h in hyps)
        else:
            hyp_last = tuple(h[-1] for h in hyps)
        return per_kp, hyp_last, bn_state
