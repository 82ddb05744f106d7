"""Unfolded D-ADMM for distributed linear regression (dlr) — learned scalar table.

BEYOND-REFERENCE extension: the reference unfolds only the LASSO case
(`unfolded_DLASSO.py`); its dlr support is the classic Gauss-Seidel family
(`models.py:5-330`, here `models/classic.py:DADMMLRClassic`). This module applies the
same unfolding recipe to the dlr system — Jacobi all-agents-at-once updates, a
`lax.scan` over K, and the cumsum-sigmoid learned table (`models/seq_hyperparam.py`)
widened to the dlr's six hyperparameters (rho, alpha, delta, eta, gamma, beta,
column order of `dlr.py:39-41`).

Per agent p, per scenario (the dlr update equations of `models.py:125-147`, Jacobi
form with the consensus sums taken from the previous iterate):

    g_a = x(x^T a) + x*w - x*y + rho*deg*a + deg*mu - rho*sum_N(a)
    g_w = (x^T a) + w - y + delta*deg*w + deg*lamda - delta*sum_N(w)
    a <- clamp(a - alpha * clamp(g_a));  w <- clamp(w - beta * clamp(g_w))
    mu <- mu + eta * (deg*a - sum_N(a));  lamda <- lamda + gamma * (deg*w - sum_N(w))

The adaptive clamp ladder of the unfolded LASSO (`dadmm_core.unfolded_clamps`) is
reused for robustness during early training — a design choice of this extension, not
a reference behavior (the classic dlr path is clamp-free).

State: a [B,P,d] weights, w [B,P,1] bias, duals (mu, lamda); each scenario is an
independent problem instance and each agent holds one observation (x [B,P,d],
y [B,P,1]) — the same batch semantics as the classic dlr path.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from . import dadmm_core, seq_hyperparam


class DLRState(NamedTuple):
    a: jax.Array       # [B, P, d]
    w: jax.Array       # [B, P, 1]
    mu: jax.Array      # [B, P, d]
    lamda: jax.Array   # [B, P, 1]


def init_state(key: jax.Array, batch: int, P: int, d: int, dtype=jnp.float32) -> DLRState:
    """a ~ N(0,1), w ~ U(0,1), duals zero (classic init, `models.py:38-44`)."""
    ka, kw = jax.random.split(key)
    return DLRState(
        a=jax.random.normal(ka, (batch, P, d), dtype),
        w=jax.random.uniform(kw, (batch, P, 1), dtype),
        mu=jnp.zeros((batch, P, d), dtype),
        lamda=jnp.zeros((batch, P, 1), dtype),
    )


def _neighbor_sum(adj: jax.Array, v: jax.Array) -> jax.Array:
    """sum over graph neighbors: adj [B,P,P], v [B,P,d] -> [B,P,d]."""
    return jnp.einsum("bpq,bqd->bpd", adj, v)


def unroll_table(
    state: DLRState,
    hyp_table: jax.Array,     # [K, Pp, 6] or per-sample [B, K, Pp, 6]
    x: jax.Array,             # [B, P, d]
    y: jax.Array,             # [B, P, 1]
    adj: jax.Array,           # [B, P, P]
    remat: bool = True,
    neighbor_fn=None,
    step_hyp_fn=None,
) -> Tuple[DLRState, jax.Array]:
    """Scan K dlr iterations; returns (final state, per-iteration per-agent MSE [K,P])
    where the MSE is of the prediction a.x + w against y.

    hyp_table columns are (rho, alpha, delta, eta, gamma, beta); a 4-D table carries
    per-sample hyperparameters (the one-shot hypernetwork tier, DLRGNNHypOneShot).

    neighbor_fn(v) -> sum over graph neighbors; defaults to the dense local einsum.
    Sharded callers (parallel/unfolded_sharded.make_sharded_dlr_unroll) substitute a
    collective schedule — `adj` then holds only the local agent ROWS [B, Pl, P].

    step_hyp_fn(state, fit_residual [B,P,1], consensus_residual [B,P,d], hyp_k)
    -> hyp_k: optional per-iteration hyperparameter hook (the GHyp1c corrected
    one-shot tier, DLRGNNHypOneShotCorrected)."""
    deg = jnp.sum(adj, axis=-1)[..., None]   # [B, P, 1]
    if neighbor_fn is None:
        neighbor_fn = lambda v: _neighbor_sum(adj, v)
    per_sample = hyp_table.ndim == 4
    xs_table = jnp.moveaxis(hyp_table, 1, 0) if per_sample else hyp_table

    def body(carry, xs):
        st, k = carry, xs[0]
        # normalize to [B|1, Pp, 6] so hyperparameter factors broadcast over [B,P,d]
        hyp_k = xs[1] if per_sample else xs[1][None]
        c = dadmm_core.unfolded_clamps(k)
        a, w, mu, lamda = st
        sum_a = neighbor_fn(a)
        sum_w = neighbor_fn(w)
        xta = jnp.sum(x * a, axis=-1, keepdims=True)   # [B,P,1]
        if step_hyp_fn is not None:
            hyp_k = step_hyp_fn(st, xta + w - y, deg * a - sum_a, hyp_k)
        rho = hyp_k[..., 0:1]
        alpha = hyp_k[..., 1:2]
        delt = hyp_k[..., 2:3]
        eta = hyp_k[..., 3:4]
        gamma = hyp_k[..., 4:5]
        beta = hyp_k[..., 5:6]
        g_a = x * xta + x * w - x * y + rho * deg * a + deg * mu - rho * sum_a
        g_w = xta + w - y + delt * deg * w + deg * lamda - delt * sum_w
        g_a = jnp.clip(g_a, -c.grad, c.grad)
        g_w = jnp.clip(g_w, -c.grad, c.grad)
        a = jnp.clip(a - alpha * g_a, -c.value, c.value)
        w = jnp.clip(w - beta * g_w, -c.value, c.value)
        sum_a = neighbor_fn(a)
        sum_w = neighbor_fn(w)
        mu = jnp.clip(mu + eta * (deg * a - sum_a), -c.dual, c.dual)
        lamda = jnp.clip(lamda + gamma * (deg * w - sum_w), -c.dual, c.dual)
        nxt = DLRState(a=a, w=w, mu=mu, lamda=lamda)
        pred = jnp.sum(x * a, axis=-1, keepdims=True) + w
        per_p = jnp.mean((pred - y) ** 2, axis=(0, 2))  # [P]
        return nxt, per_p

    if remat:
        body = jax.checkpoint(body)
    K = xs_table.shape[0]
    ks = jnp.arange(K, dtype=jnp.float32)
    st, per_kp = jax.lax.scan(body, state, (ks, xs_table))
    return st, per_kp


class UnfoldedDLR:
    """Learned-table unfolded dlr model (pytree params, pure apply)."""

    # (rho, alpha, delta, eta, gamma, beta) caps: rho/delta get rho_max, the step
    # sizes alpha/beta get alpha_max, the dual steps eta/gamma get eta_max.
    def __init__(self, P: int, d: int, cfg: Config):
        self.P, self.d = P, d
        self.K = cfg.GHN_iter_num
        self.cfg = cfg
        self.max_param = jnp.asarray(
            [cfg.rho_max, cfg.alpha_max, cfg.rho_max, cfg.eta_max, cfg.eta_max,
             cfg.alpha_max], dtype=jnp.float32,
        )

    def init(self) -> dict:
        return {
            "seq_hyp": seq_hyperparam.init_table(
                self.K, self.P, self.cfg.DADMM_mode, width=6
            )
        }

    def apply_losses(
        self,
        params: dict,
        key: jax.Array,
        x: jax.Array,
        y: jax.Array,
        adj: jax.Array,
        K: Optional[int] = None,
        training: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (per-iteration per-agent MSE [K, P], final-iteration hyp [Pp, 6])."""
        K = self.K if K is None else min(K, self.K)
        table = seq_hyperparam.hyp_table(
            params["seq_hyp"], self.max_param, training=training,
            max_penalty_threshold=self.cfg.max_penalty_threshold,
            penalty_reduction_factor=self.cfg.penalty_reduction_factor,
        )[:K]
        state = init_state(key, x.shape[0], self.P, self.d, dtype=x.dtype)
        _, per_kp = unroll_table(state, table, x, y, adj, remat=self.cfg.remat)
        return per_kp, table[K - 1]


class DLRGNNHyp:
    """GNN-hypernetwork dlr model (beyond-reference: the reference's hypernetwork
    family is LASSO-only). Reuses the flagship's encoder/decoder stacks
    (`models/gnn_hypernet.py`) with dlr-specific conditioning: per-agent features
    `[a_k || x || w_k || r_k]` (current weights, local observation, bias, residual),
    in_dim = 2d+2, decoding to the dlr's six hyperparameters per agent per iteration.
    """

    def __init__(self, P: int, d: int, cfg: Config):
        from . import gnn_hypernet as gh

        self._gh = gh
        self.P, self.d = P, d
        self.K = cfg.GHN_iter_num
        self.hidden = int(cfg.GHyp_hidden)
        self.mode = cfg.DADMM_mode
        self.cfg = cfg
        self.out_dim = 6 if cfg.DADMM_mode == "same" else 6 * P
        self.maxes = jnp.asarray(
            [cfg.rho_max, cfg.alpha_max, cfg.rho_max, cfg.eta_max, cfg.eta_max,
             cfg.alpha_max], dtype=jnp.float32,
        )

    def init(self, key: jax.Array):
        k_enc, k_dec = jax.random.split(key)
        enc, enc_state = self._gh._init_encoder(
            k_enc, 2 * self.d + 2, self.hidden, jnp.float32, self.cfg.encoder_type
        )
        # Conservative fc-bias start for the 6-hyperparameter head, laid out to match
        # the (B, 6, Pp) reshape: each head's value repeats across its agent block
        # (penalty-ish rho/delta -0.8, step sizes alpha/beta -0.5, dual steps
        # eta/gamma -1.2) — the dlr analogue of the reference's LASSO-only init.
        Pp = 1 if self.mode == "same" else self.P
        head_bias = jnp.asarray([-0.8, -0.5, -0.8, -1.2, -1.2, -0.5], jnp.float32)
        bias_init = jnp.repeat(head_bias, Pp)
        dec = self._gh._init_decoder(k_dec, self.P, self.hidden, self.out_dim,
                                     jnp.float32, bias_init=bias_init)
        return {"encoder": enc, "decoder": dec}, enc_state

    def apply_losses(
        self,
        params: dict,
        state: dict,
        key: jax.Array,
        x: jax.Array,
        y: jax.Array,
        adj: jax.Array,
        K: Optional[int] = None,
        training: bool = True,
        return_state: bool = False,
    ):
        """Returns (per-iteration per-agent MSE [K, P], new norm state)
        [+ final DLRState when return_state — the serving path needs the fitted
        weights, not just the loss curve]."""
        from ..ops import graphs as graph_ops

        K = self.K if K is None else min(K, self.K)
        B = x.shape[0]
        deg = jnp.sum(adj, axis=-1)[..., None]
        norm_adj = graph_ops.gcn_norm_adj(adj)
        k_init, k_scan = jax.random.split(key)
        st0 = init_state(k_init, B, self.P, self.d, dtype=x.dtype)

        def hyper(params, bn_state, kk, st):
            pred = jnp.sum(x * st.a, axis=-1, keepdims=True) + st.w
            feats = jnp.concatenate([st.a, x, st.w, pred - y], axis=-1)  # [B,P,2d+2]
            k_enc, k_dec = jax.random.split(kk)
            h, new_state = self._gh._apply_encoder(
                params["encoder"], bn_state, k_enc, feats, norm_adj, adj, training
            )
            out = self._gh._apply_decoder(params["decoder"], k_dec, h, training)
            hyp = jnp.clip(jax.nn.sigmoid(out), 1e-4, 0.9999)
            Pp = 1 if self.mode == "same" else self.P
            hyp = hyp.reshape(B, 6, Pp) * self.maxes[None, :, None]
            return hyp[..., None], new_state        # [B, 6, Pp, 1]

        def body(carry, k):
            st, bn_state = carry
            kk = jax.random.fold_in(k_scan, k)
            hyp, bn_state = hyper(params, bn_state, kk, st)
            rho, alpha, delt, eta, gamma, beta = (hyp[:, i] for i in range(6))
            c = dadmm_core.gnn_clamps(k)
            a, w, mu, lamda = st
            sum_a = _neighbor_sum(adj, a)
            sum_w = _neighbor_sum(adj, w)
            xta = jnp.sum(x * a, axis=-1, keepdims=True)
            g_a = x * xta + x * w - x * y + rho * deg * a + deg * mu - rho * sum_a
            g_w = xta + w - y + delt * deg * w + deg * lamda - delt * sum_w
            g_a = jnp.clip(g_a, -c.grad, c.grad)
            g_w = jnp.clip(g_w, -c.grad, c.grad)
            a = jnp.clip(a - alpha * g_a, -c.value, c.value)
            w = jnp.clip(w - beta * g_w, -c.value, c.value)
            sum_a = _neighbor_sum(adj, a)
            sum_w = _neighbor_sum(adj, w)
            mu = jnp.clip(mu + eta * (deg * a - sum_a), -c.dual, c.dual)
            lamda = jnp.clip(lamda + gamma * (deg * w - sum_w), -c.dual, c.dual)
            nxt = DLRState(a=a, w=w, mu=mu, lamda=lamda)
            pred = jnp.sum(x * a, axis=-1, keepdims=True) + w
            per_p = jnp.mean((pred - y) ** 2, axis=(0, 2))
            return (nxt, bn_state), per_p

        if self.cfg.remat:
            body = jax.checkpoint(body)
        (st, bn_state), per_kp = jax.lax.scan(
            body, (st0, state), jnp.arange(K, dtype=jnp.int32)
        )
        if return_state:
            return per_kp, bn_state, st
        return per_kp, bn_state


class DLRGNNHypOneShot:
    """One-shot GNN hypernetwork for dlr: the whole per-sample `[K, Pp, 6]` table from
    a SINGLE graph-conditioned GNN evaluation, then the plain table-driven unroll.

    Completes the capability matrix (both problem families x all three learned tiers):
    the dlr analogue of `models/gnn_hypernet.py:DLASSOGNNHypOneShot`, which itself
    re-designs the reference's first hypernetwork generation
    (`old code/gnn_dlasso_models.py:9-160` — MLP encoder -> 2 GCN layers -> global
    mean pool -> head emitting the full table, cumsum over K). Per-agent node features
    are the local observation `[x_p || y_p]` (the dlr problem data; no solver state —
    that is what makes it one-shot). Same stabilizations as the dlasso one-shot tier:
    zero-init final head layer, damped raw output, training-time anti-saturation
    penalty (see DLASSOGNNHypOneShot for the K=25 divergence history motivating them).
    """

    RAW_SCALE = 0.1

    def __init__(self, P: int, d: int, cfg: Config):
        self.P, self.d = P, d
        self.K = cfg.GHN_iter_num
        self.hidden = int(cfg.GHyp_hidden)
        self.mode = cfg.DADMM_mode
        self.cfg = cfg
        self.Pp = 1 if cfg.DADMM_mode == "same" else P
        # (rho, alpha, delta, eta, gamma, beta) caps, column order of UnfoldedDLR
        self.maxes = jnp.asarray(
            [cfg.rho_max, cfg.alpha_max, cfg.rho_max, cfg.eta_max, cfg.eta_max,
             cfg.alpha_max], dtype=jnp.float32,
        )

    def init(self) -> dict:
        from ..ops import gcn

        h = self.hidden
        ks = jax.random.split(jax.random.key(int(self.cfg.seed)), 5)
        dense = lambda k, i, o: {
            "w": gcn.xavier_uniform(k, i, o), "b": jnp.zeros((o,), jnp.float32)
        }
        return {
            "enc": [dense(ks[0], self.d + 1, h), dense(ks[1], h, h)],
            "convs": [dense(ks[2], h, 2 * h), dense(ks[3], 2 * h, 2 * h)],
            "head": [
                dense(ks[4], 2 * h, 4 * h),
                {"w": jnp.zeros((4 * h, self.K * self.Pp * 6), jnp.float32),
                 "b": jnp.zeros((self.K * self.Pp * 6,), jnp.float32)},
            ],
        }

    def table(self, params: dict, x: jax.Array, y: jax.Array, adj: jax.Array,
              K: Optional[int] = None, training: bool = True) -> jax.Array:
        """Per-sample hyperparameter table `[B, K, Pp, 6]` from one GNN evaluation."""
        from ..ops import gcn
        from ..ops import graphs as graph_ops

        K = self.K if K is None else int(K)
        B = x.shape[0]
        feats = jnp.concatenate([x, y], axis=-1)                  # [B,P,d+1]
        for lyr in params["enc"]:
            feats = gcn.leaky_relu(feats @ lyr["w"] + lyr["b"])
        norm_adj = graph_ops.gcn_norm_adj(adj)
        for lyr in params["convs"]:
            feats = gcn.leaky_relu(gcn.gcn_layer(norm_adj, feats, lyr["w"], lyr["b"]))
        pooled = jnp.mean(feats, axis=1)
        h = gcn.leaky_relu(pooled @ params["head"][0]["w"] + params["head"][0]["b"])
        raw = h @ params["head"][1]["w"] + params["head"][1]["b"]
        raw = self.RAW_SCALE * raw.reshape(B, self.K, self.Pp, 6)[:, :K]
        table = jax.nn.sigmoid(jnp.cumsum(raw, axis=1)) * self.maxes
        if training:
            means = jnp.mean(table, axis=(2, 3))                  # [B,K]
            scale = jnp.where(means > 0.8, 0.95, 1.0)
            table = table * scale[..., None, None]
        return jnp.clip(table, 1e-4, 0.99)

    def make_step_fn(self, params: dict, agent_axis: Optional[str] = None):
        """Per-iteration hyperparameter hook for unroll_table; the plain one-shot
        tier has none (the corrected tier overrides this). Public so the serving
        path drives the exact same unroll as training/evaluate. `agent_axis` names
        the mesh axis the P agents shard over when the hook runs inside shard_map
        (the corrected tier's 'same'-mode pooling must then be a collective)."""
        return None

    def apply_losses(
        self,
        params: dict,
        key: jax.Array,
        x: jax.Array,
        y: jax.Array,
        adj: jax.Array,
        K: Optional[int] = None,
        training: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (per-iteration per-agent MSE [K, P], final-iteration mean hyp
        [Pp, 6]) — the UnfoldedDLR signature, so the table-tier harness drives it."""
        K = self.K if K is None else min(K, self.K)
        table = self.table(params, x, y, adj, K, training=training)  # [B,K,Pp,6]
        state = init_state(key, x.shape[0], self.P, self.d, dtype=x.dtype)
        _, per_kp = unroll_table(state, table, x, y, adj, remat=self.cfg.remat,
                                 step_hyp_fn=self.make_step_fn(params))
        return per_kp, jnp.mean(table[:, K - 1], axis=0)


class DLRGNNHypOneShotCorrected(DLRGNNHypOneShot):
    """One-shot table + cheap state-conditioned correction (`--hyp_mode GHyp1c`).

    The dlr analogue of `models/gnn_hypernet.py:DLASSOGNNHypOneShotCorrected`: the
    GHyp1 table is bent per iteration by `1 + 0.5*tanh(mlp(state features))`, where
    the features are three per-agent magnitude summaries — mean |x.a + w - y| (fit
    residual), mean |deg*a - sum_N(a)| (consensus residual on the weights), mean |a|
    (iterate magnitude) — log1p-compressed. The corrector is a 3 -> 32 -> 6 MLP whose
    OUTPUT layer is zero-initialized, so at init this tier is exactly GHyp1
    (tanh(0)=0). Serving stays table-tier: one GNN evaluation per solve plus K tiny
    MLPs, no per-iteration graph convolutions.
    """

    CORR_HIDDEN = 32
    CORR_SCALE = 0.5

    def init(self) -> dict:
        from ..ops import gcn

        params = super().init()
        h = self.CORR_HIDDEN
        k = jax.random.key(int(self.cfg.seed) + 101)
        params["corr"] = {
            "w1": gcn.xavier_uniform(k, 3, h),
            "b1": jnp.zeros((h,), jnp.float32),
            # zero-init head => correction factor exactly 1.0 at init (= GHyp1)
            "w2": jnp.zeros((h, 6), jnp.float32),
            "b2": jnp.zeros((6,), jnp.float32),
        }
        return params

    def make_step_fn(self, params: dict, agent_axis: Optional[str] = None):
        from ..ops import gcn

        c = params["corr"]

        def step_fn(st, fit_res, cons_res, hyp_k):
            feats = jnp.stack([
                jnp.mean(jnp.abs(fit_res), axis=-1),    # [B, P] fit residual
                jnp.mean(jnp.abs(cons_res), axis=-1),   # [B, P] consensus residual
                jnp.mean(jnp.abs(st.a), axis=-1),       # [B, P] iterate magnitude
            ], axis=-1)                                  # [B, P, 3]
            feats = jnp.log1p(feats.astype(c["w1"].dtype))
            raw = gcn.leaky_relu(feats @ c["w1"] + c["b1"]) @ c["w2"] + c["b2"]
            if self.Pp == 1:
                raw = jnp.mean(raw, axis=1, keepdims=True)  # 'same': shared factor
                if agent_axis is not None:
                    # inside shard_map the local mean covers only this shard's
                    # agent rows; pmean over the axis makes it the global mean
                    raw = jax.lax.pmean(raw, agent_axis)
            factor = 1.0 + self.CORR_SCALE * jnp.tanh(raw)   # [B, P|1, 6]
            return jnp.clip(hyp_k.astype(factor.dtype) * factor, 1e-4, 0.99)

        return step_fn
