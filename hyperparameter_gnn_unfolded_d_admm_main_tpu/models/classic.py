"""Classic D-ADMM solvers: Gauss-Seidel color-sweep LASSO and linear regression.

TPU-native re-design of reference `models.py`:

- `DADMMLASSOClassic` (~ `DADMMLASSO`, `models.py:332-440`): row-partitioned global
  sensing matrix (agent p owns rows [p*m_p, (p+1)*m_p) of A, `models.py:425-430`),
  learnable |hyp| table [K, P, 4] = (rho, alpha, tau, eta) (`dlasso.py:38`), K
  iterations of: per-color Gauss-Seidel primal sweep then per-agent dual ascent.
- `DADMMLRClassic` (~ `DADMMLRDiff`/`DADMMLRSame`, `models.py:5-330`): distributed
  linear regression with weights a [P,B,d] + bias omega [P,B,1], duals (mu, lamda),
  |hyp| table [K, P, 6] = (rho, alpha, delta, eta, gamma, beta) (`dlr.py:38-41`);
  'same' mode shares one row ([K, 1, 6]).

The interpreted triple loop (color -> agent -> neighbor, `models.py:379-414`) becomes a
static loop over color masks with fully vectorized agent updates: each color's
candidate update is computed for ALL agents in one einsum and blended with the mask, so
colors stay sequential (Gauss-Seidel fidelity) while everything inside a color is one
MXU batch. Sequential-segment training keeps its semantics by concatenating
`stop_gradient(frozen_prefix)` with the learnable segment — equivalent to the
reference's `no_hyp` frozen-prefix machinery (`models.py:397-401,431-440`).

Gradient-flow parity (deliberate, matches the reference):
- LASSO primal: leading X and the neighbor sum are detached (`models.py:387-388,432`);
- LASSO/LR dual: leading dual is detached (`models.py:399,94-98`);
- LR primal: nothing is detached (`models.py:125-147`).

Dtype: float32 (the reference uses float64 on CPU; f64 is not TPU-native — flagged
deviation, the algorithm is clamp-free here and stable in f32).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import graphs as graph_ops

stop = jax.lax.stop_gradient


class ColorSchedule(NamedTuple):
    masks: jax.Array   # [C, P] in {0,1}
    adj: jax.Array     # [P, P]
    deg: jax.Array     # [P]


def make_color_schedule(adj: np.ndarray, rng: Optional[np.random.Generator] = None) -> ColorSchedule:
    partition = graph_ops.greedy_coloring(adj, rng)
    masks = graph_ops.color_masks(partition, adj.shape[0])
    return ColorSchedule(
        masks=jnp.asarray(masks),
        adj=jnp.asarray(adj),
        deg=jnp.asarray(adj.sum(-1).astype(np.float32)),
    )


def partition_A(A_global: jax.Array, P: int) -> jax.Array:
    """Split the global sensing matrix by rows: [m, n] -> [P, m/P, n]
    (`models.py:425-430`)."""
    m, n = A_global.shape
    m_p = m // P
    return A_global[: m_p * P].reshape(P, m_p, n)


class DADMMLASSOClassic:
    """Color-sweep D-ADMM for the global LASSO (classic path)."""

    def __init__(self, A_global: jax.Array, P: int):
        self.P = P
        self.A_p = partition_A(A_global, P)            # [P, m_p, n]
        self.AtA = jnp.einsum("pmi,pmj->pij", self.A_p, self.A_p)
        self.n = self.A_p.shape[-1]
        self.m_p = self.A_p.shape[1]

    def At_b(self, b: jax.Array) -> jax.Array:
        """b [B, m] -> per-agent A_p^T b_p [P, B, n]."""
        B = b.shape[0]
        b_parts = b[:, : self.m_p * self.P].reshape(B, self.P, self.m_p)
        return jnp.einsum("pmn,bpm->pbn", self.A_p, b_parts)

    def run(
        self,
        hyp_table: jax.Array,            # [K, P, 4] (rho, alpha, tau, eta); |.| applied
        b: jax.Array,                    # [B, m]
        sched: ColorSchedule,
        labels: Optional[jax.Array] = None,   # [B, n] for per-iteration losses
    ) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
        """Returns (X [P,B,n], U [P,B,n], per-iteration loss [K] or None)."""
        B = b.shape[0]
        Atb = self.At_b(b)
        X = jnp.zeros((self.P, B, self.n), dtype=b.dtype)
        U = jnp.zeros_like(X)
        hyp = jnp.abs(hyp_table)
        masks = sched.masks
        deg = sched.deg[:, None, None]                  # [P,1,1]
        adj = sched.adj
        C = masks.shape[0]

        def body(carry, hyp_k):
            X, U = carry
            rho = hyp_k[:, 0][:, None, None]
            alpha = hyp_k[:, 1][:, None, None]
            tau = hyp_k[:, 2][:, None, None]
            eta = hyp_k[:, 3][:, None, None]
            for c in range(C):                           # static color loop
                mask = masks[c][:, None, None]
                neigh = jnp.einsum("pq,qbn->pbn", adj, stop(X))  # detached (`:387`)
                AtAX = jnp.einsum("pij,pbj->pbi", self.AtA, X)
                cand = stop(X) - alpha * (
                    AtAX - Atb + deg * rho * X + tau * jnp.sign(X) + deg * U - rho * neigh
                )
                X = mask * cand + (1.0 - mask) * X
            neigh = jnp.einsum("pq,qbn->pbn", adj, X)    # dual: not detached (`:394-397`)
            U = stop(U) + eta * (deg * X - neigh)
            if labels is not None:
                loss_k = jnp.mean((X - labels[None, :, :]) ** 2)
            else:
                loss_k = jnp.zeros((), dtype=X.dtype)
            return (X, U), loss_k

        (X, U), losses_k = jax.lax.scan(body, (X, U), hyp)
        return X, U, (losses_k if labels is not None else None)


class DADMMLRClassic:
    """Color-sweep D-ADMM for distributed linear regression (dlr case).

    Per-agent data x [P, B, d] (e.g. flattened MNIST / synthetic), targets
    labels [P, B, 1]. 'same' mode passes a [K, 1, 6] table (broadcasts over agents).
    """

    def __init__(self, P: int, d: int):
        self.P = P
        self.d = d

    def init_state(self, B: int, seed: int = 0, dtype=jnp.float32):
        """a ~ N(0,1), omega ~ U(0,1), duals zero (`models.py:38-44`; the reference
        seeds torch with the flattened size — here an explicit seed)."""
        key = jax.random.key(seed)
        ka, kw = jax.random.split(key)
        a = jax.random.normal(ka, (self.P, B, self.d), dtype)
        omega = jax.random.uniform(kw, (self.P, B, 1), dtype)
        mu = jnp.zeros((self.P, B, self.d), dtype)
        lamda = jnp.zeros((self.P, B, 1), dtype)
        return a, omega, mu, lamda

    def run(
        self,
        hyp_table: jax.Array,            # [K, Pp, 6] (rho, alpha, delta, eta, gamma, beta)
        x: jax.Array,                    # [P, B, d]
        labels: jax.Array,               # [P, B, 1]
        sched: ColorSchedule,
        state=None,
        collect_metrics: bool = False,
    ):
        B = x.shape[1]
        a, omega, mu, lamda = state if state is not None else self.init_state(B)
        hyp = jnp.abs(hyp_table)
        if hyp.shape[1] == 1:
            hyp = jnp.broadcast_to(hyp, (hyp.shape[0], self.P, 6))
        masks = sched.masks
        deg = sched.deg[:, None, None]
        adj = sched.adj
        C = masks.shape[0]

        def predict(a, omega):
            return jnp.sum(a * x, axis=-1, keepdims=True) + omega  # a^T x + w

        def body(carry, hyp_k):
            a, omega, mu, lamda = carry
            rho = hyp_k[:, 0][:, None, None]
            alpha = hyp_k[:, 1][:, None, None]
            delt = hyp_k[:, 2][:, None, None]
            eta = hyp_k[:, 3][:, None, None]
            gamma = hyp_k[:, 4][:, None, None]
            beta = hyp_k[:, 5][:, None, None]
            for c in range(C):
                mask = masks[c][:, None, None]
                sum_a = jnp.einsum("pq,qbd->pbd", adj, a)       # not detached (`:71`)
                sum_w = jnp.einsum("pq,qbd->pbd", adj, omega)
                xta = jnp.sum(x * a, axis=-1, keepdims=True)     # x^T a per sample
                a_cand = a - alpha * (
                    x * xta + x * omega - x * labels + rho * a * deg + deg * mu - rho * sum_a
                )
                w_cand = omega - beta * (
                    xta + omega - labels + delt * omega * deg + lamda * deg - delt * sum_w
                )
                a = mask * a_cand + (1.0 - mask) * a
                omega = mask * w_cand + (1.0 - mask) * omega
            sum_a = jnp.einsum("pq,qbd->pbd", adj, a)
            sum_w = jnp.einsum("pq,qbd->pbd", adj, omega)
            mu = stop(mu) + eta * (deg * a - sum_a)              # duals detached (`:94-98`)
            lamda = stop(lamda) + gamma * (deg * omega - sum_w)
            if collect_metrics:
                y_hat = predict(a, omega)
                loss_k = jnp.mean((jnp.abs(y_hat) - labels) ** 2)
                frac = jnp.mod(jnp.abs(y_hat), 1.0)
                gate = (frac > 0.8) | (frac < 0.2)
                acc_k = 100.0 * jnp.mean(
                    ((jnp.round(jnp.abs(y_hat)) == labels) & gate).astype(x.dtype)
                )
            else:
                loss_k = acc_k = jnp.zeros((), dtype=x.dtype)
            return (a, omega, mu, lamda), (loss_k, acc_k)

        (a, omega, mu, lamda), (losses_k, accs_k) = jax.lax.scan(body, (a, omega, mu, lamda), hyp)
        out = {"a": a, "omega": omega, "mu": mu, "lamda": lamda,
               "y_hat": predict(a, omega)}
        if collect_metrics:
            out["loss_per_iter"] = losses_k
            out["acc_per_iter"] = accs_k
        return out


def frozen_prefix_table(frozen: Optional[jax.Array], segment: jax.Array) -> jax.Array:
    """Concat stop_gradient(frozen prefix) with the learnable segment — the sequential
    -training contract of the reference (`dlasso.py:59-101`, `models.py:397-401`)."""
    if frozen is None:
        return segment
    return jnp.concatenate([stop(frozen), segment], axis=0)
