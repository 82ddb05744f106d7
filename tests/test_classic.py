"""Classic color-sweep solvers: parity against a literal numpy restatement of the
reference Gauss-Seidel iteration (`models.py:376-440` semantics, small shapes)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from hyperparameter_gnn_unfolded_d_admm_main_tpu.models import classic
from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import graphs


def numpy_classic_lasso(A_p, Atb, adj, masks, hyp, K, B, n):
    """Literal per-agent restatement: color sweep, detached neighbor sums in the primal
    (gradient semantics don't matter in pure numpy — values match)."""
    P = A_p.shape[0]
    AtA = np.einsum("pmi,pmj->pij", A_p, A_p)
    deg = adj.sum(-1)
    X = np.zeros((P, B, n), np.float32)
    U = np.zeros_like(X)
    hyp = np.abs(hyp)
    for k in range(K):
        rho, alpha, tau, eta = (hyp[k, :, i] for i in range(4))
        for c in range(masks.shape[0]):
            X_committed = X.copy()
            X_aux = X.copy()
            for p in np.nonzero(masks[c])[0]:
                neigh = sum(X_committed[j] for j in np.nonzero(adj[p])[0])
                X_aux[p] = X_committed[p] - alpha[p] * (
                    AtA[p] @ X_committed[p][..., None]
                ).squeeze(-1) - alpha[p] * (
                    -Atb[p]
                    + deg[p] * rho[p] * X_committed[p]
                    + tau[p] * np.sign(X_committed[p])
                    + deg[p] * U[p]
                    - rho[p] * neigh
                )
            X = X_aux
        for p in range(P):
            neigh = sum(X[j] for j in np.nonzero(adj[p])[0])
            U[p] = U[p] + eta[p] * (deg[p] * X[p] - neigh)
    return X, U


def test_classic_lasso_matches_numpy(rng):
    P, B, m_glob, n, K = 4, 2, 16, 12, 3
    A_global = rng.standard_normal((m_glob, n)).astype(np.float32)
    adj = graphs.sample_connected_er(rng, 1, P, 0.6)[0]
    sched = classic.make_color_schedule(adj, rng)
    hyp = rng.uniform(-0.3, 0.3, size=(K, P, 4)).astype(np.float32)
    b = rng.standard_normal((B, m_glob)).astype(np.float32)

    solver = classic.DADMMLASSOClassic(jnp.asarray(A_global), P)
    X, U, _ = solver.run(jnp.asarray(hyp), jnp.asarray(b), sched)

    Atb = np.asarray(solver.At_b(jnp.asarray(b)))
    want_X, want_U = numpy_classic_lasso(
        np.asarray(solver.A_p), Atb, adj, np.asarray(sched.masks), hyp, K, B, n
    )
    np.testing.assert_allclose(np.asarray(X), want_X, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(U), want_U, rtol=1e-4, atol=1e-4)


def test_classic_lasso_losses_and_grad(rng):
    P, B, m_glob, n, K = 4, 2, 16, 12, 3
    A_global = rng.standard_normal((m_glob, n)).astype(np.float32)
    adj = graphs.sample_connected_er(rng, 1, P, 0.6)[0]
    sched = classic.make_color_schedule(adj, rng)
    hyp = jnp.asarray(rng.uniform(0.05, 0.2, size=(K, P, 4)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((B, m_glob)).astype(np.float32))
    labels = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
    solver = classic.DADMMLASSOClassic(jnp.asarray(A_global), P)

    X, U, losses = solver.run(hyp, b, sched, labels=labels)
    assert losses.shape == (K,)
    assert np.isfinite(np.asarray(losses)).all()

    def loss_fn(h):
        X, _, _ = solver.run(h, b, sched)
        return jnp.mean((jnp.abs(X) - labels[None]) ** 2)

    g = jax.grad(loss_fn)(hyp)
    assert float(jnp.abs(g).sum()) > 0


def test_frozen_prefix_blocks_gradient(rng):
    P, K1, K2 = 3, 2, 2
    frozen = jnp.asarray(rng.uniform(0.1, 0.2, (K1, P, 4)).astype(np.float32))
    seg = jnp.asarray(rng.uniform(0.1, 0.2, (K2, P, 4)).astype(np.float32))

    def f(fr, sg):
        return jnp.sum(classic.frozen_prefix_table(fr, sg) ** 2)

    gf, gs = jax.grad(f, argnums=(0, 1))(frozen, seg)
    assert float(jnp.abs(gf).sum()) == 0.0
    assert float(jnp.abs(gs).sum()) > 0.0


@pytest.mark.slow
def test_classic_lr_runs_and_learns(rng):
    P, B, d, K = 4, 3, 8, 3
    adj = graphs.sample_connected_er(rng, 1, P, 0.6)[0]
    sched = classic.make_color_schedule(adj, rng)
    x = jnp.asarray(rng.standard_normal((P, B, d)).astype(np.float32) * 0.1)
    labels = jnp.asarray(rng.integers(0, 9, (P, B, 1)).astype(np.float32))
    solver = classic.DADMMLRClassic(P, d)
    hyp = jnp.asarray(
        np.tile(np.asarray([2.4e-5, 4.4e-4, 1.3e-4, 1.1e-7, 1.2e-7, 1.2e-3], np.float32), (K, P, 1))
    )
    out = solver.run(hyp, x, labels, sched, collect_metrics=True)
    assert out["a"].shape == (P, B, d)
    assert out["omega"].shape == (P, B, 1)
    assert out["loss_per_iter"].shape == (K,)
    assert np.isfinite(np.asarray(out["loss_per_iter"])).all()

    def loss_fn(h):
        o = solver.run(h, x, labels, sched)
        return jnp.mean((jnp.abs(o["y_hat"]) - labels) ** 2)

    g = jax.grad(loss_fn)(hyp)
    assert float(jnp.abs(g).sum()) > 0

    # 'same' mode table broadcasts
    hyp_same = hyp[:, :1]
    out2 = solver.run(hyp_same, x, labels, sched)
    assert out2["a"].shape == (P, B, d)
