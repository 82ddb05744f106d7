"""Full-unroll fused kernel: parity vs the scan solver (interpret mode) + gradients."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from hyperparameter_gnn_unfolded_d_admm_main_tpu.kernels import full_unroll
from hyperparameter_gnn_unfolded_d_admm_main_tpu.models import dadmm_core, seq_hyperparam
from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import graphs, sensing


def _problem(rng, B=8, P=8, m=6, n=128, K=4):
    A = jax.random.normal(jax.random.key(0), (P, m, n), jnp.float32) / np.sqrt(m)
    AtA = sensing.gram(A)
    adj = jnp.asarray(graphs.sample_connected_er(rng, B, P, 0.5))
    b = jnp.asarray(rng.standard_normal((B, P, m)).astype(np.float32))
    Atb = sensing.At_apply(A, b)
    deg = graphs.degrees(adj)
    st = dadmm_core.init_state(jax.random.key(1), B, P, n)
    table = seq_hyperparam.hyp_table(
        jnp.asarray(rng.standard_normal((K, P, 4)).astype(np.float32)),
        jnp.asarray([0.1, 0.99, 0.99, 0.99]),
    )
    clips = full_unroll.unfolded_clip_table(K)
    return AtA, st, Atb, deg, adj, table, clips


def test_fused_unroll_matches_scan(rng):
    AtA, st, Atb, deg, adj, table, clips = _problem(rng)
    want = dadmm_core.unroll_table(st, table, AtA, Atb, adj, nan_guard=False)
    with pltpu.force_tpu_interpret_mode():
        got = full_unroll.fused_unroll(AtA, st.y, st.U, st.delta, Atb, deg, adj, table, clips)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_unroll_fallback_unaligned(rng):
    # n=60 not 128-aligned -> jnp fallback
    AtA, st, Atb, deg, adj, table, clips = _problem(rng, n=60)
    want = dadmm_core.unroll_table(st, table, AtA, Atb, adj, nan_guard=False)
    got = full_unroll.fused_unroll(AtA, st.y, st.U, st.delta, Atb, deg, adj, table, clips)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_fused_unroll_gradients(rng):
    AtA, st, Atb, deg, adj, table, clips = _problem(rng, B=4, P=8, n=128, K=3)

    def f_fused(tb):
        with pltpu.force_tpu_interpret_mode():
            Y = full_unroll.fused_unroll(AtA, st.y, st.U, st.delta, Atb, deg, adj, tb, clips)
        return jnp.mean(Y[-1] ** 2)

    def f_scan(tb):
        Y = dadmm_core.unroll_table(st, tb, AtA, Atb, adj, nan_guard=False)
        return jnp.mean(Y[-1] ** 2)

    g1 = jax.grad(f_fused)(table)
    g2 = jax.grad(f_scan)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def _problem_A(rng, B=8, P=8, m=6, n=128, K=4):
    A = jax.random.normal(jax.random.key(0), (P, m, n), jnp.float32) / np.sqrt(m)
    adj = jnp.asarray(graphs.sample_connected_er(rng, B, P, 0.5))
    b = jnp.asarray(rng.standard_normal((B, P, m)).astype(np.float32))
    Atb = sensing.At_apply(A, b)
    deg = graphs.degrees(adj)
    st = dadmm_core.init_state(jax.random.key(1), B, P, n)
    table = seq_hyperparam.hyp_table(
        jnp.asarray(rng.standard_normal((K, P, 4)).astype(np.float32)),
        jnp.asarray([0.1, 0.99, 0.99, 0.99]),
    )
    clips = full_unroll.unfolded_clip_table(K)
    return A, st, Atb, deg, adj, table, clips


def test_fused_unroll_factored_matches_scan(rng):
    A, st, Atb, deg, adj, table, clips = _problem_A(rng)
    want = dadmm_core.unroll_table(
        st, table, None, Atb, adj, nan_guard=False, A=A, gram_mode="factored"
    )
    with pltpu.force_tpu_interpret_mode():
        got = full_unroll.fused_unroll_factored(
            A, st.y, st.U, st.delta, Atb, deg, adj, table, clips
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_unroll_factored_fallback_unaligned(rng):
    A, st, Atb, deg, adj, table, clips = _problem_A(rng, n=60)
    want = dadmm_core.unroll_table(
        st, table, None, Atb, adj, nan_guard=False, A=A, gram_mode="factored"
    )
    got = full_unroll.fused_unroll_factored(
        A, st.y, st.U, st.delta, Atb, deg, adj, table, clips
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_unroll_factored_gradients(rng):
    A, st, Atb, deg, adj, table, clips = _problem_A(rng, B=4, P=8, K=3)

    def f_pallas(table):
        with pltpu.force_tpu_interpret_mode():
            Y = full_unroll.fused_unroll_factored(
                A, st.y, st.U, st.delta, Atb, deg, adj, table, clips
            )
        return jnp.sum(Y**2)

    def f_ref(table):
        Y = full_unroll._jnp_unroll_factored(
            A, st.y, st.U, st.delta, Atb, deg, adj, table, clips
        )
        return jnp.sum(Y**2)

    g1 = jax.grad(f_pallas)(table)
    g2 = jax.grad(f_ref)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)
