"""Pallas fused-iteration kernel: parity vs jnp math (interpreter mode on CPU),
custom-VJP gradients, unroll integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from hyperparameter_gnn_unfolded_d_admm_main_tpu.kernels import fused_iteration as fi
from hyperparameter_gnn_unfolded_d_admm_main_tpu.models import dadmm_core, seq_hyperparam
from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import graphs, sensing


def _inputs(rng, B=8, P=4, n=128):
    AtA = rng.standard_normal((P, n, n)).astype(np.float32)
    AtA = (AtA + AtA.transpose(0, 2, 1)) / 2  # symmetric like a Gram matrix
    y = rng.standard_normal((B, P, n)).astype(np.float32)
    U = rng.standard_normal((B, P, n)).astype(np.float32)
    delta = rng.standard_normal((B, P, n)).astype(np.float32)
    Atb = rng.standard_normal((B, P, n)).astype(np.float32)
    deg = rng.integers(1, P, size=(B, P)).astype(np.float32)
    hyp = rng.uniform(0.01, 0.3, size=(P, 4)).astype(np.float32)
    clips = np.asarray([10.0, 100.0], np.float32)
    return tuple(jnp.asarray(x) for x in (AtA, y, U, delta, Atb, deg, hyp, clips))


def test_fused_primal_matches_jnp(rng):
    args = _inputs(rng)
    want = fi._jnp_reference(*args)
    with pltpu.force_tpu_interpret_mode():
        got = fi.fused_primal_update(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_fused_primal_fallback_on_unaligned_shapes(rng):
    # n=60 not a multiple of 128 -> jnp fallback path, still correct
    args = _inputs(rng, B=3, P=2, n=60)
    want = fi._jnp_reference(*args)
    got = fi.fused_primal_update(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_fused_primal_gradients(rng):
    args = _inputs(rng, B=8, P=2, n=128)

    def f_pallas(y, U, delta, hyp):
        with pltpu.force_tpu_interpret_mode():
            out = fi.fused_primal_update(args[0], y, U, delta, args[4], args[5], hyp, args[7])
        return jnp.sum(out**2)

    def f_ref(y, U, delta, hyp):
        out = fi._jnp_reference(args[0], y, U, delta, args[4], args[5], hyp, args[7])
        return jnp.sum(out**2)

    g1 = jax.grad(f_pallas, argnums=(0, 1, 2, 3))(args[1], args[2], args[3], args[6])
    g2 = jax.grad(f_ref, argnums=(0, 1, 2, 3))(args[1], args[2], args[3], args[6])
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_unroll_with_pallas_matches_plain(rng):
    B, P, m, n, K = 8, 4, 16, 128, 3
    A = sensing.set_A(jax.random.key(0), P, m, n)
    AtA = sensing.gram(A)
    adj = jnp.asarray(graphs.sample_connected_er(rng, B, P, 0.6))
    b = jnp.asarray(rng.standard_normal((B, P, m)).astype(np.float32))
    Atb = sensing.At_apply(A, b)
    state = dadmm_core.init_state(jax.random.key(1), B, P, n)
    table = seq_hyperparam.hyp_table(
        jnp.asarray(rng.standard_normal((K, P, 4)).astype(np.float32)),
        jnp.asarray([0.1, 0.99, 0.99, 0.99]),
    )
    plain = dadmm_core.unroll_table(state, table, AtA, Atb, adj)
    with pltpu.force_tpu_interpret_mode():
        fused = dadmm_core.unroll_table(state, table, AtA, Atb, adj, use_pallas=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain), rtol=2e-5, atol=2e-5)
