"""Pod-scale configuration smoke: P=1024 agents sharded over the 8-device mesh
(BASELINE.md north-star shape, shrunk in n for CI speed)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyperparameter_gnn_unfolded_d_admm_main_tpu.models import dadmm_core, seq_hyperparam
from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import graphs, sensing
from hyperparameter_gnn_unfolded_d_admm_main_tpu.parallel import mesh as mesh_lib, unfolded_sharded

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


@pytest.mark.parametrize("schedule", ["allgather", "ppermute"])
def test_p1024_sharded_unroll(schedule):
    P, B, m, n, K = 1024, 8, 4, 16, 3
    mesh = mesh_lib.make_mesh(data=1, agents=8)
    A = jax.random.normal(jax.random.key(0), (P, m, n), jnp.float32) / np.sqrt(m)
    AtA = sensing.gram(A)
    adj = jnp.asarray(graphs.fast_sample_connected_er(0, B, P, 0.01))
    b = jax.random.normal(jax.random.key(1), (B, P, m), jnp.float32)
    Atb = sensing.At_apply(A, b)
    state = dadmm_core.init_state(jax.random.key(2), B, P, n)
    table = seq_hyperparam.hyp_table(
        0.05 * jnp.ones((K, P, 4), jnp.float32), jnp.asarray([0.1, 0.99, 0.99, 0.99])
    )
    unroll = unfolded_sharded.make_sharded_unroll(mesh, schedule=schedule)
    Y = unroll(state, table, AtA, Atb, adj)
    assert Y.shape == (K, B, P, n)
    assert np.isfinite(np.asarray(Y)).all()


def test_p1024_matches_dense_single_device():
    P, B, m, n, K = 1024, 2, 4, 8, 2
    mesh = mesh_lib.make_mesh(data=2, agents=4)
    A = jax.random.normal(jax.random.key(0), (P, m, n), jnp.float32) / np.sqrt(m)
    AtA = sensing.gram(A)
    adj = jnp.asarray(graphs.fast_sample_connected_er(1, B, P, 0.01))
    b = jax.random.normal(jax.random.key(1), (B, P, m), jnp.float32)
    Atb = sensing.At_apply(A, b)
    state = dadmm_core.init_state(jax.random.key(2), B, P, n)
    table = seq_hyperparam.hyp_table(
        0.05 * jnp.ones((K, P, 4), jnp.float32), jnp.asarray([0.1, 0.99, 0.99, 0.99])
    )
    dense = dadmm_core.unroll_table(state, table, AtA, Atb, adj)
    unroll = unfolded_sharded.make_sharded_unroll(mesh, schedule="ppermute")
    sharded = unroll(state, table, AtA, Atb, adj)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense), rtol=2e-5, atol=2e-5)
