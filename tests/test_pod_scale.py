"""Pod-scale configuration smoke: P=1024 agents sharded over the 8-device mesh
(BASELINE.md north-star shape, shrunk in n for CI speed) — table tier AND the
agent-sharded state-conditioned GNN flagship (forward + train step)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyperparameter_gnn_unfolded_d_admm_main_tpu.config import Config
from hyperparameter_gnn_unfolded_d_admm_main_tpu.models import dadmm_core, seq_hyperparam
from hyperparameter_gnn_unfolded_d_admm_main_tpu.models.gnn_hypernet import DLASSOGNNHyp
from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import data as data_ops, graphs, sensing
from hyperparameter_gnn_unfolded_d_admm_main_tpu.parallel import (
    gnn_sharded, mesh as mesh_lib, unfolded_sharded)

pytestmark = [pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
), pytest.mark.slow, pytest.mark.mesh]


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


def _flagship_setup(P, B, m, n, K, num_shards, graph_prob):
    cfg = Config(P=P, m=m, n=n, GHyp_hidden=4, GHN_iter_num=K,
                 decoder_type="nodewise", gram_mode="factored")
    A = sensing.set_A(jax.random.key(0), P, m, n)
    model = DLASSOGNNHyp(A, cfg)
    params, norm_state = model.init(jax.random.key(1))
    b, y = data_ops.make_dataset(jax.random.key(2), A, B)
    adj_np = graphs.fast_sample_connected_er(3, B, P, graph_prob)
    topo = gnn_sharded.ShardedGNNTopology(adj_np, num_shards=num_shards)
    return cfg, model, params, norm_state, b, y, adj_np, topo


def test_p1024_sharded_flagship_forward_and_train_step():
    """The flagship (state-conditioned GNN hypernetwork) at the pod-scale agent
    count: P=1024 agents sharded 8 ways with packed topology — forward + one
    training step. Also records the per-shard topology-memory win the packed form
    exists for: O(Pl*D) packed bytes vs the dense path's O(Pl*P) adjacency rows."""
    import optax

    P, B, m, n, K = 1024, 2, 4, 8, 2
    mesh = mesh_lib.make_mesh(data=1, agents=8)
    cfg, model, params, norm_state, b, y, adj_np, topo = _flagship_setup(
        P, B, m, n, K, num_shards=8, graph_prob=0.01)

    fwd = gnn_sharded.make_sharded_gnn_forward(mesh, model)
    key = jax.random.key(5)
    k_init, _ = jax.random.split(key)
    st0 = dadmm_core.init_state(k_init, B, P, n, dtype=b.dtype)
    Y, _ = fwd(params, norm_state, st0, key, b, topo.tree())
    assert Y.shape == (K, B, P, n)
    assert np.isfinite(np.asarray(Y)).all()

    tx = optax.adamw(1e-3)
    step = gnn_sharded.make_sharded_gnn_train_step(mesh, model, tx)
    params2, _, _, lm, lf = step(params, norm_state, tx.init(params), st0, key,
                                 b, y, topo.tree())
    assert np.isfinite(float(lf)) and np.isfinite(float(lm))
    # parameters actually moved
    moved = any(
        float(jnp.max(jnp.abs(a - c))) > 0
        for a, c in zip(jax.tree_util.tree_leaves(params2),
                        jax.tree_util.tree_leaves(params))
    )
    assert moved

    # Per-shard topology memory: packed rows are O(Pl*D); the dense sharded path
    # replicates full adjacency rows O(Pl*P) per shard. At P=1024 / ER(p=0.01)
    # D ~ 20-30, so packed must be well under half the dense footprint per shard.
    packed_bytes = sum(np.asarray(x).nbytes for x in topo.packed) // 8
    dense_bytes = (B * P * P * 4) // 8        # adj rows, f32, per shard
    assert packed_bytes * 2 < dense_bytes, (packed_bytes, dense_bytes)


def test_p64_sharded_flagship_matches_dense():
    """Dense equivalence of the packed agent-sharded flagship at P=64 (the
    headline agent count) — forward trajectories match the single-device
    `DLASSOGNNHyp.apply` bitwise up to reduction order."""
    P, B, m, n, K = 64, 2, 4, 8, 2
    mesh = mesh_lib.make_mesh(data=2, agents=4)
    cfg, model, params, norm_state, b, y, adj_np, topo = _flagship_setup(
        P, B, m, n, K, num_shards=4, graph_prob=0.1)
    key = jax.random.key(7)
    dense = model.apply(params, norm_state, key, b, jnp.asarray(adj_np),
                        training=False)
    k_init, _ = jax.random.split(key)
    st0 = dadmm_core.init_state(k_init, B, P, n, dtype=b.dtype)
    fwd = gnn_sharded.make_sharded_gnn_forward(mesh, model)
    Y, _ = fwd(params, norm_state, st0, key, b, topo.tree())
    np.testing.assert_allclose(np.asarray(Y), np.asarray(dense.Y),
                               rtol=2e-4, atol=2e-5)
