"""Packed neighbor-list topology: dense equivalence at small and pod scale, GCN
aggregation parity, and the sharded ring schedule on the virtual mesh."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import graphs, topology
from hyperparameter_gnn_unfolded_d_admm_main_tpu.parallel import mesh as mesh_lib
from hyperparameter_gnn_unfolded_d_admm_main_tpu.parallel.mesh import AGENT_AXIS, DATA_AXIS


def _batch(rng, B, Pn, prob=0.5):
    adj = graphs.sample_connected_er(rng, B, Pn, prob)
    y = rng.standard_normal((B, Pn, 32)).astype(np.float32)
    return adj, jnp.asarray(y)


def test_pack_roundtrip(rng):
    adj, _ = _batch(rng, 4, 16)
    topo = topology.pack_adjacency(adj)
    dense = np.asarray(topology.to_dense(topo, 16))
    np.testing.assert_array_equal(dense, adj)


def test_pack_rejects_small_width(rng):
    adj, _ = _batch(rng, 2, 16)
    dmax = topology.max_degree(adj)
    try:
        topology.pack_adjacency(adj, D=dmax - 1)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_neighbor_sum_matches_dense(rng):
    adj, y = _batch(rng, 4, 64)
    topo = topology.pack_adjacency(adj)
    want = jnp.einsum("bpq,bqn->bpn", jnp.asarray(adj), y)
    got = topology.neighbor_sum(topo, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_consensus_matches_dense(rng):
    adj, y = _batch(rng, 4, 64)
    topo = topology.pack_adjacency(adj)
    want = graphs.consensus_delta(jnp.asarray(adj), y)
    got = topology.consensus_delta(topo, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_consensus_matches_dense_pod_scale(rng):
    # P=1024, sparse graph (prob ~ 8/P): packed D stays ~O(log P) so the packed form
    # does ~D/P of the dense work; equivalence must still be exact.
    adj, y = _batch(rng, 2, 1024, prob=8 / 1024)
    topo = topology.pack_adjacency(adj)
    assert topo.nbr.shape[-1] < 64, "packing width should be << P on sparse graphs"
    want = graphs.consensus_delta(jnp.asarray(adj), y)
    got = topology.consensus_delta(topo, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_wider_D_same_result(rng):
    adj, y = _batch(rng, 2, 32)
    t1 = topology.pack_adjacency(adj)
    t2 = topology.pack_adjacency(adj, D=t1.nbr.shape[-1] + 5)
    np.testing.assert_allclose(
        np.asarray(topology.consensus_delta(t1, y)),
        np.asarray(topology.consensus_delta(t2, y)), rtol=1e-6, atol=1e-6)


def test_gcn_aggregate_matches_dense(rng):
    adj, _ = _batch(rng, 3, 48)
    x = jnp.asarray(rng.standard_normal((3, 48, 20)).astype(np.float32))
    topo = topology.pack_adjacency(adj)
    want = jnp.einsum("bpq,bqf->bpf", graphs.gcn_norm_adj(jnp.asarray(adj)), x)
    sc, nc = topology.gcn_norm_coeffs(topo)
    got = topology.gcn_aggregate(topo, x, sc, nc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_ring_packed_matches_dense(rng):
    B, Pn, n, s = 4, 32, 16, 4
    adj = graphs.sample_connected_er(rng, B, Pn, 0.4)
    y = jnp.asarray(rng.standard_normal((B, Pn, n)).astype(np.float32))
    sp = topology.pack_adjacency_sharded(adj, num_shards=s)
    mesh = mesh_lib.make_mesh(data=2, agents=s)

    def local(nbr_s, nbr_l, mask, deg, y_local):
        return topology.consensus_ring_packed(
            nbr_s, nbr_l, mask, deg, y_local, num_shards=s, axis_name=AGENT_AXIS)

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(DATA_AXIS, AGENT_AXIS), P(DATA_AXIS, AGENT_AXIS),
                  P(DATA_AXIS, AGENT_AXIS), P(DATA_AXIS, AGENT_AXIS),
                  P(DATA_AXIS, AGENT_AXIS)),
        out_specs=P(DATA_AXIS, AGENT_AXIS), check_vma=False))
    got = fn(sp.nbr_shard, sp.nbr_local, sp.mask, sp.deg, y)
    want = graphs.consensus_delta(jnp.asarray(adj), y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_unroll_table_packed_matches_dense(rng):
    """Single-device unroll with packed topology (topo=) reproduces the dense
    trajectory — the pod-scale consensus drop-in for the solver core."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.models import dadmm_core, seq_hyperparam
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import sensing

    B, Pn, m, n, K = 4, 16, 6, 32, 4
    A = sensing.set_A(jax.random.key(0), Pn, m, n)
    AtA = sensing.gram(A)
    adj_np = graphs.sample_connected_er(rng, B, Pn, 0.4)
    adj = jnp.asarray(adj_np)
    b = jnp.asarray(rng.standard_normal((B, Pn, m)).astype(np.float32))
    Atb = sensing.At_apply(A, b)
    st = dadmm_core.init_state(jax.random.key(1), B, Pn, n)
    table = seq_hyperparam.hyp_table(
        jnp.asarray(rng.standard_normal((K, Pn, 4)).astype(np.float32)),
        jnp.asarray([0.1, 0.99, 0.99, 0.99]))
    topo = topology.pack_adjacency(adj_np)

    dense = dadmm_core.unroll_table(st, table, AtA, Atb, adj)
    packed = dadmm_core.unroll_table(st, table, AtA, Atb, None, topo=topo)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)

    # losses flavor too (the training path)
    label = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
    ld = dadmm_core.unroll_table_losses(st, table, AtA, Atb, adj, label)
    lp = dadmm_core.unroll_table_losses(st, table, AtA, Atb, None, label, topo=topo)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ld), rtol=2e-5, atol=2e-5)

    # packed + use_pallas is rejected loudly
    import pytest
    with pytest.raises(ValueError):
        dadmm_core.unroll_table(st, table, AtA, Atb, None, topo=topo, use_pallas=True)
