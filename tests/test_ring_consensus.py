"""RDMA ring all-gather consensus kernel: parity vs dense on the 8-device CPU mesh
(interpreter mode — real RDMA needs multiple physical chips)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyperparameter_gnn_unfolded_d_admm_main_tpu.kernels import ring_consensus
from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import graphs
from hyperparameter_gnn_unfolded_d_admm_main_tpu.parallel import mesh as mesh_lib

pytestmark = [pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
), pytest.mark.mesh]


def test_ring_all_gather_matches_identity(rng):
    mesh = mesh_lib.agent_ring_mesh(8)
    B, Pn, n = 4, 8, 16
    Pl = Pn // 8
    y = jnp.asarray(rng.standard_normal((B, Pn, n)).astype(np.float32))
    gather = ring_consensus.ring_all_gather(mesh, B, Pl, n)
    out = gather(y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(y), rtol=1e-6)


def test_ring_rejects_2d_mesh():
    mesh = mesh_lib.make_mesh(data=2, agents=4)
    with pytest.raises(ValueError, match="1-D"):
        ring_consensus.ring_all_gather(mesh, 2, 2, 16)


def test_rdma_consensus_matches_dense(rng):
    mesh = mesh_lib.agent_ring_mesh(8)
    B, Pn, n = 4, 8, 16
    Pl = Pn // 8
    adj = jnp.asarray(graphs.sample_connected_er(rng, B, Pn, 0.5))
    y = jnp.asarray(rng.standard_normal((B, Pn, n)).astype(np.float32))
    want = np.asarray(graphs.consensus_delta(adj, y))
    consensus = ring_consensus.make_rdma_consensus(mesh, B, Pl, n)
    got = np.asarray(consensus(adj, y))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
