"""Mesh-flag wiring: the flagship trainer on a (data=2, agents=4) mesh; geometric
graph type dispatch."""

import numpy as np
import jax
import pytest

from hyperparameter_gnn_unfolded_d_admm_main_tpu.config import Config
from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import graphs
from hyperparameter_gnn_unfolded_d_admm_main_tpu.train import loop

pytestmark = [pytest.mark.slow, pytest.mark.mesh]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh")
def test_gnn_trainer_on_mesh(tmp_path):
    cfg = Config(P=8, m=6, n=12, GHyp_hidden=4, GHN_iter_num=2, batch_size=4,
                 train_size=8, test_size=4, num_epochs=2, lr=1e-3, seed=0,
                 mesh_data=2, mesh_agents=4)
    res = loop.train_gnn_progressive(cfg, str(tmp_path / "run"))
    assert np.isfinite(res["best_valid_loss"])


def test_gnn_trainer_mesh_divisibility_error(tmp_path):
    cfg = Config(P=5, mesh_data=1, mesh_agents=2, GHyp_hidden=4, GHN_iter_num=2,
                 batch_size=4, train_size=8, test_size=4, num_epochs=1, m=6, n=12)
    with pytest.raises(ValueError, match="mesh_agents"):
        loop.train_gnn_progressive(cfg, str(tmp_path / "run"))


def test_geometric_graph_type(rng):
    adj = graphs.sample_graph_batch(3, 8, 10, "geometric", 0.4)
    assert adj.shape == (8, 10, 10)
    for b in range(8):
        np.testing.assert_allclose(adj[b], adj[b].T)
        assert len(graphs._connected_components(adj[b])) == 1


def test_unknown_graph_type_raises():
    with pytest.raises(ValueError, match="graph_type"):
        graphs.sample_graph_batch(0, 1, 5, "smallworld", 0.5)
