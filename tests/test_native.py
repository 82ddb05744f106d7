"""Native C++ graph builder: correctness vs the numpy path, determinism."""

import numpy as np
import pytest

from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import graphs, native_graphs

pytestmark = pytest.mark.skipif(
    not native_graphs.available(), reason="native/libgraph_builder.so not built (make -C native)"
)


def test_native_batch_properties():
    adj = native_graphs.sample_connected_er(7, 32, 12, 0.3)
    assert adj.shape == (32, 12, 12)
    assert adj.dtype == np.float32
    for b in range(32):
        a = adj[b]
        np.testing.assert_allclose(a, a.T)
        assert np.all(np.diag(a) == 0)
        assert set(np.unique(a)).issubset({0.0, 1.0})
        assert len(graphs._connected_components(a)) == 1


def test_native_deterministic_and_seed_sensitive():
    a1 = native_graphs.sample_connected_er(1, 8, 10, 0.5)
    a2 = native_graphs.sample_connected_er(1, 8, 10, 0.5)
    a3 = native_graphs.sample_connected_er(2, 8, 10, 0.5)
    np.testing.assert_array_equal(a1, a2)
    assert not np.array_equal(a1, a3)


def test_native_edge_probability_plausible():
    # p=0.5, P=20: edge density should be near 0.5 (repair adds few edges)
    adj = native_graphs.sample_connected_er(3, 64, 20, 0.5)
    mask = ~np.eye(20, dtype=bool)
    density = adj[:, mask].mean()
    assert 0.4 < density < 0.6


def test_fast_sample_dispatches_to_native():
    out = graphs.fast_sample_connected_er(11, 4, 6, 0.5)
    want = native_graphs.sample_connected_er(11, 4, 6, 0.5)
    np.testing.assert_array_equal(out, want)
