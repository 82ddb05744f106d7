"""Topology ops: consensus identity, GCN normalization, coloring, connectivity."""

import numpy as np
import jax.numpy as jnp

from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import graphs


def reference_compute_delta(adj, y):
    """Straightforward per-edge triple loop matching the reference semantics
    (`unfolded_DLASSO.py:127-140`): each undirected edge visited from both endpoints."""
    B, P, n = y.shape
    delta = np.zeros_like(y)
    for b in range(B):
        for p in range(P):
            for j in range(P):
                if adj[b, p, j] > 0:
                    diff = y[b, p] - y[b, j]
                    delta[b, p] += diff
                    delta[b, j] -= diff
    return delta


def test_consensus_delta_matches_edge_loop(rng):
    B, P, n = 3, 6, 7
    adj = graphs.sample_connected_er(rng, B, P, 0.5)
    y = rng.standard_normal((B, P, n)).astype(np.float32)
    got = np.asarray(graphs.consensus_delta(jnp.asarray(adj), jnp.asarray(y)))
    want = reference_compute_delta(adj, y)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_degrees_and_laplacian(rng):
    adj = graphs.sample_connected_er(rng, 2, 5, 0.5)
    deg = np.asarray(graphs.degrees(jnp.asarray(adj)))
    np.testing.assert_allclose(deg, adj.sum(-1))
    L = np.asarray(graphs.laplacian(jnp.asarray(adj)))
    # Laplacian rows sum to zero and L @ 1 = 0
    np.testing.assert_allclose(L.sum(-1), 0.0, atol=1e-6)


def test_connectivity_repair(rng):
    # Force a disconnected graph, repair, and verify one component.
    adj = np.zeros((8, 8), dtype=np.float32)
    adj[0, 1] = adj[1, 0] = 1
    adj[2, 3] = adj[3, 2] = 1
    fixed = graphs.repair_connectivity(adj.copy())
    comps = graphs._connected_components(fixed)
    assert len(comps) == 1
    np.testing.assert_allclose(fixed, fixed.T)


def test_sample_connected_er_always_connected(rng):
    adj = graphs.sample_connected_er(rng, 16, 10, 0.15)
    for b in range(16):
        assert len(graphs._connected_components(adj[b])) == 1
        np.testing.assert_allclose(adj[b], adj[b].T)
        assert np.all(np.diag(adj[b]) == 0)


def test_gcn_norm_adj(rng):
    adj = graphs.sample_connected_er(rng, 2, 5, 0.6)
    norm = np.asarray(graphs.gcn_norm_adj(jnp.asarray(adj)))
    # Hand-build D^-1/2 (A+I) D^-1/2
    for b in range(2):
        a_hat = adj[b] + np.eye(5, dtype=np.float32)
        d = a_hat.sum(-1)
        want = a_hat / np.sqrt(np.outer(d, d))
        np.testing.assert_allclose(norm[b], want, rtol=1e-5, atol=1e-6)


def test_greedy_coloring_is_proper(rng):
    adj = graphs.sample_connected_er(rng, 1, 12, 0.4)[0]
    partition = graphs.greedy_coloring(adj, rng)
    seen = np.concatenate(partition)
    assert sorted(seen.tolist()) == list(range(12))
    for nodes in partition:
        for i in nodes:
            for j in nodes:
                if i != j:
                    assert adj[i, j] == 0, "same-color nodes must not be adjacent"
    masks = graphs.color_masks(partition, 12)
    np.testing.assert_allclose(masks.sum(0), 1.0)


def test_neighbors_lists(rng):
    adj = graphs.sample_connected_er(rng, 1, 6, 0.7)[0]
    nbs = graphs.neighbors_lists(adj)
    for p, nb in enumerate(nbs):
        np.testing.assert_array_equal(nb, np.sort(np.nonzero(adj[p])[0]))
