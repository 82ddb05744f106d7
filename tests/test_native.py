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


# --------------------------------------------------------- async prefetch pipeline


def _pipeline_mod():
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import native_pipeline
    if not native_pipeline.available():
        pytest.skip("native pipeline not built (make -C native)")
    return native_pipeline


def test_pipeline_bitwise_matches_sync_path():
    """Prefetched batches must be bitwise-identical to the synchronous builder for
    the same seeds, regardless of worker-thread interleaving."""
    np_mod = _pipeline_mod()
    seeds = list(range(100, 120))
    with np_mod.GraphPipeline(batch=8, P=10, prob=0.5, n_threads=4) as pipe:
        for s in seeds:
            pipe.submit(s)
        got = [pipe.next() for _ in seeds]
    for s, g in zip(seeds, got):
        np.testing.assert_array_equal(g, native_graphs.sample_connected_er(s, 8, 10, 0.5))


def test_pipeline_delivery_is_in_submission_order():
    np_mod = _pipeline_mod()
    with np_mod.GraphPipeline(batch=2, P=6, prob=0.5, n_threads=3) as pipe:
        pipe.submit(7)
        pipe.submit(5)          # different seed AFTER seed 7
        first = pipe.next()
        second = pipe.next()
    np.testing.assert_array_equal(first, native_graphs.sample_connected_er(7, 2, 6, 0.5))
    np.testing.assert_array_equal(second, native_graphs.sample_connected_er(5, 2, 6, 0.5))


def test_pipeline_next_without_submit_raises():
    np_mod = _pipeline_mod()
    with np_mod.GraphPipeline(batch=2, P=4, prob=0.5) as pipe:
        with pytest.raises(RuntimeError):
            pipe.next()


def test_sequential_prefetcher_matches_and_enforces_contract():
    np_mod = _pipeline_mod()
    with np_mod.SequentialGraphPrefetcher(batch=4, P=8, prob=0.5, depth=3) as pf:
        for seed in range(50, 60):
            got = pf.get(seed)
            np.testing.assert_array_equal(
                got, native_graphs.sample_connected_er(seed, 4, 8, 0.5)
            )
        with pytest.raises(ValueError):
            pf.get(42)  # non-consecutive


def test_trainer_graph_source_prefetch_equals_sync():
    """train/loop._make_graph_source: the prefetching source and the sync source must
    produce identical topology streams for the same seed sequence."""
    _pipeline_mod()
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.config import Config
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.train.loop import _make_graph_source

    cfg = Config(P=6, batch_size=4, graph_prob=0.5)
    get_pf, close_pf = _make_graph_source(cfg, cfg.batch_size)
    get_sync, close_sync = _make_graph_source(cfg.replace(native_prefetch=False),
                                              cfg.batch_size)
    for seed in range(200, 208):
        np.testing.assert_array_equal(np.asarray(get_pf(seed)), np.asarray(get_sync(seed)))
    close_pf()
    close_sync()
