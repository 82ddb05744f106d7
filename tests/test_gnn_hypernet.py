"""GNN hypernetwork: shapes, GCN parity, hyperparameter bounds, gradient flow,
progressive-K behavior, batchnorm state threading."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hyperparameter_gnn_unfolded_d_admm_main_tpu.config import Config
from hyperparameter_gnn_unfolded_d_admm_main_tpu.models.gnn_hypernet import DLASSOGNNHyp
from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import data as data_ops
from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import gcn, graphs, sensing
from hyperparameter_gnn_unfolded_d_admm_main_tpu.train import losses

pytestmark = [pytest.mark.slow]


def _setup(rng, P=4, m=10, n=12, hidden=8, B=3, K=4, mode="diff"):
    cfg = Config(P=P, m=m, n=n, GHyp_hidden=hidden, GHN_iter_num=K, DADMM_mode=mode)
    A = sensing.set_A(jax.random.key(0), P, m, n)
    model = DLASSOGNNHyp(A, cfg)
    params, state = model.init(jax.random.key(1))
    b, y = data_ops.make_dataset(jax.random.key(2), A, B)
    adj = jnp.asarray(graphs.sample_connected_er(rng, B, P, 0.6))
    return cfg, model, params, state, b, y, adj


def test_gcn_layer_matches_dense_math(rng):
    B, P, fin, fout = 2, 5, 7, 3
    adj = jnp.asarray(graphs.sample_connected_er(rng, B, P, 0.6))
    norm = graphs.gcn_norm_adj(adj)
    x = jnp.asarray(rng.standard_normal((B, P, fin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((fin, fout)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(fout).astype(np.float32))
    got = np.asarray(gcn.gcn_layer(norm, x, w, bias))
    for i in range(B):
        want = np.asarray(norm[i]) @ np.asarray(x[i]) @ np.asarray(w) + np.asarray(bias)
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-5)


def test_forward_shapes_and_hyp_bounds(rng):
    cfg, model, params, state, b, y, adj = _setup(rng)
    out = model.apply(params, state, jax.random.key(3), b, adj)
    assert out.Y.shape == (4, 3, 4, 12)
    alpha, tau, rho, eta = out.hyp_last
    assert alpha.shape == (3, 4, 1)
    # bounds: sigmoid clamp [1e-4, 0.9999] scaled by maxes
    assert float(jnp.max(alpha)) <= cfg.alpha_max + 1e-6
    assert float(jnp.min(alpha)) >= 1e-4 * cfg.alpha_max - 1e-9
    for h, mx in zip((tau, rho, eta), (cfg.tau_max, cfg.rho_max, cfg.eta_max)):
        assert float(jnp.max(h)) <= mx + 1e-6


def test_same_mode_shares_hyp_across_agents(rng):
    cfg, model, params, state, b, y, adj = _setup(rng, mode="same")
    out = model.apply(params, state, jax.random.key(3), b, adj)
    alpha, *_ = out.hyp_last
    assert alpha.shape == (3, 1, 1)


def test_progressive_K_override(rng):
    cfg, model, params, state, b, y, adj = _setup(rng, K=6)
    out1 = model.apply(params, state, jax.random.key(3), b, adj, training_iterations=2)
    assert out1.Y.shape[0] == 2
    out2 = model.apply(params, state, jax.random.key(3), b, adj, training_iterations=6)
    assert out2.Y.shape[0] == 6


def test_gradients_flow_and_state_updates(rng):
    cfg, model, params, state, b, y, adj = _setup(rng)

    def loss_fn(p):
        out = model.apply(p, state, jax.random.key(3), b, adj, training=True)
        lm, lf = losses.compute_loss(out.Y, y)
        return lf, out.state

    (lf, new_state), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(lf))
    # every encoder conv weight gets gradient
    for conv in g["encoder"]["convs"]:
        assert float(jnp.abs(conv["w"]).max()) > 0
    assert float(jnp.abs(g["decoder"]["fc"]["w"]).max()) > 0
    # batch-norm running stats moved during training
    diff = jnp.abs(new_state["bn"][0]["mean"] - state["bn"][0]["mean"]).max()
    assert float(diff) > 0


def test_eval_mode_is_deterministic_and_freezes_state(rng):
    cfg, model, params, state, b, y, adj = _setup(rng)
    out1 = model.apply(params, state, jax.random.key(3), b, adj, training=False)
    out2 = model.apply(params, state, jax.random.key(3), b, adj, training=False)
    # same key twice -> bitwise identical (no hidden state)
    np.testing.assert_allclose(np.asarray(out1.Y), np.asarray(out2.Y), rtol=1e-6)
    # running stats untouched in eval
    np.testing.assert_allclose(
        np.asarray(out1.state["bn"][0]["mean"]), np.asarray(state["bn"][0]["mean"])
    )


def test_apply_losses_matches_full_Y(rng):
    cfg, model, params, state, b, y, adj = _setup(rng)
    key = jax.random.key(9)

    def slow(p):
        out = model.apply(p, state, key, b, adj, training=True)
        return losses.compute_loss(out.Y, y)[1]

    def fast(p):
        per_kp, hyp, new_state = model.apply_losses(p, state, key, b, adj, y, training=True)
        return losses.losses_from_per_kp(per_kp)[1]

    np.testing.assert_allclose(float(slow(params)), float(fast(params)), rtol=1e-6)
    g1 = jax.grad(slow)(params)["decoder"]["fc"]["w"]
    g2 = jax.grad(fast)(params)["decoder"]["fc"]["w"]
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-7)


@pytest.mark.parametrize("enc", ["mpnn", "attention"])
def test_alternative_encoders(rng, enc):
    """MPNN and attention encoders (archived design space of the reference,
    old code/gnn_dlasso_models4.py) train end-to-end."""
    cfg, model, params, state, b, y, adj = _setup(rng)
    cfg2 = cfg.replace(encoder_type=enc)
    model2 = DLASSOGNNHyp(sensing.set_A(jax.random.key(0), 4, 10, 12), cfg2)
    params2, state2 = model2.init(jax.random.key(1))
    out = model2.apply(params2, state2, jax.random.key(3), b, adj)
    assert out.Y.shape == (4, 3, 4, 12)
    assert np.isfinite(np.asarray(out.Y)).all()

    def loss_fn(p):
        o = model2.apply(p, state2, jax.random.key(3), b, adj, training=True)
        return losses.compute_loss(o.Y, y)[1]

    g = jax.grad(loss_fn)(params2)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert total > 0


def test_fc_bias_conservative_init(rng):
    """Reference `gnn_dlasso_models_progressive.py:118-123`: first 4 fc bias entries."""
    cfg, model, params, state, b, y, adj = _setup(rng)
    fcb = np.asarray(params["decoder"]["fc"]["b"])
    np.testing.assert_allclose(fcb[:4], [-0.5, -1.0, -0.8, -1.2])
    assert np.all(fcb[4:] == 0)


# ------------------------------------------------------------------ one-shot tier


def _setup_oneshot(rng, P=4, m=10, n=12, hidden=8, B=3, K=4, mode="diff"):
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.models.gnn_hypernet import (
        DLASSOGNNHypOneShot,
    )

    cfg = Config(P=P, m=m, n=n, GHyp_hidden=hidden, GHN_iter_num=K, DADMM_mode=mode,
                 hyp_mode="GHyp1")
    A = sensing.set_A(jax.random.key(0), P, m, n)
    model = DLASSOGNNHypOneShot(A, cfg)
    params, state = model.init(jax.random.key(1))
    b, y = data_ops.make_dataset(jax.random.key(2), A, B)
    adj = jnp.asarray(graphs.sample_connected_er(rng, B, P, 0.6))
    return cfg, model, params, state, b, y, adj


def test_oneshot_forward_shapes_and_table_bounds(rng):
    cfg, model, params, state, b, y, adj = _setup_oneshot(rng)
    out = model.apply(params, state, jax.random.key(3), b, adj)
    assert out.Y.shape == (4, 3, 4, 12)
    assert np.isfinite(np.asarray(out.Y)).all()
    table = np.asarray(model.table(params, b, adj))
    assert table.shape == (3, 4, 4, 4)  # [B, K, Pp, 4]
    maxes = np.asarray([cfg.alpha_max, cfg.tau_max, cfg.rho_max, cfg.eta_max])
    assert (table >= 1e-4 - 1e-9).all()
    assert (table <= np.minimum(maxes, 0.99) + 1e-6).all()


def test_oneshot_table_prefix_property(rng):
    """cumsum-over-K parameterization: the truncated-K table is exactly the prefix of
    the full-K table, so progressive training reuses learned early iterations."""
    cfg, model, params, state, b, y, adj = _setup_oneshot(rng, K=6)
    full = np.asarray(model.table(params, b, adj, K=6))
    trunc = np.asarray(model.table(params, b, adj, K=3))
    np.testing.assert_allclose(trunc, full[:, :3], rtol=1e-6)
    out = model.apply(params, state, jax.random.key(3), b, adj, training_iterations=2)
    assert out.Y.shape[0] == 2


def test_oneshot_table_is_graph_conditioned(rng):
    """Different topologies must produce different tables (the point of the tier —
    vs the graph-independent scalar table)."""
    cfg, model, params, state, b, y, adj = _setup_oneshot(rng, B=2, P=5)
    adj2 = jnp.asarray(graphs.sample_connected_er(rng, 2, 5, 0.3))
    # Train a couple of steps first so the head isn't at its symmetric init.
    import optax
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.train import losses as L

    tx = optax.adam(1e-2)
    opt = tx.init(params)
    for _ in range(3):
        def loss_fn(p):
            per_kp, _, _ = model.apply_losses(p, state, jax.random.key(4), b, adj, y)
            return L.losses_from_per_kp(per_kp)[1]
        g = jax.grad(loss_fn)(params)
        upd, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, upd)
    t1 = np.asarray(model.table(params, b, adj))
    t2 = np.asarray(model.table(params, b, adj2))
    assert np.abs(t1 - t2).max() > 1e-6


def test_oneshot_apply_losses_matches_full_Y(rng):
    cfg, model, params, state, b, y, adj = _setup_oneshot(rng)
    key = jax.random.key(9)
    out = model.apply(params, state, key, b, adj)
    lf_slow = losses.compute_loss(out.Y, y)[1]
    per_kp, hyp, _ = model.apply_losses(params, state, key, b, adj, y)
    lf_fast = losses.losses_from_per_kp(per_kp)[1]
    np.testing.assert_allclose(float(lf_slow), float(lf_fast), rtol=1e-6)


def test_oneshot_training_reduces_loss(rng):
    import optax
    cfg, model, params, state, b, y, adj = _setup_oneshot(rng, B=8, K=6)
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    def loss_fn(p):
        per_kp, _, _ = model.apply_losses(p, state, jax.random.key(4), b, adj, y)
        return losses.losses_from_per_kp(per_kp)[1]

    @jax.jit
    def step(p, o):
        g = jax.grad(loss_fn)(p)
        upd, o = tx.update(g, o, p)
        return optax.apply_updates(p, upd), o

    l0 = float(loss_fn(params))
    for _ in range(25):
        params, opt = step(params, opt)
    l1 = float(loss_fn(params))
    assert l1 < l0


def test_gnn_bf16_solver_state(rng):
    """cfg.dtype='bfloat16' is honored by the GNN model too: Y comes back bf16 and
    stays finite/close to the f32 run on a tiny problem (same params, same keys)."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.config import Config
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.models.gnn_hypernet import DLASSOGNNHyp
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import graphs, sensing

    cfg = Config(P=4, m=8, n=10, GHyp_hidden=4, GHN_iter_num=3, batch_size=2)
    A = sensing.set_A(jax.random.key(0), cfg.P, cfg.m, cfg.n)
    adj = jnp.asarray(graphs.sample_connected_er(rng, 2, cfg.P, 0.6))
    b = jnp.asarray(rng.standard_normal((2, cfg.P, cfg.m)).astype(np.float32))
    m32 = DLASSOGNNHyp(A, cfg)
    m16 = DLASSOGNNHyp(A, cfg.replace(dtype="bfloat16"))
    params, norm_state = m32.init(jax.random.key(1))
    key = jax.random.key(2)
    Y32 = m32.apply(params, norm_state, key, b, adj, training=False).Y
    Y16 = m16.apply(params, norm_state, key, b, adj, training=False).Y
    assert Y16.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(Y16, dtype=np.float32)).all()
    np.testing.assert_allclose(
        np.asarray(Y16, dtype=np.float32), np.asarray(Y32), rtol=0.15, atol=0.15
    )


def test_oneshot_corrected_tier():
    """GHyp1c (one-shot table + state-conditioned correction MLP): zero-init head
    makes it EXACTLY GHyp1 at init; the corrector receives gradients; masked-K path
    composes."""
    import jax
    import jax.numpy as jnp
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.config import Config
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.models.gnn_hypernet import (
        DLASSOGNNHypOneShot, DLASSOGNNHypOneShotCorrected)
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import data as data_ops
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import graphs, sensing
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.train import losses as loss_lib

    cfg = Config(P=4, m=8, n=10, GHyp_hidden=4, GHN_iter_num=3, batch_size=4)
    A = sensing.set_A(jax.random.key(0), cfg.P, cfg.m, cfg.n)
    b, y = data_ops.make_dataset(jax.random.key(1), A, cfg.batch_size, snr=cfg.snr)
    adj = jnp.asarray(graphs.fast_sample_connected_er(0, cfg.batch_size, cfg.P, 0.5))
    key = jax.random.key(2)

    base = DLASSOGNNHypOneShot(A, cfg)
    corr = DLASSOGNNHypOneShotCorrected(A, cfg)
    p_base, _ = base.init(jax.random.key(3))
    p_corr, _ = corr.init(jax.random.key(3))

    # identical at init (zero-init correction head)
    Yb = base.apply(p_base, {}, key, b, adj, training=False).Y
    Yc = corr.apply(p_corr, {}, key, b, adj, training=False).Y
    np.testing.assert_array_equal(np.asarray(Yc), np.asarray(Yb))

    # the corrector gets nonzero gradients (w2 via its zero weights' grad; w1 too
    # once w2 moves — check w2 at init)
    def lf(p):
        per_kp, _, _ = corr.apply_losses(p, {}, key, b, adj, y, training=True)
        return loss_lib.losses_from_per_kp(per_kp)[1]

    g = jax.grad(lf)(p_corr)
    assert float(jnp.abs(g["corr"]["w2"]).sum()) > 0.0

    # masked-K composes: masked k_active=2 == sliced K=2
    per_s, _, _ = corr.apply_losses(p_corr, {}, key, b, adj, y,
                                    training_iterations=2, training=True)
    per_m, _, _ = corr.apply_losses(p_corr, {}, key, b, adj, y,
                                    training=True, k_active=jnp.int32(2))
    np.testing.assert_allclose(np.asarray(per_m[:2]), np.asarray(per_s), rtol=1e-6)


def _setup_decoder(rng, P, decoder_type, mode="diff", B=3, K=3):
    cfg = Config(P=P, m=6, n=12, GHyp_hidden=8, GHN_iter_num=K, DADMM_mode=mode,
                 decoder_type=decoder_type)
    A = sensing.set_A(jax.random.key(0), P, 6, 12)
    model = DLASSOGNNHyp(A, cfg)
    params, state = model.init(jax.random.key(1))
    b, y = data_ops.make_dataset(jax.random.key(2), A, B)
    adj = jnp.asarray(graphs.sample_connected_er(rng, B, P, 0.6))
    return cfg, model, params, state, b, y, adj


@pytest.mark.parametrize("mode", ["diff", "same"])
def test_nodewise_decoder_forward_shapes(rng, mode):
    cfg, model, params, state, b, y, adj = _setup_decoder(rng, 4, "nodewise", mode)
    out = model.apply(params, state, jax.random.key(3), b, adj, training=True)
    assert out.Y.shape == (3, 3, 4, 12)
    Pp = 1 if mode == "same" else 4
    for h in out.hyp_last:
        assert h.shape == (3, Pp, 1)
        assert np.all(np.asarray(h) > 0)


def test_nodewise_param_count_independent_of_P(rng):
    def dec_size(P):
        _, _, params, _, _, _, _ = _setup_decoder(rng, P, "nodewise")
        return sum(x.size for x in jax.tree_util.tree_leaves(params["decoder"])
                   if hasattr(x, "size"))

    assert dec_size(4) == dec_size(8)

    def dec_size_flat(P):
        _, _, params, _, _, _, _ = _setup_decoder(rng, P, "flattened")
        return sum(x.size for x in jax.tree_util.tree_leaves(params["decoder"])
                   if hasattr(x, "size"))

    assert dec_size_flat(8) > dec_size_flat(4)  # the reference head IS O(P)


def test_nodewise_decoder_trains(rng):
    import optax

    cfg, model, params, state, b, y, adj = _setup_decoder(rng, 4, "nodewise")
    tx = optax.adam(2e-3)
    opt = tx.init(params)
    key = jax.random.key(7)

    @jax.jit
    def step(params, state, opt, key):
        def loss_fn(p):
            per_kp, _, st = model.apply_losses(p, state, key, b, adj, y, training=True)
            return jnp.mean(per_kp), st

        (lf, st), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), st, opt, lf

    first = None
    for i in range(25):
        key, k = jax.random.split(key)
        params, state, opt, lf = step(params, state, opt, k)
        if first is None:
            first = float(lf)
    assert float(lf) < first


def test_unknown_decoder_type_rejected(rng):
    cfg = Config(P=4, m=6, n=12, decoder_type="bogus")
    A = sensing.set_A(jax.random.key(0), 4, 6, 12)
    model = DLASSOGNNHyp(A, cfg)
    with pytest.raises(ValueError):
        model.init(jax.random.key(1))


def test_flagship_packed_topology_matches_dense(rng):
    """apply(topo=...) runs encoder GCN aggregation AND solver consensus on packed
    neighbor lists; must reproduce the dense forward exactly (eval mode: no dropout
    randomness differences matter — same key, same ops)."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import topology

    cfg, model, params, state, b, y, adj = _setup(rng, P=6, B=3, K=3)
    topo = topology.pack_adjacency(np.asarray(adj))
    key = jax.random.key(5)
    dense = model.apply(params, state, key, b, adj, training=False)
    packed = model.apply(params, state, key, b, None, training=False, topo=topo)
    np.testing.assert_allclose(np.asarray(packed.Y), np.asarray(dense.Y),
                               rtol=2e-5, atol=2e-5)

    # losses flavor (training path), still eval-mode math for determinism
    per_d, _, _ = model.apply_losses(params, state, key, b, adj, y, training=False)
    per_p, _, _ = model.apply_losses(params, state, key, b, None, y,
                                     training=False, topo=topo)
    np.testing.assert_allclose(np.asarray(per_p), np.asarray(per_d),
                               rtol=2e-5, atol=2e-5)


def test_flagship_packed_rejects_non_gcn_encoder(rng):
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import topology

    cfg = Config(P=4, m=6, n=12, GHyp_hidden=4, GHN_iter_num=2,
                 encoder_type="attention")
    A = sensing.set_A(jax.random.key(0), 4, 6, 12)
    model = DLASSOGNNHyp(A, cfg)
    params, state = model.init(jax.random.key(1))
    b, _ = data_ops.make_dataset(jax.random.key(2), A, 2)
    adj = graphs.sample_connected_er(rng, 2, 4, 0.6)
    topo = topology.pack_adjacency(adj)
    with pytest.raises(ValueError, match="packed"):
        model.apply(params, state, jax.random.key(3), b, None, topo=topo)


def test_oneshot_nodewise_head(rng):
    """GHyp1/GHyp1c with --decoder_type nodewise: per-node table head with
    P-independent parameters; table stays bounded, prefix property holds, and
    the model trains."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.models.gnn_hypernet import (
        DLASSOGNNHypOneShot, DLASSOGNNHypOneShotCorrected)
    import optax

    def build(P, cls=DLASSOGNNHypOneShot):
        cfg = Config(P=P, m=6, n=12, GHyp_hidden=8, GHN_iter_num=4,
                     decoder_type="nodewise")
        A = sensing.set_A(jax.random.key(0), P, 6, 12)
        model = cls(A, cfg)
        params, _ = model.init(jax.random.key(1))
        return cfg, model, params

    def head_size(P):
        _, _, params = build(P)
        return sum(x.size for x in jax.tree_util.tree_leaves(params["head"]))

    assert head_size(4) == head_size(8), "nodewise one-shot head must be P-independent"

    cfg, model, params = build(4)
    b, y = data_ops.make_dataset(jax.random.key(2), sensing.set_A(
        jax.random.key(0), 4, 6, 12), 3)
    adj = jnp.asarray(graphs.sample_connected_er(rng, 3, 4, 0.6))
    table = model.table(params, b, adj)
    assert table.shape == (3, 4, 4, 4)          # [B, K, P, 4] — per-agent rows
    assert float(table.min()) >= 1e-4 and float(table.max()) <= 0.99
    # prefix property survives the nodewise head (cumsum along K unchanged)
    t2 = model.table(params, b, adj, K=2)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(table[:, :2]),
                               rtol=1e-6, atol=1e-6)

    # trains (loss decreases) — corrected tier exercises _step_hyp on top
    cfg_c, model_c, params_c = build(4, DLASSOGNNHypOneShotCorrected)
    tx = optax.adam(2e-3)
    opt = tx.init(params_c)
    key = jax.random.key(7)

    @jax.jit
    def step(p, opt, key):
        def loss_fn(p):
            per_kp, _, _ = model_c.apply_losses(p, {}, key, b, adj, y, training=True)
            return jnp.mean(per_kp)

        lf, g = jax.value_and_grad(loss_fn)(p)
        upd, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, upd), opt, lf

    first = None
    for i in range(20):
        key, k = jax.random.split(key)
        params_c, opt, lf = step(params_c, opt, k)
        first = float(lf) if first is None else first
    assert float(lf) < first


def test_apply_final_matches_stacked_last(rng):
    """The serving fast path (scan with NO stacked-Y output) returns exactly
    apply(...).Y[-1] — for the flagship AND the one-shot tiers (GHyp1/GHyp1c,
    which inherit their own apply_final including the GHyp1c corrector hook)."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.models.gnn_hypernet import (
        DLASSOGNNHypOneShot, DLASSOGNNHypOneShotCorrected)

    cfg, model, params, state, b, y, adj = _setup(rng)
    key = jax.random.key(9)
    want = model.apply(params, state, key, b, adj, training=False).Y[-1]
    got = model.apply_final(params, state, key, b, adj, training=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # truncated-K serving too
    want3 = model.apply(params, state, key, b, adj, training_iterations=3,
                        training=False).Y[-1]
    got3 = model.apply_final(params, state, key, b, adj, training_iterations=3,
                             training=False)
    np.testing.assert_array_equal(np.asarray(got3), np.asarray(want3))

    for cls in (DLASSOGNNHypOneShot, DLASSOGNNHypOneShotCorrected):
        m2 = cls(model.A, cfg)
        p2, s2 = m2.init(jax.random.key(3))
        want = m2.apply(p2, s2, key, b, adj, training=False).Y[-1]
        got = m2.apply_final(p2, s2, key, b, adj, training=False)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_apply_final_bf16_matches_stacked_last(rng):
    """apply_final preserves the solver-dtype cast (bf16 serving mode)."""
    cfg, model, params, state, b, y, adj = _setup(rng)
    cfg16 = cfg.replace(dtype="bfloat16")
    m16 = DLASSOGNNHyp(model.A, cfg16)
    key = jax.random.key(10)
    want = m16.apply(params, state, key, b, adj, training=False).Y[-1]
    got = m16.apply_final(params, state, key, b, adj, training=False)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(got, dtype=np.float32),
                                  np.asarray(want, dtype=np.float32))
