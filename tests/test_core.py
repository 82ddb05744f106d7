"""Solver core: parity of the scan unroll against an independent numpy re-statement of
the reference iteration math, seq-hyperparam table semantics, loss functions."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hyperparameter_gnn_unfolded_d_admm_main_tpu.config import Config
from hyperparameter_gnn_unfolded_d_admm_main_tpu.models import dadmm_core, seq_hyperparam, unfolded
from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import data as data_ops
from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import graphs, sensing
from hyperparameter_gnn_unfolded_d_admm_main_tpu.train import losses
from tests.test_graphs import reference_compute_delta


def numpy_reference_unroll(y0, U0, d0, hyp_table, AtA, Atb, adj, K):
    """Reference iteration (`unfolded_DLASSO.py:53-107`) restated in plain numpy:
    Jacobi sweep with the adaptive clamp ladder, noiseless NaN path."""
    y, U, delta = y0.copy(), U0.copy(), d0.copy()
    deg = adj.sum(-1)
    Ys = []
    for k in range(K):
        hyp = hyp_table[k]  # [Pp, 4]
        alpha, tau, rho, eta = (hyp[None, :, i : i + 1] for i in range(4))
        AtAy = np.einsum("pij,bpj->bpi", AtA, y)
        grad = AtAy - Atb + np.sign(y) * tau + U * deg[..., None] + delta * rho
        g = max(1.0, 30.0 - k)
        grad = np.clip(grad, -g, g)
        v = max(10.0, 200.0 - 3 * k)
        y = np.clip(y - alpha * grad, -v, v)
        delta = reference_compute_delta(adj, y)
        U = np.clip(U + eta * delta, -v, v)
        Ys.append(y.copy())
    return np.stack(Ys)


def _problem(rng, B=2, P=4, m=12, n=16, K=5):
    A = np.asarray(sensing.set_A(jax.random.key(0), P, m, n))
    AtA = np.einsum("pmi,pmj->pij", A, A)
    adj = graphs.sample_connected_er(rng, B, P, 0.6)
    b = rng.standard_normal((B, P, m)).astype(np.float32)
    Atb = np.einsum("pmn,bpm->bpn", A, b)
    return A, AtA, adj, b, Atb


def test_unroll_matches_numpy_reference(rng):
    B, P, n, K = 2, 4, 16, 5
    A, AtA, adj, b, Atb = _problem(rng, B=B, P=P, n=n, K=K)
    state = dadmm_core.init_state(jax.random.key(1), B, P, n)
    hyp_np = rng.uniform(0.01, 0.3, size=(K, P, 4)).astype(np.float32)

    Y = dadmm_core.unroll_table(
        state, jnp.asarray(hyp_np), jnp.asarray(AtA), jnp.asarray(Atb), jnp.asarray(adj)
    )
    want = numpy_reference_unroll(
        np.asarray(state.y), np.asarray(state.U), np.asarray(state.delta),
        hyp_np, AtA, Atb, adj, K,
    )
    np.testing.assert_allclose(np.asarray(Y), want, rtol=2e-4, atol=2e-4)


def test_unroll_remat_equivalence(rng):
    B, P, n, K = 2, 4, 16, 4
    A, AtA, adj, b, Atb = _problem(rng, B=B, P=P, n=n, K=K)
    state = dadmm_core.init_state(jax.random.key(2), B, P, n)
    hyp = jnp.asarray(rng.uniform(0.01, 0.3, size=(K, P, 4)).astype(np.float32))
    args = (state, hyp, jnp.asarray(AtA), jnp.asarray(Atb), jnp.asarray(adj))
    Y1 = dadmm_core.unroll_table(*args, remat=True)
    Y2 = dadmm_core.unroll_table(*args, remat=False)
    np.testing.assert_allclose(np.asarray(Y1), np.asarray(Y2), rtol=1e-6, atol=1e-6)


def test_seq_hyperparam_matches_reference_math(rng):
    """hyp(k) = clamp(sigmoid(cumsum) * max, 1e-4, 0.99) with training penalty
    (`unfolded_DLASSO.py:156-168`), restated independently in numpy."""
    K, P = 6, 3
    raw = rng.standard_normal((K, P, 4)).astype(np.float32) * 2.0
    max_param = np.asarray([0.1, 0.99, 0.99, 0.99], np.float32)
    got = np.asarray(
        seq_hyperparam.hyp_table(jnp.asarray(raw), jnp.asarray(max_param), training=True)
    )
    csum = np.cumsum(raw, axis=0)
    for k in range(K):
        hyp = 1.0 / (1.0 + np.exp(-csum[k])) * max_param[None, :]
        if hyp.mean() > 0.8:
            hyp = hyp * 0.95
        want = np.clip(hyp, 1e-4, 0.99)
        np.testing.assert_allclose(got[k], want, rtol=1e-5, atol=1e-6)


def test_nan_guard_resets_state(rng):
    B, P, n = 1, 3, 8
    A, AtA, adj, b, Atb = _problem(rng, B=B, P=P, m=6, n=n)
    bad = dadmm_core.SolverState(
        y=jnp.full((B, P, n), jnp.nan),
        U=jnp.zeros((B, P, n)),
        delta=jnp.zeros((B, P, n)),
    )
    hyp = jnp.full((1, P, 4), 0.1)
    Y = dadmm_core.unroll_table(
        bad, hyp, jnp.asarray(AtA), jnp.asarray(Atb), jnp.asarray(adj), nan_guard=True
    )
    assert bool(jnp.all(jnp.isfinite(Y)))


@pytest.mark.slow
def test_unfolded_model_end_to_end(rng):
    cfg = Config(P=4, m=12, n=16, GHN_iter_num=5, batch_size=2, DADMM_mode="diff")
    A = sensing.set_A(jax.random.key(0), cfg.P, cfg.m, cfg.n)
    model = unfolded.UnfoldedDLASSO(A, cfg)
    params = model.init()
    b, y = data_ops.make_dataset(jax.random.key(3), A, 4, snr=cfg.snr)
    adj = jnp.asarray(graphs.sample_connected_er(rng, 4, cfg.P, 0.6))
    Y, hyp = model.apply(params, jax.random.key(4), b, adj)
    assert Y.shape == (5, 4, 4, 16)
    assert hyp.shape == (cfg.P, 4)
    # K override truncates (`unfolded_DLASSO.py:40-43`)
    Y2, _ = model.apply(params, jax.random.key(4), b, adj, K=3)
    assert Y2.shape[0] == 3

    # gradients flow to the table
    def loss_fn(p):
        Yk, _ = model.apply(p, jax.random.key(4), b, adj)
        lm, lf = losses.compute_loss(Yk, y)
        return lf

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["seq_hyp"]).sum()) > 0


def test_compute_loss_matches_loop(rng):
    K, B, P, n = 3, 2, 4, 6
    Y = rng.standard_normal((K, B, P, n)).astype(np.float32)
    label = rng.standard_normal((B, n)).astype(np.float32)
    lm, lf = losses.compute_loss(jnp.asarray(Y), jnp.asarray(label))
    # loop restatement of gnn_dlasso_utils.compute_loss
    per_k = []
    for k in range(K):
        s = 0.0
        for p in range(P):
            s += np.mean((Y[k, :, p] - label) ** 2)
        per_k.append(s / P)
    np.testing.assert_allclose(float(lf), per_k[-1] + 1e-8, rtol=1e-5)
    np.testing.assert_allclose(float(lm), np.mean(per_k) + 1e-8, rtol=1e-5)


def test_compute_loss_nan_fallback():
    Y = jnp.full((2, 1, 2, 3), jnp.nan)
    label = jnp.zeros((1, 3))
    lm, lf = losses.compute_loss(Y, label)
    assert float(lm) == 1.0 and float(lf) == 1.0


def test_bf16_matmul_path_close_to_f32(rng):
    B, P, n, K = 2, 4, 16, 3
    A, AtA, adj, b, Atb = _problem(rng, B=B, P=P, n=n, K=K)
    state = dadmm_core.init_state(jax.random.key(5), B, P, n)
    hyp = jnp.asarray(rng.uniform(0.01, 0.2, size=(K, P, 4)).astype(np.float32))
    args = (state, hyp, jnp.asarray(AtA), jnp.asarray(Atb), jnp.asarray(adj))
    Y32 = dadmm_core.unroll_table(*args)
    Y16 = dadmm_core.unroll_table(*args, matmul_dtype="bfloat16")
    assert Y16.dtype == jnp.float32
    # bf16 has ~3 decimal digits; iterates should track loosely
    rel = float(jnp.abs(Y32 - Y16).max() / (jnp.abs(Y32).max() + 1e-9))
    assert rel < 0.1


def test_same_mode_table_broadcasts(rng):
    B, P, n, K = 2, 4, 16, 3
    A, AtA, adj, b, Atb = _problem(rng, B=B, P=P, n=n, K=K)
    state = dadmm_core.init_state(jax.random.key(6), B, P, n)
    hyp_same = jnp.asarray(rng.uniform(0.01, 0.2, size=(K, 1, 4)).astype(np.float32))
    hyp_diff = jnp.broadcast_to(hyp_same, (K, P, 4))
    Y1 = dadmm_core.unroll_table(state, hyp_same, jnp.asarray(AtA), jnp.asarray(Atb), jnp.asarray(adj))
    Y2 = dadmm_core.unroll_table(state, hyp_diff, jnp.asarray(AtA), jnp.asarray(Atb), jnp.asarray(adj))
    np.testing.assert_allclose(np.asarray(Y1), np.asarray(Y2), rtol=1e-6)


@pytest.mark.slow
def test_apply_losses_matches_full_Y(rng):
    """In-scan loss path == compute_loss(full Y) in value AND gradient."""
    cfg = Config(P=4, m=12, n=16, GHN_iter_num=5, batch_size=2, DADMM_mode="diff")
    A = sensing.set_A(jax.random.key(0), cfg.P, cfg.m, cfg.n)
    model = unfolded.UnfoldedDLASSO(A, cfg)
    params = {"seq_hyp": jnp.asarray(rng.standard_normal((5, 4, 4)).astype(np.float32))}
    b, y = data_ops.make_dataset(jax.random.key(3), A, 4, snr=cfg.snr)
    adj = jnp.asarray(graphs.sample_connected_er(rng, 4, cfg.P, 0.6))
    key = jax.random.key(7)

    def slow(p):
        Y, _ = model.apply(p, key, b, adj)
        return losses.compute_loss(Y, y)[1]

    def fast(p):
        per_kp, _ = model.apply_losses(p, key, b, adj, y)
        return losses.losses_from_per_kp(per_kp)[1]

    np.testing.assert_allclose(float(slow(params)), float(fast(params)), rtol=1e-6)
    g1 = jax.grad(slow)(params)["seq_hyp"]
    g2 = jax.grad(fast)(params)["seq_hyp"]
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-7)


def test_nmse_zero_for_perfect():
    label = jnp.asarray(np.random.default_rng(0).standard_normal((2, 5)), jnp.float32)
    Yf = jnp.broadcast_to(label[:, None, :], (2, 3, 5))
    assert float(losses.nmse(Yf, label)) < 1e-10


def test_factored_gram_matches_gram(rng):
    """gram_mode='factored' (A^T(A y)) equals the precomputed-Gram path up to fp
    association, including grads; 'auto' picks factored only when 2m < n."""
    B, P, n, K = 2, 4, 16, 5
    A, AtA, adj, b, Atb = _problem(rng, B=B, P=P, n=n, K=K)
    state = dadmm_core.init_state(jax.random.key(3), B, P, n)
    hyp = jnp.asarray(rng.uniform(0.01, 0.3, size=(K, P, 4)).astype(np.float32))
    args = (state, hyp, jnp.asarray(AtA), jnp.asarray(Atb), jnp.asarray(adj))
    Y_gram = dadmm_core.unroll_table(*args)
    Y_fact = dadmm_core.unroll_table(*args, A=jnp.asarray(A), gram_mode="factored")
    np.testing.assert_allclose(np.asarray(Y_fact), np.asarray(Y_gram), rtol=2e-4, atol=2e-4)

    # gradients through the factored operator agree too
    def loss(table, mode):
        Y = dadmm_core.unroll_table(
            state, table, jnp.asarray(AtA), jnp.asarray(Atb), jnp.asarray(adj),
            A=jnp.asarray(A), gram_mode=mode,
        )
        return jnp.mean(Y**2)

    g1 = jax.grad(loss)(hyp, "gram")
    g2 = jax.grad(loss)(hyp, "factored")
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-5)

    # 'auto' selection: m=12, n=16 -> 2m >= n -> gram; thin problem -> factored
    fn = dadmm_core.make_gram_fn(jnp.asarray(AtA), jnp.asarray(A), "auto")
    yv = jnp.asarray(rng.standard_normal((B, P, n)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(fn(yv)),
        np.asarray(dadmm_core.gram_matvec(jnp.asarray(AtA), yv)),
        rtol=1e-5, atol=1e-5,
    )
    A_thin = jnp.asarray(rng.standard_normal((P, 3, n)).astype(np.float32))
    fn_thin = dadmm_core.make_gram_fn(None, A_thin, "auto")  # no AtA needed when factored
    want = jnp.einsum("pij,bpj->bpi", jnp.einsum("pmi,pmj->pij", A_thin, A_thin), yv)
    np.testing.assert_allclose(np.asarray(fn_thin(yv)), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_unfolded_model_factored_config(rng):
    """UnfoldedDLASSO with cfg.gram_mode='factored' reproduces the default output."""
    cfg = Config(P=4, m=12, n=16, GHN_iter_num=4, batch_size=2)
    A = sensing.set_A(jax.random.key(0), cfg.P, cfg.m, cfg.n)
    adj = jnp.asarray(graphs.sample_connected_er(rng, 2, cfg.P, 0.6))
    b = jnp.asarray(rng.standard_normal((2, cfg.P, cfg.m)).astype(np.float32))
    key = jax.random.key(5)
    m1 = unfolded.UnfoldedDLASSO(A, cfg)
    m2 = unfolded.UnfoldedDLASSO(A, cfg.replace(gram_mode="factored"))
    params = m1.init()
    Y1, _ = m1.apply(params, key, b, adj)
    Y2, _ = m2.apply(params, key, b, adj)
    np.testing.assert_allclose(np.asarray(Y1), np.asarray(Y2), rtol=2e-4, atol=2e-4)


def test_bf16_solver_state_quality_gate():
    """The bf16 solver-state serving mode (cfg.dtype='bfloat16') must stay within 0.5%
    NMSE of the f32 solver (0.08% measured) on the committed trained flagship checkpoint. This is the
    gate behind the bench's xla_bf16_state_factored variant."""
    import os
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.utils import checkpoint as ckpt

    base = "results_parity/unfolded_extended"
    run_dir = os.path.join(base, sorted(os.listdir(base))[0])
    cfg = Config.from_json(open(os.path.join(run_dir, "args.json")).read())
    A = jnp.asarray(np.load(os.path.join(run_dir, "A.npy")))
    key = jax.random.key(int(cfg.seed) + 12345)
    k_data, k_state = jax.random.split(key)
    b, y = data_ops.make_dataset(k_data, A, 16, cfg.snr, noise=cfg.data_noise)
    rng_g = np.random.default_rng(int(cfg.seed))
    one = graphs.sample_er_adjacency(rng_g, cfg.P, cfg.graph_prob)
    adj = jnp.broadcast_to(jnp.asarray(one), (16, cfg.P, cfg.P))
    nmses = {}
    for dtype in ("float32", "bfloat16"):
        model = unfolded.UnfoldedDLASSO(A, cfg.replace(dtype=dtype))
        params = model.init()
        tree, _ = ckpt.restore_partial(os.path.join(run_dir, "best"), {"params": params})
        Y, _ = model.apply(tree["params"], k_state, b, adj, training=False)
        assert Y.dtype == jnp.dtype(dtype)
        nmses[dtype] = float(losses.nmse(Y[-1].astype(jnp.float32), y))
    assert nmses["bfloat16"] <= nmses["float32"] * 1.005, nmses


@pytest.mark.slow
def test_bf16_full_serving_quality_gate():
    """bf16 matmul operands ON TOP of the bf16 solver state (the round-3 serving
    headline combo, bench variant xla_bf16_state_factored_final_bf16mm) must stay
    within 0.5% NMSE of the f32 solver on a committed trained checkpoint
    (0.002% measured on the golden imported run)."""
    import os
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.utils import checkpoint as ckpt

    base = "results_parity/unfolded_extended"
    run_dir = os.path.join(base, sorted(os.listdir(base))[0])
    cfg = Config.from_json(open(os.path.join(run_dir, "args.json")).read())
    A = jnp.asarray(np.load(os.path.join(run_dir, "A.npy")))
    key = jax.random.key(int(cfg.seed) + 12345)
    k_data, k_state = jax.random.split(key)
    b, y = data_ops.make_dataset(k_data, A, 16, cfg.snr, noise=cfg.data_noise)
    rng_g = np.random.default_rng(int(cfg.seed))
    one = graphs.sample_er_adjacency(rng_g, cfg.P, cfg.graph_prob)
    adj = jnp.broadcast_to(jnp.asarray(one), (16, cfg.P, cfg.P))
    nmses = {}
    for tag, kw in (("f32", {}),
                    ("bf16_full", {"dtype": "bfloat16",
                                   "matmul_dtype": "bfloat16",
                                   "gram_mode": "factored"})):
        model = unfolded.UnfoldedDLASSO(A, cfg.replace(**kw))
        params = model.init()
        tree, _ = ckpt.restore_partial(os.path.join(run_dir, "best"), {"params": params})
        yf = model.apply_final(tree["params"], k_state, b, adj, training=False)
        nmses[tag] = float(losses.nmse(yf.astype(jnp.float32), y))
    assert nmses["bf16_full"] <= nmses["f32"] * 1.005, nmses


@pytest.mark.slow
def test_remat_policy_gradient_equivalence(rng):
    """remat_policy ('dots'/'dots_no_batch') changes only WHAT the backward
    recomputes, never the values: loss and gradients must match full remat
    exactly (the policies were measured slower-or-parity on TPU — DESIGN.md
    remat-policy ablation — but the knob must stay numerically transparent)."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.models import seq_hyperparam

    B, P, m, n, K = 2, 4, 6, 8, 3
    A = sensing.set_A(jax.random.key(0), P, m, n)
    b, label = data_ops.make_dataset(jax.random.key(1), A, B)
    adj = jnp.asarray(graphs.sample_connected_er(rng, B, P, 0.5))
    Atb = sensing.At_apply(A, b)
    st = dadmm_core.init_state(jax.random.key(2), B, P, n)
    table = seq_hyperparam.hyp_table(
        0.05 * jnp.ones((K, P, 4), jnp.float32), jnp.asarray([0.1, 0.99, 0.99, 0.99]))

    def loss(tb, policy):
        per_kp = dadmm_core.unroll_table_losses(
            st, tb, None, Atb, adj, label, A=A, gram_mode="factored",
            remat=True, remat_policy=policy)
        return jnp.mean(per_kp[-1])

    v0, g0 = jax.value_and_grad(loss)(table, None)
    for policy in ("dots", "dots_no_batch"):
        v, g = jax.value_and_grad(loss)(table, policy)
        np.testing.assert_allclose(float(v), float(v0), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g0),
                                   rtol=1e-5, atol=1e-7)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown remat policy"):
        loss(table, "bogus")


def test_unfolded_dlr_matches_numpy_restatement(rng):
    """The unfolded dlr scan (models/unfolded_dlr.py) matches an independent numpy
    restatement of the Jacobi dlr update equations (classic dlr math of
    reference models.py:125-147 + the adaptive clamp ladder of this extension)."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.models import unfolded_dlr

    B, P, d, K = 2, 4, 6, 4
    adj = graphs.sample_connected_er(rng, B, P, 0.6)
    x = rng.standard_normal((B, P, d)).astype(np.float32)
    y = rng.standard_normal((B, P, 1)).astype(np.float32)
    hyp = rng.uniform(0.01, 0.2, size=(K, P, 6)).astype(np.float32)
    st = unfolded_dlr.init_state(jax.random.key(0), B, P, d)

    out, per_kp = unfolded_dlr.unroll_table(
        st, jnp.asarray(hyp), jnp.asarray(x), jnp.asarray(y), jnp.asarray(adj)
    )

    a, w, mu, lam = (np.asarray(v) for v in st)
    deg = adj.sum(-1)[..., None]
    for k in range(K):
        rho, alpha, delt, eta, gamma, beta = (hyp[k][None, :, i:i+1] for i in range(6))
        g = max(1.0, 30.0 - k)
        v = max(10.0, 200.0 - 3.0 * k)
        sum_a = np.einsum("bpq,bqd->bpd", adj, a)
        sum_w = np.einsum("bpq,bqd->bpd", adj, w)
        xta = np.sum(x * a, axis=-1, keepdims=True)
        g_a = np.clip(x * xta + x * w - x * y + rho * deg * a + deg * mu - rho * sum_a, -g, g)
        g_w = np.clip(xta + w - y + delt * deg * w + deg * lam - delt * sum_w, -g, g)
        a = np.clip(a - alpha * g_a, -v, v)
        w = np.clip(w - beta * g_w, -v, v)
        sum_a = np.einsum("bpq,bqd->bpd", adj, a)
        sum_w = np.einsum("bpq,bqd->bpd", adj, w)
        mu = np.clip(mu + eta * (deg * a - sum_a), -v, v)
        lam = np.clip(lam + gamma * (deg * w - sum_w), -v, v)
    np.testing.assert_allclose(np.asarray(out.a), a, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.w), w, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.mu), mu, rtol=2e-4, atol=2e-4)
    pred = np.sum(x * a, axis=-1, keepdims=True) + w
    want_last = np.mean((pred - y) ** 2, axis=(0, 2))
    np.testing.assert_allclose(np.asarray(per_kp[-1]), want_last, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_unfolded_dlr_trains(tmp_path):
    """End-to-end: the learned 6-param table reduces validation loss on synthetic
    dlr data through the CLI driver."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.cli import unfolded_dlr as drv

    res = drv.main([
        "--P", "4", "--n", "8", "--GHN_iter_num", "4", "--batch_size", "4",
        "--train_size", "16", "--test_size", "8", "--num_epochs", "8",
        "--lr", "5e-2", "--save_dir", str(tmp_path / "dlr"),
    ])
    import os
    assert np.isfinite(res["best_valid_loss"])
    with open(os.path.join(res["out_dir"], "losses.csv")) as f:
        rows = f.read().strip().splitlines()[1:]
    first = float(rows[0].split(",")[2])
    assert res["best_valid_loss"] < first, (res["best_valid_loss"], first)


@pytest.mark.slow
def test_dlr_gnn_hypernetwork_trains(tmp_path):
    """GHyp tier on the dlr family: the state-conditioned hypernetwork reduces
    validation loss end-to-end (cli driver with --hyp_mode GHyp), and evaluate
    serves the resulting checkpoint."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.cli import evaluate, unfolded_dlr as drv

    res = drv.main([
        "--P", "4", "--n", "8", "--GHN_iter_num", "3", "--GHyp_hidden", "4",
        "--batch_size", "4", "--train_size", "16", "--test_size", "8",
        "--num_epochs", "6", "--lr", "2e-3", "--hyp_mode", "GHyp",
        "--save_dir", str(tmp_path / "dlrg"),
    ])
    import os
    assert np.isfinite(res["best_valid_loss"])
    with open(os.path.join(res["out_dir"], "losses.csv")) as f:
        rows = f.read().strip().splitlines()[1:]
    first = float(rows[0].split(",")[2])
    assert res["best_valid_loss"] < first, (res["best_valid_loss"], first)
    out = evaluate.main([res["out_dir"], "--test_size", "8"])
    assert np.isfinite(out["loss_curve"]).all()


@pytest.mark.slow
def test_dlr_oneshot_corrected_starts_at_oneshot_and_trains(tmp_path):
    """GHyp1c dlr tier: (a) with the zero-init correction head it is EXACTLY GHyp1
    at init (tanh(0)=0 => factor 1.0); (b) it trains end-to-end through the CLI and
    evaluate serves the checkpoint."""
    import jax

    from hyperparameter_gnn_unfolded_d_admm_main_tpu.cli import evaluate, unfolded_dlr as drv
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.config import Config
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.models.unfolded_dlr import (
        DLRGNNHypOneShot, DLRGNNHypOneShotCorrected)
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import data as data_ops
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import graphs

    P, d, B = 4, 8, 4
    cfg = Config(P=P, n=d, GHN_iter_num=4, GHyp_hidden=4, batch_size=B)
    x, y = data_ops.make_dlr_dataset(jax.random.key(0), P, B, d, cfg.snr)
    adj = jnp.asarray(graphs.fast_sample_connected_er(0, B, P, 0.5))
    base = DLRGNNHypOneShot(P, d, cfg)
    corr = DLRGNNHypOneShotCorrected(P, d, cfg)
    per_b, _ = base.apply_losses(base.init(), jax.random.key(1), x, y, adj)
    per_c, _ = corr.apply_losses(corr.init(), jax.random.key(1), x, y, adj)
    np.testing.assert_allclose(np.asarray(per_c), np.asarray(per_b),
                               rtol=1e-6, atol=1e-7)

    res = drv.main([
        "--P", "4", "--n", "8", "--GHN_iter_num", "3", "--GHyp_hidden", "4",
        "--batch_size", "4", "--train_size", "16", "--test_size", "8",
        "--num_epochs", "6", "--lr", "1e-2", "--hyp_mode", "GHyp1c",
        "--save_dir", str(tmp_path / "dlr1c"),
    ])
    import os
    assert np.isfinite(res["best_valid_loss"])
    with open(os.path.join(res["out_dir"], "losses.csv")) as f:
        rows = f.read().strip().splitlines()[1:]
    first = float(rows[0].split(",")[2])
    assert res["best_valid_loss"] < first, (res["best_valid_loss"], first)
    out = evaluate.main([res["out_dir"], "--test_size", "8"])
    assert np.isfinite(out["loss_curve"]).all()


@pytest.mark.slow
def test_unroll_table_final_matches_stacked(rng):
    """The serving fast path (final-iterate-only scan) is trajectory-identical to
    the stacked unroll's last row, for fp32 and the bf16+factored serving config."""
    import jax
    import jax.numpy as jnp
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import sensing

    B, Pn, m, n, K = 4, 8, 6, 16, 5
    A = sensing.set_A(jax.random.key(0), Pn, m, n)
    AtA = sensing.gram(A)
    adj = jnp.asarray(graphs.sample_connected_er(rng, B, Pn, 0.5))
    b = jnp.asarray(rng.standard_normal((B, Pn, m)).astype(np.float32))
    Atb = sensing.At_apply(A, b)
    st = dadmm_core.init_state(jax.random.key(1), B, Pn, n)
    table = seq_hyperparam.hyp_table(
        jnp.asarray(rng.standard_normal((K, Pn, 4)).astype(np.float32)),
        jnp.asarray([0.1, 0.99, 0.99, 0.99]))

    Y = dadmm_core.unroll_table(st, table, AtA, Atb, adj)
    y_fin = dadmm_core.unroll_table_final(st, table, AtA, Atb, adj)
    np.testing.assert_array_equal(np.asarray(y_fin), np.asarray(Y[-1]))

    Yb = dadmm_core.unroll_table(st, table, None, Atb, adj, nan_guard=False,
                                 A=A, gram_mode="factored", solver_dtype="bfloat16")
    yb = dadmm_core.unroll_table_final(st, table, None, Atb, adj, nan_guard=False,
                                       A=A, gram_mode="factored",
                                       solver_dtype="bfloat16")
    np.testing.assert_array_equal(np.asarray(yb, np.float32),
                                  np.asarray(Yb[-1], np.float32))


def test_apply_final_matches_apply(rng):
    """UnfoldedDLASSO.apply_final == apply()[0][-1] (the serve path contract)."""
    import jax
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.config import Config
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.models.unfolded import UnfoldedDLASSO
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import sensing

    cfg = Config(P=4, m=6, n=10, GHN_iter_num=4)
    A = sensing.set_A(jax.random.key(0), 4, 6, 10)
    model = UnfoldedDLASSO(A, cfg)
    params = model.init()
    b = np.random.default_rng(0).standard_normal((3, 4, 6)).astype(np.float32)
    adj = graphs.sample_connected_er(rng, 3, 4, 0.6)
    import jax.numpy as jnp
    key = jax.random.key(5)
    Y, _ = model.apply(params, key, jnp.asarray(b), jnp.asarray(adj), training=False)
    y_fin = model.apply_final(params, key, jnp.asarray(b), jnp.asarray(adj),
                              training=False)
    np.testing.assert_array_equal(np.asarray(y_fin), np.asarray(Y[-1]))
