"""Controls attributing the dlr GHyp1c sharded-training drift (VERDICT r4 #5).

`tests/test_sharded_training_e2e.py` measured a 5.5% valid-loss drift between the
GSPMD-sharded and dense GHyp1c runs by epoch 10 (bit-locked through epoch 4) and
attributed it to reduction-order chaos. These controls MEASURED that attribution
(round 5) and corrected it — the real mechanism is two-part, and each part gets a
discriminating test here:

1. The per-step computation is EQUIVALENT: at TRAINED weights (where a systematic
   sharding bug — wrong collective, wrong stat, corrector mis-scaling — would be
   largest), the GSPMD gradient matches the dense gradient to ~1e-5 rel-to-max per
   leaf with cosine 1.0. A real agent-axis bug fails this immediately; trajectory
   bands never see it. (`test_gradient_level_equivalence_at_trained_weights`)

2. The drift magnitude needs NO bug: Adam's normalizer m̂/(√v̂+ε) turns epsilon-
   scale gradient differences on near-zero-gradient coordinates into O(lr)
   parameter forks in ONE step (measured: 1e-7-relative gradient noise -> ~1e-1
   relative param delta under Adam vs ~1e-7 under SGD on the same state). Iterated
   over epochs this reproduces the observed percent-scale envelope.
   (`test_adam_amplifies_epsilon_gradient_noise`)

3. The fork is a deterministic ROUNDING-CLASS choice of the compiled program, not
   mesh-shape-dependent noise: (2,4), (8,1) and (1,8) meshes produce essentially
   identical trajectories (mutual max rel delta ~2e-5 over 10 epochs, measured
   in-session r5) — an agent-axis logic bug would make the agents-sharded meshes
   disagree with the data-only mesh at once. The early (pre-amplification) window
   is asserted here across the two extreme mesh shapes.
   (`test_mesh_shape_invariance_early_window`)

Supporting in-session measurements (10-epoch envelopes: dense-vs-(2,4) 5.5e-2,
(2,4)-vs-(4,2) 5.8e-2 — a third rounding class, same envelope; 1e-7 one-shot
param perturbation grows only to 1e-5 by epoch 10, refuting pure-chaos
amplification) are recorded in results_parity/drift_control.json.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from hyperparameter_gnn_unfolded_d_admm_main_tpu.config import Config
from hyperparameter_gnn_unfolded_d_admm_main_tpu.models.unfolded_dlr import (
    DLRGNNHypOneShotCorrected,
)
from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import data as data_ops, graphs
from hyperparameter_gnn_unfolded_d_admm_main_tpu.parallel import mesh as mesh_lib
from hyperparameter_gnn_unfolded_d_admm_main_tpu.parallel.mesh import (
    AGENT_AXIS, DATA_AXIS, sharding,
)
from hyperparameter_gnn_unfolded_d_admm_main_tpu.train import loop, losses

pytestmark = [pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
), pytest.mark.slow, pytest.mark.mesh]


def _cfg(**kw):
    # the exact config of the e2e dlr drift measurement
    base = dict(P=16, m=16, n=24, GHN_iter_num=8, batch_size=8, train_size=32,
                test_size=16, num_epochs=10, lr=1e-3, seed=5,
                native_prefetch=False, hyp_mode="GHyp1c")
    base.update(kw)
    return Config(**base)


def _loss_fn(model):
    def f(p, k, x, y, adj):
        per_kp = model.apply_losses(p, k, x, y, adj, training=True)[0]
        _, lf = losses.losses_from_per_kp(per_kp)
        return lf
    return f


def _problem(cfg):
    model = DLRGNNHypOneShotCorrected(cfg.P, cfg.n, cfg)
    x, y = data_ops.make_dlr_dataset(jax.random.key(1), cfg.P, cfg.batch_size,
                                     cfg.n, cfg.snr, noise=False)
    adj = jnp.asarray(
        graphs.fast_sample_connected_er(0, cfg.batch_size, cfg.P, 0.5),
        jnp.float32)
    return model, x, y, adj


def _trained_params(cfg, tmp_path, model):
    """Real mid-training weights (5 dense epochs — inside the bit-locked window,
    so dense/sharded choice is irrelevant): a corrector-scaling bug is invisible
    at the tiny symmetric init and large at trained weights."""
    from flax import serialization

    out = str(tmp_path / "dense5")
    loop.train_unfolded_dlr(cfg.replace(num_epochs=5), out)
    with open(os.path.join(out, "last", "state.msgpack"), "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    return serialization.from_state_dict(model.init(), raw["params"])


def test_gradient_level_equivalence_at_trained_weights(tmp_path):
    cfg = _cfg()
    model, x, y, adj = _problem(cfg)
    params = _trained_params(cfg, tmp_path, model)
    key = jax.random.key(42)
    lf = _loss_fn(model)

    g_dense = jax.jit(jax.grad(lf))(params, key, x, y, adj)
    m = mesh_lib.make_mesh(2, 4)
    repl, s_bpa = sharding(m), sharding(m, DATA_AXIS, AGENT_AXIS)
    g_sh = jax.jit(jax.grad(lf),
                   in_shardings=(repl, repl, s_bpa, s_bpa, s_bpa),
                   out_shardings=repl)(params, key, x, y, adj)

    for (path_a, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_dense),
            jax.tree_util.tree_leaves_with_path(g_sh)):
        a, b = np.asarray(a), np.asarray(b)
        name = jax.tree_util.keystr(path_a)
        # rel-to-leaf-max: reduction-order noise sits at ~1e-5 here (measured
        # ≤7e-5); a systematic computational difference is orders larger
        reld = np.abs(a - b).max() / (np.abs(a).max() + 1e-30)
        assert reld < 5e-4, f"{name}: sharded grad deviates rel-to-max {reld:.2e}"
        cos = float(np.sum(a * b)
                    / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
        assert cos > 0.9999, f"{name}: grad direction diverged, cos {cos:.6f}"


def test_adam_amplifies_epsilon_gradient_noise(tmp_path):
    cfg = _cfg()
    model, x, y, adj = _problem(cfg)
    params = _trained_params(cfg, tmp_path, model)
    g = jax.jit(jax.grad(_loss_fn(model)))(params, jax.random.key(42), x, y, adj)

    # ADDITIVE epsilon noise at 1e-7 of each leaf's max gradient — the shape of
    # reduction-order noise (absolute, set by the largest terms in the sum), so
    # it flips the SIGN of near-zero-gradient coordinates exactly as a different
    # summation order does. (Multiplicative noise preserves signs and barely
    # moves Adam — measured 1e-3 vs the 1e-1 sign-flip fork.)
    rng = np.random.default_rng(7)
    g_noise = jax.tree.map(
        lambda a: a + jnp.asarray(
            1e-7 * np.abs(np.asarray(a)).max() * rng.standard_normal(a.shape),
            a.dtype), g)

    def one_step_delta(tx):
        # per-leaf fork size, rel-to-leaf-max (same normalization as the
        # gradient check — rel-to-self explodes on zero-init coordinates)
        st = tx.init(params)
        up_a, _ = tx.update(g, st, params)
        up_b, _ = tx.update(g_noise, st, params)
        p_a = optax.apply_updates(params, up_a)
        p_b = optax.apply_updates(params, up_b)
        rels = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))
                               / (jnp.max(jnp.abs(b)) + 1e-30)),
            p_a, p_b)
        return max(jax.tree.leaves(rels))

    d_adam = one_step_delta(optax.adam(cfg.lr, b1=0.9, b2=0.999))
    d_sgd = one_step_delta(optax.sgd(cfg.lr))
    # SGD passes epsilon noise through linearly (lr * 1e-7 * max|g| absolute);
    # Adam's m̂/(√v̂+ε) sign-flips near-zero-gradient coordinates, forking
    # params by ~2*lr in one step — orders of magnitude apart.
    assert d_sgd < 1e-7, f"SGD one-step delta unexpectedly large: {d_sgd:.2e}"
    assert d_adam > 1e-4, f"Adam amplification absent: {d_adam:.2e}"
    assert d_adam / max(d_sgd, 1e-30) > 1e3


def test_mesh_shape_invariance_early_window(tmp_path):
    """Agents-only (1,8) and data-only (8,1) meshes must produce the same
    trajectory inside the pre-amplification window (measured: mutual agreement
    ~2e-5 over all 10 epochs; asserted over 5 to stay clear of the Adam
    amplification onset on other BLAS builds). A real agent-axis sharding bug
    (wrong neighbor sum, wrong psum axis) breaks this immediately — the
    data-only mesh computes the dense agent math."""
    import csv as _csv

    def valid_losses(out):
        with open(os.path.join(out, "losses.csv")) as f:
            return np.asarray([float(r["valid_loss"])
                               for r in _csv.DictReader(f)])

    cfg5 = _cfg(num_epochs=5)
    loop.train_unfolded_dlr(cfg5.replace(mesh_data=8, mesh_agents=1),
                            str(tmp_path / "m81"))
    loop.train_unfolded_dlr(cfg5.replace(mesh_data=1, mesh_agents=8),
                            str(tmp_path / "m18"))
    t81 = valid_losses(str(tmp_path / "m81"))
    t18 = valid_losses(str(tmp_path / "m18"))
    assert len(t81) == 5 and len(t18) == 5
    d = np.max(np.abs(t81 - t18) / np.abs(t81))
    assert d < 1e-3, (
        f"agents-sharded vs data-sharded trajectories disagree (max rel {d:.2e}) "
        "inside the locked window — agent-axis sharding bug")
