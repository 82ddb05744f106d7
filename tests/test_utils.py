"""Utility surfaces: profiling timers, CSV logger, checkpoint round-trips."""

import pytest
import os

import numpy as np
import jax.numpy as jnp

from hyperparameter_gnn_unfolded_d_admm_main_tpu.utils import checkpoint as ckpt
from hyperparameter_gnn_unfolded_d_admm_main_tpu.utils.logging import CSVLogger, IOStream, StepTimer
from hyperparameter_gnn_unfolded_d_admm_main_tpu.utils.profiling import PhaseTimer


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["b"]["count"] == 1
    assert s["a"]["total_s"] >= 0


def test_step_timer_excludes_first():
    t = StepTimer()
    for _ in range(3):
        with t:
            pass
    assert t.steady_state_rate() > 0
    t2 = StepTimer()
    with t2:
        pass
    assert t2.steady_state_rate() == 0.0  # single (compile) step excluded


def test_csv_logger_roundtrip(tmp_path):
    log = CSVLogger(["epoch", "loss"])
    log.append(epoch=1, loss=0.5)
    log.append(epoch=2, loss=0.25)
    path = str(tmp_path / "x.csv")
    log.write(path)
    rows = open(path).read().strip().splitlines()
    assert rows[0] == "epoch,loss" and rows[2] == "2,0.25"
    assert log.column("loss") == [0.5, 0.25]


def test_iostream_tees(tmp_path, capsys):
    s = IOStream(str(tmp_path / "run.log"))
    s.cprint("hello")
    s.close()
    assert "hello" in open(tmp_path / "run.log").read()
    assert "hello" in capsys.readouterr().out


@pytest.mark.slow
def test_tensorboard_writer(tmp_path):
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.utils.logging import TensorBoardWriter

    w = TensorBoardWriter(str(tmp_path / "tb"), enabled=True)
    w.scalar("loss", 0.5, 1)
    w.close()
    if w.active:  # environment has a TB writer
        files = [f for _, _, fs in os.walk(tmp_path / "tb") for f in fs]
        assert any("tfevents" in f for f in files)
    # disabled writer is a clean no-op
    w2 = TensorBoardWriter(str(tmp_path / "tb2"), enabled=False)
    assert not w2.active
    w2.scalar("loss", 1.0, 1)
    w2.close()


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 3))}}
    ckpt.save(str(tmp_path / "ck"), tree, {"epoch": 3})
    target = {"a": jnp.zeros(5), "b": {"c": jnp.zeros((2, 3))}}
    got, meta = ckpt.restore(str(tmp_path / "ck"), target)
    np.testing.assert_allclose(np.asarray(got["a"]), np.arange(5.0))
    assert meta["epoch"] == 3
    # partial restore
    part, _ = ckpt.restore_partial(str(tmp_path / "ck"), {"b": {"c": jnp.zeros((2, 3))}})
    np.testing.assert_allclose(np.asarray(part["b"]["c"]), 1.0)


def test_checkpoint_save_is_atomic(tmp_path):
    """Overwriting `last/` every epoch must never leave a torn state file: saves go
    through write-to-temp + os.replace, and a stale .tmp from a crashed writer does
    not affect restore."""
    import os
    path = tmp_path / "ck"
    tree = {"a": jnp.arange(4.0)}
    ckpt.save(str(path), tree, {"epoch": 1})
    ckpt.save(str(path), {"a": 2.0 * jnp.arange(4.0)}, {"epoch": 2})
    assert not [f for f in os.listdir(path) if f.endswith(".tmp")]
    # simulate a crash that left a half-written temp file behind
    (path / "state.msgpack.tmp").write_bytes(b"garbage")
    got, meta = ckpt.restore(str(path), {"a": jnp.zeros(4)})
    np.testing.assert_allclose(np.asarray(got["a"]), 2.0 * np.arange(4.0))
    assert meta["epoch"] == 2
    assert "_state_sha256" not in meta  # internal field stripped on restore


def test_checkpoint_detects_meta_state_skew(tmp_path, capsys):
    """A crash between the state and meta replaces pairs a new state.msgpack with the
    previous meta.json; restore must surface that (stderr warning via the stored state
    hash) instead of silently returning desynced scheduler metadata."""
    path = str(tmp_path / "ck")
    ckpt.save(path, {"a": jnp.arange(4.0)}, {"epoch": 1})
    ckpt.save(path, {"a": 3.0 * jnp.arange(4.0)}, meta=None)  # state advanced, meta stale
    got, meta = ckpt.restore(path, {"a": jnp.zeros(4)})
    np.testing.assert_allclose(np.asarray(got["a"]), 3.0 * np.arange(4.0))
    assert meta["epoch"] == 1
    assert "does not match state.msgpack" in capsys.readouterr().err


@pytest.mark.slow
def test_training_runs_emit_pngs(tmp_path):
    """Reference drivers save per-run PNGs (losses.png, training_summary.png,
    iteration_progression.png); both loops must too (when matplotlib is present)."""
    import os
    import jax
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.config import Config
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.train import loop

    try:
        import matplotlib  # noqa: F401
    except Exception:
        import pytest
        pytest.skip("matplotlib unavailable")

    cfg = Config(P=4, m=8, n=10, GHyp_hidden=4, GHN_iter_num=3, batch_size=4,
                 train_size=8, test_size=4, num_epochs=2, lr=1e-2, seed=0)
    loop.train_unfolded(cfg, str(tmp_path / "u"))
    assert os.path.exists(tmp_path / "u" / "losses.png")
    loop.train_gnn_progressive(cfg, str(tmp_path / "g"))
    assert os.path.exists(tmp_path / "g" / "training_summary.png")
    assert os.path.exists(tmp_path / "g" / "iteration_progression.png")


def test_checkify_debug_unroll(rng):
    """utils.debug.check_unroll passes clean data through and names the first
    non-finite op on poisoned data (the debugging surface the reference lacks)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import checkify
    import pytest
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.models import dadmm_core
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import graphs, sensing
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.utils import debug

    B, P, m, n, K = 2, 4, 6, 16, 3
    A = sensing.set_A(jax.random.key(0), P, m, n)
    AtA = sensing.gram(A)
    adj = jnp.asarray(graphs.sample_connected_er(np.random.default_rng(0), B, P, 0.6))
    b = jnp.asarray(np.random.default_rng(1).standard_normal((B, P, m)).astype(np.float32))
    Atb = sensing.At_apply(A, b)
    state = dadmm_core.init_state(jax.random.key(1), B, P, n)
    table = 0.05 * jnp.ones((K, P, 4), jnp.float32)

    Y = debug.check_unroll(state, table, AtA, Atb, adj)
    assert np.isfinite(np.asarray(Y)).all()

    bad_Atb = Atb.at[0, 0, 0].set(jnp.nan)
    with pytest.raises(checkify.JaxRuntimeError):
        debug.check_unroll(state, table, AtA, bad_Atb, adj)
