"""CLI drivers end-to-end at tiny configs (CPU), compare tool, config round-trips."""

import pytest
import os

import numpy as np

from hyperparameter_gnn_unfolded_d_admm_main_tpu.cli import compare
from hyperparameter_gnn_unfolded_d_admm_main_tpu.config import Config, args_parser

pytestmark = [pytest.mark.slow]


def test_args_parser_reference_flags():
    cfg = args_parser(
        ["--P", "7", "--graph_prob", "0.4", "--GHN_iter_num", "12", "--DADMM_mode", "same",
         "--lr", "3e-4", "--optimizer", "sgd", "--no-nan_guard"]
    )
    assert cfg.P == 7 and cfg.graph_prob == 0.4 and cfg.GHN_iter_num == 12
    assert cfg.DADMM_mode == "same" and cfg.optimizer == "sgd"
    assert cfg.nan_guard is False


def test_config_defaults_match_reference():
    """Spot-check reference defaults (`configurations.py`)."""
    cfg = Config()
    assert (cfg.m, cfg.n, cfg.P) == (100, 500, 5)
    assert cfg.alpha_max == 0.1 and cfg.tau_max == 0.99
    assert cfg.rho == 0.2603 and cfg.alpha == 0.3013 and cfg.tau == 0.1142 and cfg.eta == 0.0867
    assert cfg.max_iter == 25 and cfg.max_iter_seg == 2
    assert cfg.GHN_iter_num == 15 and cfg.GHyp_hidden == 100


def test_compare_cli(tmp_path, monkeypatch):
    # two fake loss CSVs, reference schema (rightmost col = valid loss)
    a = tmp_path / "a.csv"
    a.write_text("epoch,train,valid\n" + "\n".join(f"{i},{1/(i+1)},{1.2/(i+1)}" for i in range(20)))
    b = tmp_path / "b.csv"
    b.write_text("mean,final\n" + "\n".join(f"{2/(i+1)},{1.5/(i+1)}" for i in range(15)))
    monkeypatch.chdir(tmp_path)
    results = compare.main([f"runA={a}", f"runB={b}"])
    assert set(results) == {"runA", "runB"}
    assert results["runA"]["final_loss"] < results["runB"]["final_loss"]
    out_dirs = os.listdir(tmp_path / "results")
    assert any(d.startswith("validation_loss_summary") for d in out_dirs)

    # --out pins the output dir (new surface); missing value errors instead of
    # silently timestamping under results/
    results = compare.main([f"runA={a}", "--out", str(tmp_path / "fixed")])
    assert "runA" in results
    assert os.path.exists(tmp_path / "fixed" / "validation_loss_summary.csv")
    assert compare.main([f"runA={a}", "--out"]) == {}


def test_classic_dlasso_cli_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.train import classic_loop

    cfg = Config(P=4, max_iter=4, max_iter_seg=2, num_epochs=1, train_size=20,
                 test_size=8, batch_size=4, lr=1e-2, seed=0, tensorboard=True)
    res = classic_loop.train_classic_dlasso(cfg, str(tmp_path / "out"))
    assert np.isfinite(res["best_valid_loss"])
    assert res["hyp_table"].shape == (4, 4, 4)
    # segment tables saved
    saved = [f for f in os.listdir(tmp_path / "out") if f.startswith("params_")]
    assert len(saved) >= 2
    # TensorBoard scalars emitted per epoch (reference `dlasso.py:71-72`) — only
    # asserted where a writer backend exists (TensorBoardWriter degrades to a no-op
    # without torch/tensorboard, by design)
    try:
        from torch.utils.tensorboard import SummaryWriter  # noqa: F401
    except Exception:
        pass
    else:
        tb_dir = tmp_path / "out" / "tb"
        assert tb_dir.is_dir() and any(f.startswith("events") for f in os.listdir(tb_dir))
    # eval path produces a loss-vs-iteration curve
    curve = classic_loop.eval_classic_dlasso(cfg, np.asarray(res["hyp_table"]), str(tmp_path / "out"))
    assert curve.shape == (4,)
    assert np.isfinite(curve).all()


def test_evaluate_cli_unfolded_run(tmp_path, monkeypatch):
    """evaluate.py on an unfolded run dir: reconstructs the fixed training graph and
    reports a decreasing per-iteration loss curve from the best checkpoint."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.cli import evaluate
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.train import loop

    cfg = Config(P=4, m=8, n=10, GHN_iter_num=4, batch_size=4, train_size=16,
                 test_size=8, num_epochs=3, lr=1e-2, seed=0)
    run_dir = str(tmp_path / "r_unfolded_new")
    import os
    os.makedirs(run_dir)
    loop.train_unfolded(cfg, run_dir)
    res = evaluate.main([run_dir, "--test_size", "8"])
    assert res["loss_curve"].shape == (4,)
    assert np.isfinite(res["loss_curve"]).all()
    assert np.isfinite(res["nmse"])
    assert os.path.exists(os.path.join(run_dir, "eval_loss_curve_best.npy"))


def test_classic_dlr_cli_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.train import classic_loop

    cfg = Config(P=4, case="dlr", model="same", max_iter=4, max_iter_seg=2, num_epochs=1,
                 train_size=20, test_size=8, batch_size=4, lr=1e-3, seed=0,
                 rho=2.4231e-05, alpha=4.3877e-04, eta=1.1221e-07)
    res = classic_loop.train_classic_dlr(cfg, str(tmp_path / "out"))
    assert np.isfinite(res["best_valid_loss"])
    assert res["hyp_table"].shape == (4, 1, 6)
    # eval path: per-iteration loss + accuracy curves from the learned table
    loss_curve, acc_curve = classic_loop.eval_classic_dlr(
        cfg, np.asarray(res["hyp_table"]), str(tmp_path / "out")
    )
    assert loss_curve.shape == (4,) and acc_curve.shape == (4,)
    assert np.isfinite(loss_curve).all()


def test_evaluate_cli_sharded_serving(tmp_path):
    """evaluate.py --mesh_data/--mesh_agents: multi-chip batch serving through the
    shard_map unroll reproduces the dense single-device evaluation."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.cli import evaluate
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.train import loop
    import os

    cfg = Config(P=4, m=8, n=10, GHN_iter_num=4, batch_size=4, train_size=16,
                 test_size=8, num_epochs=2, lr=1e-2, seed=0)
    run_dir = str(tmp_path / "r_unfolded_new")
    os.makedirs(run_dir)
    loop.train_unfolded(cfg, run_dir)
    dense = evaluate.main([run_dir, "--test_size", "8"])
    sharded = evaluate.main([run_dir, "--test_size", "8",
                             "--mesh_data", "2", "--mesh_agents", "4"])
    np.testing.assert_allclose(sharded["loss_curve"], dense["loss_curve"],
                               rtol=2e-4, atol=2e-4)
    # factored + bf16 serving stays finite and close on this tiny problem
    bf = evaluate.main([run_dir, "--test_size", "8", "--mesh_data", "2",
                        "--mesh_agents", "4", "--gram_mode", "factored",
                        "--dtype", "bfloat16"])
    assert np.isfinite(bf["loss_curve"]).all()


def test_evaluate_cli_gnn_sharded_serving(tmp_path):
    """GNN-family serving over a data mesh (--mesh_data): eval-mode forward is
    per-sample, so the sharded curve must reproduce the dense one."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.cli import evaluate
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.train import loop
    import os

    cfg = Config(P=4, m=8, n=10, GHN_iter_num=3, min_iterations=3, GHyp_hidden=8,
                 batch_size=4, train_size=16, test_size=8, num_epochs=2, lr=1e-2,
                 seed=0, hyp_mode="GHyp")
    run_dir = str(tmp_path / "r_gnn")
    os.makedirs(run_dir)
    loop.train_gnn_progressive(cfg, run_dir)
    dense = evaluate.main([run_dir, "--test_size", "8"])
    sharded = evaluate.main([run_dir, "--test_size", "8",
                             "--mesh_data", "2", "--mesh_agents", "1"])
    np.testing.assert_allclose(sharded["loss_curve"], dense["loss_curve"],
                               rtol=2e-4, atol=2e-4)


def test_unfolded_cli_resume_flag(tmp_path):
    """--resume continues a run from its last/ checkpoint through the CLI."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.cli import unfolded_train_new
    import os

    r1 = unfolded_train_new.main([
        "--P", "4", "--m", "8", "--n", "10", "--GHN_iter_num", "3",
        "--batch_size", "4", "--train_size", "8", "--test_size", "4",
        "--num_epochs", "2", "--lr", "1e-2",
        "--save_dir", str(tmp_path / "a"),
    ])
    r2 = unfolded_train_new.main([
        "--P", "4", "--m", "8", "--n", "10", "--GHN_iter_num", "3",
        "--batch_size", "4", "--train_size", "8", "--test_size", "4",
        "--num_epochs", "4", "--lr", "1e-2",
        "--save_dir", str(tmp_path / "b"),
        "--resume", os.path.join(r1["out_dir"], "last"),
    ])
    assert np.isfinite(r2["best_valid_loss"])
    with open(os.path.join(r2["out_dir"], "losses.csv")) as f:
        rows = f.read().strip().splitlines()
    assert rows[1].startswith("3,")  # resumed at epoch 3


def test_evaluate_cli_ghyp1_run(tmp_path):
    """evaluate.py serves a one-shot-tier (--hyp_mode GHyp1) progressive run:
    config-based family dispatch (args.json hyp_mode), not directory naming."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.cli import evaluate
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.train import loop
    import os

    cfg = Config(P=4, m=8, n=10, GHN_iter_num=4, min_iterations=4, GHyp_hidden=8,
                 batch_size=4, train_size=16, test_size=8, num_epochs=2, lr=1e-2,
                 seed=0, hyp_mode="GHyp1")
    run_dir = str(tmp_path / "r_oneshot")  # deliberately NOT *_progressive
    os.makedirs(run_dir)
    loop.train_gnn_progressive(cfg, run_dir)
    res = evaluate.main([run_dir, "--test_size", "8"])
    assert res["loss_curve"].shape == (4,)
    assert np.isfinite(res["loss_curve"]).all()
    assert np.isfinite(res["nmse"])


def test_evaluate_cli_dlr_ghyp1_run(tmp_path):
    """Train + evaluate the one-shot dlr hypernetwork tier (--hyp_mode GHyp1):
    per-sample [B,K,Pp,6] table through the batched unroll, round-tripped via ckpt."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.cli import evaluate, unfolded_dlr as drv

    res = drv.main([
        "--P", "4", "--n", "8", "--GHN_iter_num", "4", "--batch_size", "4",
        "--train_size", "16", "--test_size", "8", "--num_epochs", "4",
        "--lr", "1e-2", "--GHyp_hidden", "8", "--hyp_mode", "GHyp1",
        "--save_dir", str(tmp_path / "dlr1"),
    ])
    assert np.isfinite(res["best_valid_loss"])
    out = evaluate.main([res["out_dir"], "--test_size", "8"])
    assert out["loss_curve"].shape == (4,)
    assert np.isfinite(out["loss_curve"]).all()


def test_dlr_oneshot_table_per_sample_unroll():
    """The batched [B,K,Pp,6] table path of unroll_table matches running each sample
    separately with its own [K,Pp,6] table."""
    import jax
    import jax.numpy as jnp
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.models import unfolded_dlr as m
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import graphs

    B, P, d, K = 3, 4, 6, 5
    key = jax.random.key(0)
    kx, ky, kt, ks = jax.random.split(key, 4)
    x = jax.random.normal(kx, (B, P, d))
    y = jax.random.normal(ky, (B, P, 1))
    adj = jnp.asarray(graphs.fast_sample_connected_er(0, B, P, 0.6))
    table = jax.nn.sigmoid(jax.random.normal(kt, (B, K, P, 6))) * 0.1
    st = m.init_state(ks, B, P, d)
    _, per_kp_batched = m.unroll_table(st, table, x, y, adj, remat=False)
    # per-sample reference: run each sample alone with its own 3-D table
    per_sample = []
    for i in range(B):
        sti = m.DLRState(*(v[i:i + 1] for v in st))
        _, pk = m.unroll_table(sti, table[i], x[i:i + 1], y[i:i + 1],
                               adj[i:i + 1], remat=False)
        per_sample.append(pk)
    # batched per_kp averages over B; rebuild that average from the singles
    want = jnp.mean(jnp.stack(per_sample), axis=0)
    assert jnp.allclose(per_kp_batched, want, atol=1e-5)


def test_evaluate_cli_dlr_run(tmp_path):
    """evaluate.py on an unfolded-dlr run dir reports a finite, decreasing curve."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.cli import evaluate, unfolded_dlr as drv

    res = drv.main([
        "--P", "4", "--n", "8", "--GHN_iter_num", "4", "--batch_size", "4",
        "--train_size", "16", "--test_size", "8", "--num_epochs", "6",
        "--lr", "5e-2", "--save_dir", str(tmp_path / "dlr"),
    ])
    out = evaluate.main([res["out_dir"], "--test_size", "8"])
    assert out["loss_curve"].shape == (4,)
    assert np.isfinite(out["loss_curve"]).all()


def test_evaluate_cli_gnn_agent_sharded_serving(tmp_path):
    """Round 2: flagship GNN serving over the AGENT axis (--mesh_agents>1) via the
    packed-ring schedule — possible with the gcn encoder + nodewise head; the
    sharded curve must reproduce the dense one, and unshardable configs are
    rejected with a clear message."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.cli import evaluate
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.train import loop
    import os
    import pytest

    cfg = Config(P=4, m=8, n=10, GHN_iter_num=3, min_iterations=3, GHyp_hidden=8,
                 batch_size=4, train_size=16, test_size=8, num_epochs=2, lr=1e-2,
                 seed=0, hyp_mode="GHyp", decoder_type="nodewise")
    run_dir = str(tmp_path / "r_gnn_nw")
    os.makedirs(run_dir)
    loop.train_gnn_progressive(cfg, run_dir)
    dense = evaluate.main([run_dir, "--test_size", "8"])
    sharded = evaluate.main([run_dir, "--test_size", "8",
                             "--mesh_data", "2", "--mesh_agents", "4"])
    np.testing.assert_allclose(sharded["loss_curve"], dense["loss_curve"],
                               rtol=2e-4, atol=2e-4)

    # flattened-head run dirs reject agent sharding loudly
    cfg_f = cfg.replace(decoder_type="flattened")
    run_f = str(tmp_path / "r_gnn_flat")
    os.makedirs(run_f)
    loop.train_gnn_progressive(cfg_f, run_f)
    with pytest.raises(SystemExit, match="nodewise"):
        evaluate.main([run_f, "--test_size", "8",
                       "--mesh_data", "2", "--mesh_agents", "4"])
