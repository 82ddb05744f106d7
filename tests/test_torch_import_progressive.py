"""Progressive-GNN checkpoint migration: torch-format round trip.

The reference's flagship saves rich checkpoints (`gnn_dlasso_progressive.py:288-295`:
`{epoch, model_state_dict, optimizer_state_dict, valid_loss, args,
current_iterations}`), but its own trained GNN weights are git-LFS-missing in the
snapshot, so no golden-weights test is possible for this family. Correctness of the
state-dict mapping is pinned by a synthetic round trip instead: export OUR
`DLASSOGNNHyp` pytree to the reference's torch naming
(`progressive_params_to_torch_state`), write a reference-layout run dir
(best_model.pt + A.pt + args.pt), import it with `import_progressive_run`, and
require (a) bit-equal parameter/norm-state pytrees and (b) a bit-equal forward —
then drive the imported run through the standard `cli.evaluate` surface.
"""

import argparse
import json
import os

import numpy as np
import pytest

pytestmark = [pytest.mark.slow]


def _make_reference_layout_run(tmp_path, cfg, model, params, norm_state):
    import torch

    from hyperparameter_gnn_unfolded_d_admm_main_tpu.utils import torch_import

    src = tmp_path / "ref_run"
    os.makedirs(src, exist_ok=True)
    sd = torch_import.progressive_params_to_torch_state(params, norm_state)
    ns = argparse.Namespace(**{
        k: getattr(cfg, k)
        for k in ("P", "m", "n", "GHyp_hidden", "GHN_iter_num", "DADMM_mode",
                  "alpha_max", "tau_max", "rho_max", "eta_max", "graph_prob",
                  "seed", "batch_size")
    })
    torch.save({"epoch": 7, "model_state_dict": sd,
                "optimizer_state_dict": {}, "valid_loss": 0.321,
                "args": ns, "current_iterations": cfg.GHN_iter_num},
               src / "best_model.pt")
    # reference keeps the leading broadcast axis: A [1, P, m, n]
    torch.save(torch.tensor(np.asarray(model.A)[None]), src / "A.pt")
    torch.save(ns, src / "args.pt")
    return str(src)


@pytest.fixture(scope="module")
def setup():
    import jax

    from hyperparameter_gnn_unfolded_d_admm_main_tpu.config import Config
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.models.gnn_hypernet import (
        DLASSOGNNHyp)
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import sensing

    cfg = Config(P=5, m=6, n=16, GHyp_hidden=4, GHN_iter_num=3,
                 decoder_type="flattened", batch_size=4)
    A = sensing.set_A(jax.random.key(0), cfg.P, cfg.m, cfg.n)
    model = DLASSOGNNHyp(A, cfg)
    params, norm_state = model.init(jax.random.key(1))
    # non-trivial running stats so the bn-state round trip is actually exercised
    # (init means are all-zero / vars all-one)
    ks = jax.random.split(jax.random.key(2), len(norm_state["bn"]))
    norm_state = {"bn": [
        {"mean": 0.1 * jax.random.normal(k, s["mean"].shape),
         "var": 1.0 + 0.1 * jax.random.uniform(k, s["var"].shape)}
        for k, s in zip(ks, norm_state["bn"])]}
    return cfg, model, params, norm_state


def test_progressive_roundtrip_bit_equal(setup, tmp_path):
    import jax
    import jax.numpy as jnp

    from hyperparameter_gnn_unfolded_d_admm_main_tpu.config import Config
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.models.gnn_hypernet import (
        DLASSOGNNHyp)
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import data as data_ops
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import graphs
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.utils import (
        checkpoint as ckpt, torch_import)

    cfg, model, params, norm_state = setup
    src = _make_reference_layout_run(tmp_path, cfg, model, params, norm_state)
    assert torch_import.detect_run_family(src) == "progressive"

    out = str(tmp_path / "imported")
    info = torch_import.import_progressive_run(src, out)
    assert info["family"] == "progressive"
    assert info["K"] == cfg.GHN_iter_num and info["P"] == cfg.P
    assert info["valid_loss"] == pytest.approx(0.321)
    assert info["current_iterations"] == cfg.GHN_iter_num

    # (a) bit-equal pytrees through the torch round trip
    with open(os.path.join(out, "args.json")) as f:
        cfg2 = Config.from_json(f.read())
    assert cfg2.hyp_mode == "GHyp" and cfg2.graph_mode == "fresh"
    assert cfg2.decoder_type == "flattened" and cfg2.encoder_type == "gcn"
    A2 = jnp.asarray(np.load(os.path.join(out, "A.npy")))
    np.testing.assert_array_equal(np.asarray(A2), np.asarray(model.A))
    model2 = DLASSOGNNHyp(A2, cfg2)
    p_init, s_init = model2.init(jax.random.key(0))
    tree, meta = ckpt.restore_partial(
        os.path.join(out, "best"), {"params": p_init, "norm_state": s_init})
    for got, want in zip(jax.tree_util.tree_leaves(tree["params"]),
                         jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for got, want in zip(jax.tree_util.tree_leaves(tree["norm_state"]),
                         jax.tree_util.tree_leaves(norm_state)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert meta["epoch"] == 7

    # (b) bit-equal forward (same key/batch/topology through both pytrees)
    b, _ = data_ops.make_dataset(jax.random.key(3), model.A, 4)
    adj = jnp.asarray(graphs.sample_connected_er(
        np.random.default_rng(4), 4, cfg.P, 0.5))
    key = jax.random.key(5)
    Y_orig = model.apply(params, norm_state, key, b, adj, training=False).Y
    Y_imp = model2.apply(tree["params"], tree["norm_state"], key, b, adj,
                         training=False).Y
    np.testing.assert_array_equal(np.asarray(Y_imp), np.asarray(Y_orig))


def test_progressive_import_serves_through_evaluate(setup, tmp_path):
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.cli import evaluate
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.utils import torch_import

    cfg, model, params, norm_state = setup
    src = _make_reference_layout_run(tmp_path, cfg, model, params, norm_state)
    out = str(tmp_path / "imported_serve")
    torch_import.import_progressive_run(src, out)
    res = evaluate.main([out, "--device", "cpu", "--test_size", "8"])
    assert np.isfinite(res["final_loss"])
    assert len(res["loss_curve"]) == cfg.GHN_iter_num


def test_progressive_import_cli_dispatch(setup, tmp_path, capsys):
    """`dadmm-import` auto-detects the progressive family (and --recover_graph is
    ignored with a note rather than an error)."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.cli import import_torch

    cfg, model, params, norm_state = setup
    src = _make_reference_layout_run(tmp_path, cfg, model, params, norm_state)
    out = str(tmp_path / "imported_cli")
    info = import_torch.main([src, out, "--recover_graph", "--device", "cpu"])
    assert info["family"] == "progressive"
    assert os.path.exists(os.path.join(out, "args.json"))
    captured = capsys.readouterr()
    assert "imported progressive run" in captured.out
    assert "ignoring" in captured.err


def test_progressive_loader_rejects_wrong_shapes(setup, tmp_path):
    """fc-head / decoder-width validation catches a P or hidden mismatch loudly."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.utils import torch_import

    cfg, model, params, norm_state = setup
    sd = torch_import.progressive_params_to_torch_state(params, norm_state)
    with pytest.raises(ValueError, match="fc head|decoder input"):
        torch_import.map_progressive_state(sd, cfg.P + 1, int(cfg.GHyp_hidden),
                                           cfg.DADMM_mode)
