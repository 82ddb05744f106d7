"""Reverse migration (`dadmm-export`): native run -> reference torch layout.

Round trip: train a tiny run natively, export with `export_{unfolded,
progressive}_run`, re-import with the (already torch-round-trip-tested)
importers, and require bit-equal weights — proving a reference user can take a
natively trained model back to their own tooling.
"""

import os

import numpy as np
import pytest

pytestmark = [pytest.mark.slow]


def test_unfolded_export_roundtrip(tmp_path):
    import jax

    from hyperparameter_gnn_unfolded_d_admm_main_tpu.config import Config
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.train import loop
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.utils import torch_import

    cfg = Config(P=5, m=6, n=16, GHN_iter_num=4, batch_size=8, train_size=16,
                 test_size=8, num_epochs=2, lr=2e-3, seed=21,
                 native_prefetch=False)
    run = str(tmp_path / "native")
    loop.train_unfolded(cfg, run)

    out = str(tmp_path / "exported")
    info = torch_import.export_unfolded_run(run, out)
    assert info["family"] == "unfolded" and info["K"] == 4
    for f in ("model.pt", "A.pt", "args.pt"):
        assert os.path.exists(os.path.join(out, f))

    # the reference-layout dir re-imports to the SAME raw table and A
    A2, raw2, cfg2 = torch_import.load_reference_unfolded_run(out)
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.utils import checkpoint as ckpt

    tree, _ = ckpt.restore_partial(
        os.path.join(run, "best"),
        {"params": {"seq_hyp": np.zeros((4, cfg.P, 4), np.float32)}})
    np.testing.assert_array_equal(raw2, np.asarray(tree["params"]["seq_hyp"]))
    np.testing.assert_array_equal(A2, np.load(os.path.join(run, "A.npy")))
    assert cfg2.P == cfg.P and cfg2.GHN_iter_num == 4


def test_progressive_export_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from hyperparameter_gnn_unfolded_d_admm_main_tpu.config import Config
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.models.gnn_hypernet import (
        DLASSOGNNHyp)
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.train import loop
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.utils import (
        checkpoint as ckpt, torch_import)

    cfg = Config(P=5, m=6, n=16, GHyp_hidden=4, GHN_iter_num=3, batch_size=8,
                 train_size=16, test_size=8, num_epochs=2, lr=1e-3, seed=22,
                 decoder_type="flattened", native_prefetch=False)
    run = str(tmp_path / "native")
    loop.train_gnn_progressive(cfg, run)

    out = str(tmp_path / "exported")
    info = torch_import.export_progressive_run(run, out)
    assert info["family"] == "progressive"
    assert os.path.exists(os.path.join(out, "best_model.pt"))

    # re-import through the torch-format importer -> bit-equal pytrees
    back = str(tmp_path / "reimported")
    torch_import.import_progressive_run(out, back)
    A = jnp.asarray(np.load(os.path.join(run, "A.npy")))
    model = DLASSOGNNHyp(A, cfg)
    p0, s0 = model.init(jax.random.key(0))
    orig, _ = ckpt.restore_partial(os.path.join(run, "best"),
                                   {"params": p0, "norm_state": s0})
    got, _ = ckpt.restore_partial(os.path.join(back, "best"),
                                  {"params": p0, "norm_state": s0})
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(orig)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_refuses_beyond_reference_tiers(tmp_path):
    import json as _json

    from hyperparameter_gnn_unfolded_d_admm_main_tpu.cli import export_torch
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.config import Config
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.utils import torch_import

    run = tmp_path / "fake"
    os.makedirs(run)
    cfg = Config(P=5, hyp_mode="GHyp1c")
    with open(run / "args.json", "w") as f:
        f.write(cfg.to_json())
    with pytest.raises(SystemExit, match="beyond-reference"):
        export_torch.main([str(run), str(tmp_path / "out"), "--device", "cpu"])
    cfg2 = Config(P=5, hyp_mode="GHyp", decoder_type="nodewise")
    with open(run / "args.json", "w") as f:
        f.write(cfg2.to_json())
    with pytest.raises(ValueError, match="reference architecture"):
        torch_import.export_progressive_run(str(run), str(tmp_path / "out2"))
