"""Golden-weights parity against the reference's own committed trained artifacts.

SURVEY.md §4 anchors: the reference snapshot commits trained cumsum-sigmoid tables
(`results/csv_folder1/model.pt`, raw `seq_hyp.param [25,5,4]`) together with the exact
sensing matrices (`A.pt`) and run config (`args.pt`). These tests load those REAL
trained weights (not synthetic fixtures) and check that:

1. our table parameterization reproduces the reference's sigmoid-cumsum-penalty-clamp
   math exactly on the trained values (`unfolded_DLASSO.py:156-168`);
2. the imported weights, run through OUR solver (`utils/torch_import.py` →
   `models/unfolded.py`), solve the LASSO problem at the loss the reference reported
   for them (~0.27, `results/csv_folder1/losses.csv` last row).

Skipped when the reference snapshot is not present.
"""

import os

import numpy as np
import pytest

REF = "/root/reference/results/csv_folder1"
pytestmark = [pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "model.pt")),
    reason="reference snapshot with committed trained weights not available",
), pytest.mark.slow]


@pytest.fixture(scope="module")
def golden():
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.utils import torch_import

    A, raw, cfg = torch_import.load_reference_unfolded_run(REF)
    return A, raw, cfg


def test_golden_table_parity(golden):
    """Our hyp_table on the reference's TRAINED raw values == a literal torch
    restatement of `seq_hyperparam.forward` (`unfolded_DLASSO.py:156-168`), per k."""
    import torch

    from hyperparameter_gnn_unfolded_d_admm_main_tpu.models import seq_hyperparam

    A, raw, cfg = golden
    maxes = np.asarray([cfg.alpha_max, cfg.tau_max, cfg.rho_max, cfg.eta_max],
                       np.float32)
    ours = np.asarray(seq_hyperparam.hyp_table(
        raw, maxes, training=True,
        max_penalty_threshold=cfg.max_penalty_threshold,
        penalty_reduction_factor=cfg.penalty_reduction_factor))

    param = torch.tensor(raw)
    max_param = torch.tensor(maxes).unsqueeze(0)
    for k in range(raw.shape[0]):
        hyp = torch.sum(param[: k + 1], dim=0).squeeze(0)
        hyp = torch.sigmoid(hyp) * max_param
        max_penalty = torch.sum(hyp) / (hyp.shape[0] * hyp.shape[1])
        if max_penalty > cfg.max_penalty_threshold:
            hyp = hyp * cfg.penalty_reduction_factor
        hyp = torch.clamp(hyp, min=1e-4, max=0.99)
        np.testing.assert_allclose(ours[k], hyp.numpy(), atol=2e-6,
                                   err_msg=f"iteration {k}")


def test_golden_weights_solve_at_reference_loss(golden, tmp_path):
    """Import the trained run, recover a topology from sampled candidates, and check
    the final-layer loss lands at the reference's own reported level.

    The reference never saves its training graph (`unfolded_train_new.py:56`), so the
    exact topology is found by search; with a modest candidate sample the best graph
    already reproduces the committed val loss 0.2747 within noise (full 728-graph
    enumeration: 0.2585 — PARITY.md)."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.utils import torch_import

    out = str(tmp_path / "imported")
    info = torch_import.import_unfolded_run(
        REF, out, recover_graph=True, graph_candidates=96, graph_samples=8)
    assert info["K"] == 25 and info["P"] == 5 and info["mode"] == "diff"
    # trained-table loss on its (approximately) recovered topology ~ reference val
    # loss 0.2747; generous band for graph/data sampling noise
    assert info["graph_loss_best"] < 0.45
    # the learned table is topology-specific: a median random graph must be clearly
    # worse than the recovered one, else the recovery is not discriminating
    assert info["graph_loss_median"] > info["graph_loss_best"]

    # the imported run serves through the standard evaluate path
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.cli import evaluate

    res = evaluate.main([out, "--device", "cpu", "--test_size", "16"])
    assert res["final_loss"] < 0.6
    curve = res["loss_curve"]
    assert curve[-1] < curve[0]  # the unroll converges under the imported table
