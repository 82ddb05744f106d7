"""Pause + resume reproduces the uninterrupted run EXACTLY, all three trainers.

Checkpoints carry the jax PRNG key, the numpy shuffle-generator state, and the
graph seed (`train/loop._rng_meta`); without them a resumed run restarts every
stream from the config seed and silently diverges from the continuous
trajectory at the first post-resume batch. Dense single-device here (fast);
the sharded version of the same property is tests/test_sharded_training_e2e.py.
"""

import csv
import os

import numpy as np
import pytest

from hyperparameter_gnn_unfolded_d_admm_main_tpu.config import Config
from hyperparameter_gnn_unfolded_d_admm_main_tpu.train import loop

pytestmark = [pytest.mark.slow]


def _col(path, col):
    with open(path) as f:
        return np.asarray([float(r[col]) for r in csv.DictReader(f)])


def _run_pair(tmp_path, train_fn, cfg, csv_name, col):
    train_fn(cfg, str(tmp_path / "cont"))
    cont = _col(tmp_path / "cont" / csv_name, col)
    out_p = str(tmp_path / "paused")
    train_fn(cfg.replace(stop_after_epoch=3), out_p)
    seg1 = _col(os.path.join(out_p, csv_name), col)
    assert len(seg1) == 3
    train_fn(cfg, out_p, resume=os.path.join(out_p, "last"))
    seg2 = _col(os.path.join(out_p, csv_name), col)
    resumed = np.concatenate([seg1, seg2])
    assert len(cont) == 6 and len(resumed) == 6
    np.testing.assert_allclose(resumed, cont, rtol=0, atol=0)


def test_unfolded_pause_resume_exact(tmp_path):
    cfg = Config(P=5, m=6, n=16, GHN_iter_num=3, batch_size=8, train_size=16,
                 test_size=8, num_epochs=6, lr=2e-3, seed=11,
                 graph_mode="fresh", native_prefetch=False)
    _run_pair(tmp_path, loop.train_unfolded, cfg, "losses.csv", "valid_loss")


def test_gnn_progressive_pause_resume_exact(tmp_path):
    cfg = Config(P=5, m=6, n=16, GHyp_hidden=4, GHN_iter_num=3, batch_size=8,
                 train_size=16, test_size=8, num_epochs=6, lr=1e-3, seed=12,
                 native_prefetch=False)
    _run_pair(tmp_path, loop.train_gnn_progressive, cfg,
              "valid_losses.csv", "final")


def test_dlr_pause_resume_exact(tmp_path):
    cfg = Config(P=5, m=6, n=8, GHN_iter_num=3, batch_size=8, train_size=16,
                 test_size=8, num_epochs=6, lr=1e-3, seed=13,
                 native_prefetch=False)
    _run_pair(tmp_path, loop.train_unfolded_dlr, cfg, "losses.csv", "valid_loss")
