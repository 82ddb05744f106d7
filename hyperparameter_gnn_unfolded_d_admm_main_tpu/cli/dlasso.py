"""Driver: classic sequential-segment D-ADMM LASSO training / evaluation.

Equivalent of reference `dlasso.py:14-105`: cached single graph, hyperparameter table
initialized from the scalar flags, segments of `max_iter_seg` iterations trained in
sequence with frozen prefixes, learned tables saved per segment; `--eval` loads a table
and writes the per-iteration loss curve (the reference's `--eval` crashes on a missing
attribute, `dlasso.py:43` — fixed here by reading the table from `--save_dir`).

    python -m hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.dlasso \
        --max_iter 24 --max_iter_seg 2 --num_epochs 10 --P 5
"""

import os

import numpy as np

from ..config import args_parser
from ..train import classic_loop
from ..utils.logging import timestamped_dir
from ..utils.platform import configure_platform


def main(argv=None):
    cfg = args_parser(argv)
    if cfg.resume:
        raise SystemExit("--resume is not supported by this driver (supported: "
                         "unfolded_train_new, gnn_progressive, unfolded_dlr)")
    configure_platform(cfg)
    out_dir = timestamped_dir(cfg.save_dir, "dlasso_classic")

    if cfg.eval:
        table_path = os.path.join(
            cfg.save_dir,
            f"params_P={cfg.P}_batch={cfg.max_iter}_prob={cfg.graph_prob}.npy",
        )
        table = np.load(table_path)
        curve = classic_loop.eval_classic_dlasso(cfg, table, out_dir)
        print(f"per-iteration loss curve saved to {out_dir}; final {curve[-1]:.6f}")
        return {"loss_curve": curve}

    res = classic_loop.train_classic_dlasso(cfg, out_dir)
    print(f"\nAll results saved to '{out_dir}'")
    print(f"best valid loss: {res['best_valid_loss']:.6f}")
    return res


if __name__ == "__main__":
    main()
