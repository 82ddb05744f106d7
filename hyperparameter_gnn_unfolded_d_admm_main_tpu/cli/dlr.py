"""Driver: classic sequential-segment D-ADMM linear regression (dlr case).

Equivalent of reference `dlr.py:14-132`: per-agent regression with weights + bias and
two duals, 6-hyperparameter table (rho, alpha, delta, eta, gamma, beta), diff/same
model select, sequential segments, loss + rounding-accuracy logging. MNIST is not
fetchable in this environment (reference expects a predownloaded copy,
`utils.py:12-17`); a seeded synthetic stand-in with the same shapes/metric semantics is
generated instead (`ops/classic_data.py:make_lr_dataset`).

    python -m hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.dlr \
        --case dlr --model diff --max_iter 24 --max_iter_seg 2 --num_epochs 5
"""

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
    out_dir = timestamped_dir(cfg.save_dir, "dlr_classic")

    if cfg.eval:
        import os

        import numpy as np

        table_path = os.path.join(
            cfg.save_dir,
            f"params_P={cfg.P}_batch={cfg.max_iter}_prob={cfg.graph_prob}_size={cfg.max_iter}.npy",
        )
        table = np.load(table_path)
        loss_curve, acc_curve = classic_loop.eval_classic_dlr(cfg, table, out_dir)
        print(f"per-iteration curves saved to {out_dir}; "
              f"final loss {loss_curve[-1]:.6f}, final acc {acc_curve[-1]:.2f}%")
        return {"loss_curve": loss_curve, "acc_curve": acc_curve}

    res = classic_loop.train_classic_dlr(cfg, out_dir)
    print(f"\nAll results saved to '{out_dir}'")
    print(f"best valid loss: {res['best_valid_loss']:.6f}")
    return res


if __name__ == "__main__":
    main()
