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
from ..utils.platform import select_device


def main(argv=None):
    cfg = args_parser(argv)
    select_device(cfg.device)
    out_dir = timestamped_dir(cfg.save_dir, "dlr_classic")
    res = classic_loop.train_classic_dlr(cfg, out_dir)
    print(f"\nAll results saved to '{out_dir}'")
    print(f"best valid loss: {res['best_valid_loss']:.6f}")
    return res


if __name__ == "__main__":
    main()
