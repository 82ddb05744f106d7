"""Driver: unfolded distributed linear regression with a learned 6-param table.

BEYOND-REFERENCE extension: the reference unfolds only LASSO (its dlr support is the
classic Gauss-Seidel family, `cli/dlr.py` here). This driver applies the unfolding
recipe of `unfolded_train_new` to the dlr system (see models/unfolded_dlr.py).

    python -m hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.unfolded_dlr \
        --P 5 --n 50 --num_epochs 50 --train_size 128 --batch_size 32 --lr 2e-3
"""

from ..config import args_parser
from ..train.loop import train_unfolded_dlr
from ..utils.logging import timestamped_dir
from ..utils.platform import configure_platform


def main(argv=None):
    cfg = args_parser(argv)
    configure_platform(cfg)
    out_dir = timestamped_dir(cfg.save_dir, "unfolded_dlr")
    res = train_unfolded_dlr(cfg, out_dir, resume=cfg.resume or None)
    print(f"\nAll results saved to '{out_dir}'")
    print(f"best valid loss: {res['best_valid_loss']:.6f} | "
          f"steady-state steps/s: {res['steps_per_sec']:.3f}")
    return res


if __name__ == "__main__":
    main()
