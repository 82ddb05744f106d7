"""Driver: standard unfolded training with the learned scalar hyperparameter table.

Equivalent of reference `unfolded_train_new.py:18-184` (live benchmark #2): single fixed
ER graph, Adam, plateau LR, early stop patience 70, artifacts
`results/<ts>_unfolded_new/{losses.csv, args.json, A.npy, best/, last/}`.

    python -m hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.unfolded_train_new \
        --num_epochs 70 --train_size 128 --batch_size 32 --lr 2e-3 --GHN_iter_num 25
"""

from ..config import args_parser
from ..train.loop import train_unfolded
from ..utils.logging import timestamped_dir
from ..utils.platform import configure_platform


def main(argv=None):
    cfg = args_parser(argv)
    configure_platform(cfg)
    out_dir = timestamped_dir(cfg.save_dir, "unfolded_new")
    res = train_unfolded(cfg, out_dir, resume=cfg.resume or None)
    print(f"\nAll results saved to '{out_dir}'")
    print(f"best valid loss: {res['best_valid_loss']:.6f} | "
          f"final NMSE: {res['final_nmse']:.6f} | "
          f"steady-state steps/s: {res['steps_per_sec']:.3f}")
    return res


if __name__ == "__main__":
    main()
