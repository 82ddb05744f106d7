"""Driver: progressive GNN-hypernetwork training (the reference's recommended flagship).

Equivalent of reference `gnn_dlasso_progressive.py:20-362`: fresh connected per-sample
graphs each batch, AdamW + clip 100, progressive K schedule (min_iterations ->
GHN_iter_num over 75% of epochs), plateau LR + manual damping at max K, early stop
patience 20. Artifacts `results/<ts>_progressive/{train_losses.csv, valid_losses.csv,
args.json, A.npy, best/, last/}` (CSV schema matches the reference's
`checkpoints/progressive_model_*/`).

    python -m hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.gnn_progressive \
        --num_epochs 100 --train_size 200 --batch_size 32 --lr 9e-4
"""

from ..config import args_parser
from ..train.loop import train_gnn_progressive
from ..utils.logging import timestamped_dir
from ..utils.platform import configure_platform


def main(argv=None):
    cfg = args_parser(argv)
    configure_platform(cfg)
    out_dir = timestamped_dir(cfg.save_dir, "progressive")
    res = train_gnn_progressive(cfg, out_dir, resume=cfg.resume or None)
    print(f"\nAll results saved to '{out_dir}'")
    print(f"best valid loss: {res['best_valid_loss']:.6f} | "
          f"final NMSE: {res['final_nmse']:.6f} | final K: {res['final_iterations']} | "
          f"steady-state steps/s: {res['steps_per_sec']:.3f}")
    return res


if __name__ == "__main__":
    main()
