"""Analysis: compare validation-loss curves across runs.

Equivalent of reference `compare_validation_losses.py:7-206`: per-run final loss,
1%-band convergence epoch, stability (std of last 10 epochs), summary CSV and
comparison plots. Instead of three hard-coded paths (`:12-14`), runs are passed on the
command line as `name=path/to/losses.csv` pairs (the rightmost CSV column is the
validation loss, matching the reference's convention `:56`).

    python -m hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.compare \
        single=results/a/losses.csv gnn=results/b/valid_losses.csv
"""

from __future__ import annotations

import csv
import os
import sys
from datetime import datetime

import numpy as np

from ..utils.logging import save_json


def load_valid_losses(path: str) -> np.ndarray:
    """Rightmost column of the CSV = validation loss (`compare_validation_losses.py:56`)."""
    with open(path) as f:
        rows = list(csv.reader(f))
    return np.asarray([float(r[-1]) for r in rows[1:] if r], dtype=np.float64)


def analyze(losses: np.ndarray) -> dict:
    final = float(losses[-1])
    threshold = abs(final) * 0.01
    convergence = None
    for i, v in enumerate(losses):
        if abs(v - final) <= threshold:
            convergence = i + 1
            break
    tail = losses[-10:] if len(losses) >= 10 else losses
    return {
        "final_loss": final,
        "convergence_epoch": convergence,
        "stability_std_last10": float(np.std(tail)),
        "total_epochs": int(len(losses)),
    }


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    runs = {}
    out_dir = None
    it = iter(argv)
    for arg in it:
        if arg == "--out":                 # optional fixed output dir (new surface;
            out_dir = next(it, None)       # the reference always timestamps under
            if out_dir is None:            # results/, which stays the default)
                print("--out requires a directory argument")
                return {}
            continue
        if "=" not in arg:
            print(f"skipping malformed arg {arg!r} (expected name=path.csv)")
            continue
        name, path = arg.split("=", 1)
        if not os.path.exists(path):
            print(f"file not found: {path}")
            continue
        runs[name] = load_valid_losses(path)
    if not runs:
        print("no runs loaded; pass name=losses.csv pairs")
        return {}

    results = {name: analyze(v) for name, v in runs.items()}
    if out_dir is None:
        ts = datetime.now().strftime("%Y%m%d_%H%M%S")
        out_dir = os.path.join("results", f"validation_loss_summary_{ts}")
    os.makedirs(out_dir, exist_ok=True)

    with open(os.path.join(out_dir, "validation_loss_summary.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Model", "Final Loss", "Convergence Epoch", "Stability (Std Last 10)",
                    "Total Epochs"])
        for name, r in results.items():
            w.writerow([name, f"{r['final_loss']:.6f}", r["convergence_epoch"] or "N/A",
                        f"{r['stability_std_last10']:.6f}", r["total_epochs"]])
    save_json(os.path.join(out_dir, "summary.json"), results)

    print("=" * 60)
    print("VALIDATION LOSS SUMMARY")
    print("=" * 60)
    for name, r in results.items():
        print(f"{name:40s} final={r['final_loss']:.6f} conv@{r['convergence_epoch']} "
              f"std10={r['stability_std_last10']:.6f}")
    best = min(results.items(), key=lambda kv: kv[1]["final_loss"])
    print(f"best final loss: {best[0]} ({best[1]['final_loss']:.6f})")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(10, 6))
        for name, v in runs.items():
            plt.plot(range(1, len(v) + 1), v, label=name, linewidth=2)
        plt.xlabel("Epoch")
        plt.ylabel("Validation Loss")
        plt.title("Validation Loss Curves")
        plt.legend()
        plt.grid(True, alpha=0.3)
        plt.tight_layout()
        plt.savefig(os.path.join(out_dir, "validation_loss_curves.png"), dpi=150)
        plt.close()

        names = list(results.keys())
        for metric, fname, title in [
            ("final_loss", "final_loss_bar.png", "Final Validation Loss"),
            ("convergence_epoch", "convergence_epoch_bar.png", "Convergence Epoch"),
            ("stability_std_last10", "stability_bar.png", "Stability (Std Last 10)"),
        ]:
            vals = [results[n][metric] or 0 for n in names]
            plt.figure(figsize=(8, 5))
            plt.bar(names, vals, alpha=0.7)
            plt.title(title)
            plt.xticks(rotation=30, ha="right")
            plt.tight_layout()
            plt.savefig(os.path.join(out_dir, fname), dpi=150)
            plt.close()
    except ImportError:
        print("matplotlib unavailable; CSV/JSON summary written without plots")

    print(f"summary saved to: {out_dir}")
    return results


if __name__ == "__main__":
    main()
