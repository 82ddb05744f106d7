"""Driver: import a reference-framework (PyTorch) trained run.

Converts a reference unfolded-table run directory (`{model.pt, A.pt, args.pt}`,
written by `unfolded_train_new.py:146-184`) into this framework's run layout so that
`cli.evaluate` serves it and the training drivers can resume from it:

    python -m hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.import_torch \
        /path/to/reference/results/csv_folder1 imported_run --recover_graph

`--recover_graph` reconstructs the (unsaved) fixed training topology by scoring the
imported table on every candidate connected graph — for P=5 that is ALL 728 connected
labeled graphs, so the true topology is guaranteed to be considered (see
`utils/torch_import.py`).
"""

from __future__ import annotations

import sys


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:
        print("usage: import_torch <reference_run_dir> <out_dir> [--recover_graph] "
              "[--graph_samples N] [--graph_candidates N] [--device cpu] "
              "[--graph_mode fixed|fresh]")
        return {}
    src, dst = argv[0], argv[1]
    rest = argv[2:]
    recover = "--recover_graph" in rest
    opts = dict(zip(rest, rest[1:]))

    from ..utils.platform import select_device

    select_device(opts.get("--device", "tpu"))
    from ..utils import torch_import

    info = torch_import.import_unfolded_run(
        src, dst, recover_graph=recover,
        graph_candidates=int(opts.get("--graph_candidates", 1024)),
        graph_samples=int(opts.get("--graph_samples", 32)),
        graph_mode=opts.get("--graph_mode", "fixed"),
    )
    print(f"imported {src} -> {dst}  (K={info['K']}, P={info['P']}, mode={info['mode']})")
    if recover:
        print(f"recovered training graph over {info['graph_candidates']} candidates: "
              f"best loss {info['graph_loss_best']:.6f} "
              f"(median candidate {info['graph_loss_median']:.6f}) -> graph.npy")
    return info


if __name__ == "__main__":
    main()
