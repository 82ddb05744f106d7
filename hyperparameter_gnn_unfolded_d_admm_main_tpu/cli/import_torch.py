"""Driver: import a reference-framework (PyTorch) trained run.

Converts a reference run directory into this framework's run layout so that
`cli.evaluate` / `cli.serve` can serve it and the training drivers can resume from
it. Both reference checkpoint families are handled (auto-detected):

- unfolded-table runs (`{model.pt, A.pt, args.pt}`, `unfolded_train_new.py:146-184`):
  the `seq_hyp.param` cumsum-sigmoid table;
- progressive-GNN flagship runs (`best_model.pt` / `final_model.pt` rich dicts,
  `gnn_dlasso_progressive.py:288-295,315-322`): the full GCN-encoder/decoder/fc
  state dict mapped onto the `models/gnn_hypernet.DLASSOGNNHyp` pytree.

    python -m hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.import_torch \
        /path/to/reference/results/csv_folder1 imported_run --recover_graph

`--recover_graph` (unfolded family only — the flagship trains on fresh per-batch
graphs) reconstructs the (unsaved) fixed training topology by scoring the imported
table on every candidate connected graph — for P=5 that is ALL 728 connected
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
              "[--graph_mode fixed|fresh] [--family auto|unfolded|progressive] "
              "[--ckpt_file best_model.pt]")
        return {}
    src, dst = argv[0], argv[1]
    rest = argv[2:]
    recover = "--recover_graph" in rest
    opts = dict(zip(rest, rest[1:]))

    from ..utils.platform import select_device

    select_device(opts.get("--device", "tpu"))
    from ..utils import torch_import

    family = opts.get("--family", "auto")
    if family == "auto":
        family = torch_import.detect_run_family(src)
    if family == "progressive":
        if recover:
            print("note: --recover_graph is unfolded-family only (the flagship "
                  "trains on fresh per-batch topologies; serving samples fresh "
                  "graphs) — ignoring", file=sys.stderr)
        info = torch_import.import_progressive_run(
            src, dst, ckpt_file=opts.get("--ckpt_file"))
        print(f"imported progressive run {src} -> {dst}  "
              f"(K={info['K']}, P={info['P']}, mode={info['mode']})")
        return info
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
