"""Driver: export a natively trained run BACK to the reference torch layout.

The reverse of `dadmm-import` — completes the migration story in both
directions. Unfolded-table runs export as `{model.pt, A.pt, args.pt}`
(`unfolded_train_new.py:146-184` layout; the state dict's single
`seq_hyp.param` entry is the raw cumsum table) and flagship progressive runs as
the rich `best_model.pt` dict (`gnn_dlasso_progressive.py:288-295`) + `A.pt` +
`args.pt`, loadable by the reference's own model classes:

    python -m hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.export_torch \
        <native_run_dir> <out_dir> [--ckpt best] [--device cpu]

Beyond-reference tiers (nodewise/mpnn/attention heads, GHyp1/GHyp1c, dlr,
classic) have no reference-side class to load into and are refused with an
explanatory error. Round-trip (export -> dadmm-import -> bit-equal pytrees) is
tested in tests/test_torch_export.py.
"""

from __future__ import annotations

import json
import os
import sys


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:
        print("usage: export_torch <native_run_dir> <out_dir> [--ckpt best] "
              "[--device cpu]")
        return {}
    src, dst = argv[0], argv[1]
    opts = dict(zip(argv[2:], argv[3:]))

    from ..utils.platform import select_device

    select_device(opts.get("--device", "cpu"))
    from ..utils import torch_import

    with open(os.path.join(src, "args.json")) as f:
        cfg = json.load(f)
    hyp_mode = cfg.get("hyp_mode", "unfolded")
    case = cfg.get("case", "dlasso")
    if case == "dlr":
        raise SystemExit("dlr runs are beyond-reference (the reference unfolds "
                         "LASSO only) — nothing reference-side can load them")
    ckpt = opts.get("--ckpt", "best")
    if hyp_mode == "GHyp":
        info = torch_import.export_progressive_run(src, dst, ckpt_name=ckpt)
    elif hyp_mode in ("GHyp1", "GHyp1c"):
        raise SystemExit(f"hyp_mode={hyp_mode} is a beyond-reference tier with "
                         "no reference-side class — only 'unfolded' tables and "
                         "the 'GHyp' flagship export")
    else:
        info = torch_import.export_unfolded_run(src, dst, ckpt_name=ckpt)
    print(f"exported {info['family']} run {src} -> {dst}  "
          f"(K={info['K']}, P={info['P']}, mode={info['mode']})")
    return info


if __name__ == "__main__":
    main()
