"""Driver: dataset pool persistence — `make` a reusable on-disk pool, `inspect` one.

The reference commits its pools as `data/data_{snr}_snr.npy` and every run reloads
them with head/tail slicing (`LoadData.py:7-31`). This tool generates and saves an
equivalent pool (npz: b, y, A, fingerprinted meta); training drivers consume it via
`--data_path pool.npz`, reproducing the slicing + 1200-truncation exactly
(`ops/datastore.py`). Two runs from the same pool see bit-identical data regardless
of JAX version or PRNG drift.

    python -m hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.data_tool make \
        --out data/pool_snr4.npz --pool_size 1200 --P 5 --m 100 --n 500 --snr 4
    python -m hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.data_tool inspect \
        --out data/pool_snr4.npz
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import numpy as np

from ..ops import data as data_ops
from ..ops import datastore, sensing


def main(argv=None):
    p = argparse.ArgumentParser(description="dataset pool make/inspect")
    p.add_argument("cmd", choices=["make", "inspect"])
    p.add_argument("--out", required=True, help="pool npz path")
    p.add_argument("--pool_size", type=int, default=datastore.REFERENCE_POOL_CAP)
    p.add_argument("--P", type=int, default=5)
    p.add_argument("--m", type=int, default=100)
    p.add_argument("--n", type=int, default=500)
    p.add_argument("--snr", type=float, default=4.0)
    p.add_argument("--sparsity", type=float, default=0.25)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--data_noise", action="store_true",
                   help="apply real SNR noise (default reproduces the reference's "
                        "noiseless quirk, gnn_data.py:12-14)")
    args = p.parse_args(argv)

    if args.cmd == "inspect":
        b, y, A, meta = datastore.load_dataset(args.out)
        info = {"pool": int(b.shape[0]), "b_shape": list(b.shape),
                "y_shape": list(y.shape),
                "A_shape": list(A.shape) if A is not None else None, "meta": meta}
        print(json.dumps(info, indent=2))
        return info

    key = jax.random.key(args.seed)
    k_A, k_data = jax.random.split(key)
    A = sensing.set_A(k_A, args.P, args.m, args.n)
    b, y = data_ops.make_dataset(k_data, A, args.pool_size, args.snr,
                                 sparsity=args.sparsity, noise=args.data_noise)
    meta = {"P": args.P, "m": args.m, "n": args.n, "snr": args.snr,
            "sparsity": args.sparsity, "seed": args.seed,
            "data_noise": bool(args.data_noise), "pool_size": args.pool_size}
    fp = datastore.save_dataset(args.out, np.asarray(b), np.asarray(y),
                                np.asarray(A), meta)
    print(f"saved pool {args.out} ({args.pool_size} samples, fingerprint {fp})",
          file=sys.stderr)
    print(json.dumps({"out": args.out, "fingerprint": fp,
                      "pool_size": args.pool_size}))
    return fp


if __name__ == "__main__":
    main()
