"""File-backed dataset persistence: save once, reload the exact same dataset anywhere.

The reference workflow commits observation/label pairs to disk and reloads them with
head/tail slicing and a hard 1200-sample truncation (`LoadData.py:7-31`, consumed at
`utils.py:18-22`); the repo's default is seeded on-device regeneration. This module
closes the gap: `save_dataset` persists `(b, y, A)` plus a config-fingerprint as one
npz; `load_simulated_split` reproduces the reference's `SimulatedData` slicing so a
saved pool yields the identical train/test split the torch pipeline would produce.

Also provides the local-MNIST hook for the dlr family (`load_mnist_dir`): the
reference trains dlr on torchvision MNIST (`utils.py:12-17`, download=False — it too
expects the data already on disk). Zero-egress environments can't download; drop the
standard IDX files (or an `mnist.npz`) in a directory and pass `--data_path` to use
real MNIST, otherwise the synthetic stand-in (`ops/classic_data.py`) is used.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os
import struct
from typing import Optional, Tuple

import numpy as np

# Reference `LoadData.py:16-17`: the on-disk pool is always truncated to 1200.
REFERENCE_POOL_CAP = 1200


def config_fingerprint(meta: dict) -> str:
    """Stable hash of the generating configuration (detects silently-mismatched
    pools at load time)."""
    blob = json.dumps(meta, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def save_dataset(path: str, b: np.ndarray, y: np.ndarray,
                 A: Optional[np.ndarray] = None, meta: Optional[dict] = None) -> str:
    """Persist a generated pool: observations b [N,P,m], labels y [N,n], optionally
    the sensing matrix A [P,m,n], plus a JSON meta blob with its fingerprint.
    Atomic (temp + rename). Returns the fingerprint."""
    meta = dict(meta or {})
    fp = config_fingerprint(meta)
    meta["fingerprint"] = fp
    arrays = {
        "b": np.asarray(b), "y": np.asarray(y),
        "meta_json": np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
    }
    if A is not None:
        arrays["A"] = np.asarray(A)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)
    return fp


def load_dataset(path: str) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray], dict]:
    """Load a saved pool -> (b, y, A-or-None, meta)."""
    with np.load(path, allow_pickle=False) as z:
        b = z["b"]
        y = z["y"]
        A = z["A"] if "A" in z.files else None
        meta = json.loads(bytes(z["meta_json"]).decode()) if "meta_json" in z.files else {}
    return b, y, A, meta


def reference_slice(data: np.ndarray, label: np.ndarray, idx: int,
                    pool_cap: int = REFERENCE_POOL_CAP) -> Tuple[np.ndarray, np.ndarray]:
    """The reference's `SimulatedData` selection (`LoadData.py:16-24`): truncate the
    pool to `pool_cap`, then take the FIRST idx samples when idx >= 0.7*pool (the
    train split) and the LAST idx samples otherwise (the test split) — so train and
    test share a pool without overlapping as long as train+test <= pool."""
    data = data[:pool_cap]
    label = label[:pool_cap]
    if idx >= 0.7 * data.shape[0]:
        return data[:idx], label[:idx]
    return data[-idx:], label[-idx:]


def load_simulated_split(path: str, train_size: int, test_size: int,
                         expect_meta: Optional[dict] = None,
                         pool_cap: int = REFERENCE_POOL_CAP):
    """Load a saved pool and split it exactly as the reference dataset class would:
    returns ((b_tr, y_tr), (b_va, y_va), A-or-None, meta).

    `expect_meta`: shape-critical keys (P, m, n, snr, ...) to check against the
    pool's recorded meta; mismatches raise instead of silently training on the
    wrong pool."""
    b, y, A, meta = load_dataset(path)
    if expect_meta:
        for k, v in expect_meta.items():
            if k in meta and meta[k] != v:
                raise ValueError(
                    f"dataset {path} was generated with {k}={meta[k]!r}, "
                    f"run requests {k}={v!r}")
    n_pool = min(b.shape[0], pool_cap)
    if train_size + test_size > n_pool:
        raise ValueError(
            f"pool of {n_pool} can't serve train_size={train_size} + "
            f"test_size={test_size} without overlap")
    b_tr, y_tr = reference_slice(b, y, train_size, pool_cap)
    b_va, y_va = reference_slice(b, y, test_size, pool_cap)
    return (b_tr, y_tr), (b_va, y_va), A, meta


# ------------------------------------------------------------------ local MNIST hook


def _read_idx(path: str) -> np.ndarray:
    """Parse an IDX file (optionally .gz): the MNIST on-disk format."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic = struct.unpack(">I", f.read(4))[0]
        ndim = magic & 0xFF
        dims = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), dtype=np.uint8).reshape(dims)


_MNIST_FILES = {
    "train_images": ("train-images-idx3-ubyte", "train-images.idx3-ubyte"),
    "train_labels": ("train-labels-idx1-ubyte", "train-labels.idx1-ubyte"),
    "test_images": ("t10k-images-idx3-ubyte", "t10k-images.idx3-ubyte"),
    "test_labels": ("t10k-labels-idx1-ubyte", "t10k-labels.idx1-ubyte"),
}


def mnist_available(root: str) -> bool:
    try:
        _resolve_mnist_paths(root)
        return True
    except FileNotFoundError:
        return False


def _resolve_mnist_paths(root: str) -> dict:
    if os.path.isfile(os.path.join(root, "mnist.npz")):
        return {"npz": os.path.join(root, "mnist.npz")}
    out = {}
    for key, names in _MNIST_FILES.items():
        for name in names:
            for cand in (os.path.join(root, name), os.path.join(root, name + ".gz"),
                         os.path.join(root, "MNIST", "raw", name),
                         os.path.join(root, "MNIST", "raw", name + ".gz")):
                if os.path.isfile(cand):
                    out[key] = cand
                    break
            if key in out:
                break
        if key not in out:
            raise FileNotFoundError(f"MNIST file for {key} not found under {root}")
    return out


def load_mnist_dir(root: str):
    """Real-MNIST loader from a local directory (IDX files, their .gz forms, a
    torchvision-style MNIST/raw layout, or a consolidated mnist.npz with keys
    x_train/y_train/x_test/y_test).

    Returns ((x_tr [N,784] f32 in [0,1], y_tr [N] int), (x_te, y_te)). The
    reference feeds images through `transforms.ToTensor()` (`utils.py:13-16`),
    i.e. /255 scaling — reproduced here; the dlr model's own extra /255 quirk
    lives downstream in `ops/classic_data.py` exactly as in the reference.
    """
    paths = _resolve_mnist_paths(root)
    if "npz" in paths:
        with np.load(paths["npz"]) as z:
            x_tr, y_tr = z["x_train"], z["y_train"]
            x_te, y_te = z["x_test"], z["y_test"]
    else:
        x_tr = _read_idx(paths["train_images"])
        y_tr = _read_idx(paths["train_labels"])
        x_te = _read_idx(paths["test_images"])
        y_te = _read_idx(paths["test_labels"])
    f = lambda x: (x.reshape(x.shape[0], -1).astype(np.float32) / 255.0)
    return (f(x_tr), y_tr.astype(np.int64)), (f(x_te), y_te.astype(np.int64))
