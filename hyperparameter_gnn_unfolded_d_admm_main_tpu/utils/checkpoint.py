"""Checkpointing with actual resume.

The reference only *saves* (`torch.save` of state dicts and rich dicts,
`gnn_dlasso_progressive.py:288-295,315-322`; there is no load/resume path). Here a
checkpoint is a directory holding the full training state — model params, norm state,
optimizer state, host-side scheduler state, config, sensing matrix — so a run restarts
exactly. Arrays are serialized with `flax.serialization` (msgpack, no pickle).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _atomic_write(path: str, data: bytes):
    """Write-to-temp + rename so a crash mid-save never corrupts the previous
    checkpoint (`last/` is overwritten every epoch; a torn state.msgpack would make
    --resume impossible). os.replace is atomic on POSIX within one filesystem."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def save(path: str, tree: Dict[str, Any], meta: Optional[Dict] = None):
    """Serialize a pytree (+ JSON metadata) into directory `path` (atomic per file)."""
    os.makedirs(path, exist_ok=True)
    _atomic_write(os.path.join(path, "state.msgpack"),
                  serialization.to_bytes(_to_host(tree)))
    if meta is not None:
        payload = json.dumps(meta, indent=2, sort_keys=True, default=str)
        _atomic_write(os.path.join(path, "meta.json"), payload.encode())


def restore(path: str, target: Dict[str, Any]) -> Tuple[Dict[str, Any], Optional[Dict]]:
    """Restore into the structure of `target` (same-shaped pytree). Returns
    (tree, meta-or-None)."""
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        tree = serialization.from_bytes(_to_host(target), f.read())
    meta = None
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return tree, meta


def restore_partial(path: str, targets: Dict[str, Any]) -> Tuple[Dict[str, Any], Optional[Dict]]:
    """Restore only the requested top-level keys (e.g. params without optimizer state
    — the inference path doesn't know the optimizer pytree)."""
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    out = {k: serialization.from_state_dict(t, raw[k]) for k, t in targets.items()}
    meta = None
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return out, meta


def exists(path: str) -> bool:
    return os.path.exists(os.path.join(path, "state.msgpack"))
