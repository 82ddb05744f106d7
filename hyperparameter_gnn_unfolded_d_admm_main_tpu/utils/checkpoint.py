"""Checkpointing with actual resume.

The reference only *saves* (`torch.save` of state dicts and rich dicts,
`gnn_dlasso_progressive.py:288-295,315-322`; there is no load/resume path). Here a
checkpoint is a directory holding the full training state — model params, norm state,
optimizer state, host-side scheduler state, config, sensing matrix — so a run restarts
exactly. Arrays are serialized with `flax.serialization` (msgpack, no pickle).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
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
    """Serialize a pytree (+ JSON metadata) into directory `path` (atomic per file).

    Atomicity is per file, not across the pair; a crash between the two replaces can
    pair a new state.msgpack with the previous meta.json. The state hash stored in
    meta lets restore() detect that skew (consequence is benign — the scheduler
    replays one epoch with the newer params — but it should be visible, not silent)."""
    os.makedirs(path, exist_ok=True)
    state_bytes = serialization.to_bytes(_to_host(tree))
    _atomic_write(os.path.join(path, "state.msgpack"), state_bytes)
    if meta is not None:
        meta = dict(meta)
        meta["_state_sha256"] = hashlib.sha256(state_bytes).hexdigest()
        payload = json.dumps(meta, indent=2, sort_keys=True, default=str)
        _atomic_write(os.path.join(path, "meta.json"), payload.encode())


def _load_meta(path: str, state_bytes: Optional[bytes]) -> Optional[Dict]:
    meta_path = os.path.join(path, "meta.json")
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        meta = json.load(f)
    expect = meta.pop("_state_sha256", None)
    if expect is not None and state_bytes is not None:
        if hashlib.sha256(state_bytes).hexdigest() != expect:
            print(
                f"[checkpoint] warning: {meta_path} does not match state.msgpack "
                "(crash between the two writes?); scheduler metadata may lag the "
                "restored parameters by one epoch",
                file=sys.stderr,
            )
    return meta


def restore(path: str, target: Dict[str, Any]) -> Tuple[Dict[str, Any], Optional[Dict]]:
    """Restore into the structure of `target` (same-shaped pytree). Returns
    (tree, meta-or-None)."""
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        raw = f.read()
    tree = serialization.from_bytes(_to_host(target), raw)
    return tree, _load_meta(path, raw)


def restore_partial(path: str, targets: Dict[str, Any]) -> Tuple[Dict[str, Any], Optional[Dict]]:
    """Restore only the requested top-level keys (e.g. params without optimizer state
    — the inference path doesn't know the optimizer pytree)."""
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        raw_bytes = f.read()
    raw = serialization.msgpack_restore(raw_bytes)
    out = {k: serialization.from_state_dict(t, raw[k]) for k, t in targets.items()}
    return out, _load_meta(path, raw_bytes)


def exists(path: str) -> bool:
    return os.path.exists(os.path.join(path, "state.msgpack"))
