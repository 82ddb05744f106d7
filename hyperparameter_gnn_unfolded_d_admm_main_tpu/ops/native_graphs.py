"""ctypes bindings for the native C++ graph builder (`native/graph_builder.cc`).

Per-batch fresh-topology sampling is host-side hot path in the progressive trainer
(the reference rebuilds `batch_size` networkx graphs every batch,
`gnn_dlasso_progressive.py:181-191`); the C++ builder produces packed dense adjacency
batches without the Python interpreter in the loop. Falls back silently when the shared
library has not been built (`ops/graphs.py` keeps a numpy path).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(here, "native", "libgraph_builder.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.sample_connected_er_batch.restype = None
        lib.sample_connected_er_batch.argtypes = [
            ctypes.c_uint64,   # seed
            ctypes.c_int32,    # batch
            ctypes.c_int32,    # P
            ctypes.c_double,   # prob
            ctypes.POINTER(ctypes.c_float),  # out adj [B*P*P]
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def sample_connected_er(seed: int, batch: int, P: int, prob: float) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native graph builder not built; run `make -C native`")
    out = np.empty((batch, P, P), dtype=np.float32)
    lib.sample_connected_er_batch(
        ctypes.c_uint64(seed),
        ctypes.c_int32(batch),
        ctypes.c_int32(P),
        ctypes.c_double(prob),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
