"""Async topology prefetcher over the native C++ pipeline (`native/pipeline.cc`).

The progressive trainer consumes one fresh graph batch per step, each derived from a
seed that increments by exactly 1 (train and validation interleaved on the same
counter; `train/loop.py`). `SequentialGraphPrefetcher` exploits that: on every `get`
it keeps a `depth`-deep window of upcoming seeds submitted to the C++ thread pool, so
sampling for step t+1..t+depth runs WHILE the TPU executes step t, instead of on the
host critical path (the reference pays this cost inline per batch,
`gnn_dlasso_progressive.py:181-191`).

Each submitted seed's batch is computed by the same pure function as the synchronous
builder (`native/sampling.h`), so prefetched output is bitwise-identical to
`native_graphs.sample_connected_er(seed, ...)` — enabling an exact-equality test and
making `--native_prefetch` a pure latency optimization, never a semantics change.
"""

from __future__ import annotations

import ctypes

import numpy as np

from . import native_graphs


def _bind(lib) -> bool:
    """Declare the pipeline entry points; False if the .so predates pipeline.cc."""
    try:
        lib.graph_pipeline_create.restype = ctypes.c_void_p
        lib.graph_pipeline_create.argtypes = [
            ctypes.c_int32, ctypes.c_int32, ctypes.c_double, ctypes.c_int32
        ]
        lib.graph_pipeline_submit.restype = None
        lib.graph_pipeline_submit.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.graph_pipeline_next.restype = ctypes.c_int32
        lib.graph_pipeline_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)
        ]
        lib.graph_pipeline_pending.restype = ctypes.c_int32
        lib.graph_pipeline_pending.argtypes = [ctypes.c_void_p]
        lib.graph_pipeline_destroy.restype = None
        lib.graph_pipeline_destroy.argtypes = [ctypes.c_void_p]
        return True
    except AttributeError:
        return False


def available() -> bool:
    lib = native_graphs._load()
    return lib is not None and hasattr(lib, "graph_pipeline_create")


class GraphPipeline:
    """Thin handle over the C++ pipeline: submit seeds, pop batches in submit order."""

    def __init__(self, batch: int, P: int, prob: float, n_threads: int = 2):
        lib = native_graphs._load()
        if lib is None or not _bind(lib):
            raise RuntimeError(
                "native pipeline not built; run `make -C native` (needs pipeline.cc)"
            )
        self._lib = lib
        self.batch, self.P = int(batch), int(P)
        self._h = lib.graph_pipeline_create(
            ctypes.c_int32(batch), ctypes.c_int32(P),
            ctypes.c_double(prob), ctypes.c_int32(n_threads),
        )

    def submit(self, seed: int) -> None:
        self._lib.graph_pipeline_submit(self._h, ctypes.c_uint64(seed))

    def next(self) -> np.ndarray:
        out = np.empty((self.batch, self.P, self.P), dtype=np.float32)
        rc = self._lib.graph_pipeline_next(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        if rc != 0:
            raise RuntimeError("graph_pipeline_next called with nothing submitted")
        return out

    def pending(self) -> int:
        return int(self._lib.graph_pipeline_pending(self._h))

    def close(self) -> None:
        if self._h is not None:
            self._lib.graph_pipeline_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __del__(self):  # best-effort; close() is the real contract
        try:
            self.close()
        except Exception:
            pass


class SequentialGraphPrefetcher:
    """Seed-windowed prefetcher for strictly incrementing seed sequences.

    `get(seed)` requires seeds to arrive as consecutive integers (seed0, seed0+1, ...),
    which is exactly the trainer's contract. It keeps `depth` future seeds in flight
    and returns the batch for the requested seed.
    """

    def __init__(self, batch: int, P: int, prob: float, depth: int = 4,
                 n_threads: int = 2):
        self._pipe = GraphPipeline(batch, P, prob, n_threads)
        self.depth = max(int(depth), 1)
        self._next_submit: int | None = None
        self._expected: int | None = None

    def get(self, seed: int) -> np.ndarray:
        if self._next_submit is None:
            self._next_submit = int(seed)
            self._expected = int(seed)
        if seed != self._expected:
            raise ValueError(
                f"SequentialGraphPrefetcher expects consecutive seeds: "
                f"got {seed}, expected {self._expected}"
            )
        while self._next_submit <= seed + self.depth:
            self._pipe.submit(self._next_submit)
            self._next_submit += 1
        self._expected += 1
        return self._pipe.next()

    def close(self) -> None:
        self._pipe.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
