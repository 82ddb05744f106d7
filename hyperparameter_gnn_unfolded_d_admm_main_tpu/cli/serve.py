"""Driver: persistent batch-inference server for trained runs.

The reference's only inference surface is a one-shot script run (`dlasso.py --eval`,
`dlasso.py:41-50`). This serves a trained run as a long-lived process: the checkpoint
is loaded ONCE, the solver is jitted ONCE at a fixed batch shape (static shapes are
what keep a TPU serving path at one compiled program — requests are padded to the
compiled batch and sliced back), and requests stream over newline-delimited JSON on a
TCP socket:

    dadmm-serve <run_dir> [--port 8763] [--host 127.0.0.1] [--max_batch 32]
                [--ckpt best] [--device tpu] [--dtype bfloat16]
                [--gram_mode factored] [--mesh_data D] [--mesh_agents A]

`--mesh_data/--mesh_agents` (mirroring `cli.evaluate`) run the compiled solve over a
(data, agents) device mesh: batch shards over `data`, agents + consensus collectives
over `agents` (unfolded family: shard_map'd unroll; flagship GNN: packed-ring
agent-sharded forward, data-parallel GSPMD for other GNN tiers). Hot reload keeps
working in every mesh mode (the tree stays a jit argument).

Request (one JSON object per line):
    {"b": [[...m floats...] x P]}                 one sample, or
    {"b": [[[...]] x B]}                          a batch [B, P, m]
    optional "adj": [[0/1 x P] x P] or [B x P x P] topology override, shared or
                                                  per-sample (defaults to the run's
                                                  fixed/recovered graph; GNN-family
                                                  runs sample a fresh connected graph)
Response:
    {"y_hat": [B x n], "batch": B, "K": K, "latency_ms": ...}
    y_hat = final-iteration consensus (mean over agents)

dlr runs (the saved config's `case` is "dlr") serve the regression fit instead:
    {"x": [B x P x d], "y": [B x P]}  ->  {"a": [B x P x d], "w": [B x P], ...}
where (a, w) are the per-agent fitted weights/bias after the K-iteration unroll.

Classic segment-table runs (reference `dlasso.py:59-102` artifacts: `params_*.npy`
tables, detected structurally — no msgpack checkpoint) serve the color-sweep
solver (`models/classic.py`; the reference's only inference surface for this
family is the one-shot `dlasso.py --eval` script, `dlasso.py:41-50`):
    {"b": [B x m_global]}  ->  {"y_hat": [B x n_global], ...}
on the run's cached color schedule ("adj" overrides rejected — the learned table
is specific to its Gauss-Seidel sweep order). Binary frames use P=1. Classic dlr
(6-hyperparameter) tables serve the regression fit over the same {"x","y"}
protocol as the unfolded dlr family (x is [B, P, d] where d is the run's
recorded `lr_feature_dim` — 784 flattened-MNIST by default,
`train/classic_loop.py:177`); the solver runs
the reference's color-sweep updates (`models.py:5-330`) with a seeded
deterministic state init.

`{"cmd": "ping"}` health-checks, `{"cmd": "stats"}` returns serving counters
(request/error/sample totals, rolling p50/p99 solve latency, coalescing
effectiveness, uptime), `{"cmd": "shutdown"}` stops the server. Serving knobs
(`--dtype bfloat16`, `--gram_mode factored`) match `cli.evaluate`'s.

Binary frames (high-throughput path, coexists with JSON on the same socket):
per B=8 request the JSON path allocates/parses ~0.5 MB of float strings, which is
both latency and — measured on the real chip — the serving TAIL: raw float32
frames cut p99 6.5x (157 vs 1026 ms) and lift single-client throughput 50%
(81.5 vs 54.5 solves/s); see the PARITY.md burst rows for the 1/8-client x
json/binary grid. The server dispatches per request on the first byte
(`{` = JSON line, `D` = binary frame), so one connection can mix both freely:

    request :  b"DBF1" | uint32 B | uint32 P | uint32 m | float32[B*P*m] b
    response:  b"DBF1" | uint32 B | uint32 n | float32[B*n] y_hat
    error   :  b"DBE1" | uint32 len | utf-8 message     (connection stays open)

Binary frames cover the hot dlasso/GNN solve (no adj override); everything else
(dlr fits, topology overrides, cmds) stays on JSON. Client helpers:
`binary_solve(rfile, wfile, b)` below.

`--coalesce_ms T` enables cross-request batching on the hot solve path of
EVERY family (dlasso/GNN observation solves, dlr regression fits — unfolded
and classic-table — and classic global-observation solves): a dispatcher
gathers concurrent requests for up to T ms (or `max_batch` samples) into ONE
padded solve and scatters the slices — N small-B clients approach the
big-batch single-request rate instead of serializing on the solver lock (see
`_Coalescer`). Requests with an "adj" override bypass it.

`--max_pending N` bounds the solve queue (admission control): at most N solve
requests may be pending (in flight + waiting) at once; excess requests are
shed IMMEDIATELY with an `OverloadedError` response (JSON error / DBE1 frame)
instead of queueing unboundedly, and the `shed` stats counter records them.
Default 0 = unbounded (measure-the-ceiling mode).
"""

from __future__ import annotations

import contextlib
import json
import os
import socketserver
import struct
import sys
import threading
import time

BIN_MAGIC = b"DBF1"
BIN_ERR_MAGIC = b"DBE1"


def _check_mesh_divisibility(cfg, max_batch: int, P: int) -> None:
    """Shared mesh-shape validation for both problem families."""
    if max_batch % cfg.mesh_data or P % cfg.mesh_agents:
        raise SystemExit(
            f"sharded serving needs max_batch ({max_batch}) divisible by "
            f"mesh_data ({cfg.mesh_data}) and P ({P}) divisible by "
            f"mesh_agents ({cfg.mesh_agents})")


def _read_exact(rfile, n: int) -> bytes:
    """Read exactly n bytes from a buffered file object (b"" only at clean EOF;
    a torn frame surfaces as a short read). bytearray accumulation: frames run up
    to max_request_bytes (64MB), where bytes += would go quadratic."""
    data = bytearray()
    while len(data) < n:
        chunk = rfile.read(n - len(data))
        if not chunk:
            break
        data += chunk
    return bytes(data)


def binary_solve(rfile, wfile, b_np):
    """Client-side helper: one binary solve round trip. b_np is [P, m] or [B, P, m]
    float-like; returns y_hat [B, n]. Raises RuntimeError on a DBE1 error frame."""
    import numpy as np

    b_np = np.asarray(b_np, dtype="<f4")
    if b_np.ndim == 2:
        b_np = b_np[None]
    B, P, m = b_np.shape
    wfile.write(struct.pack("<4sIII", BIN_MAGIC, B, P, m)
                + np.ascontiguousarray(b_np).tobytes())
    wfile.flush()
    magic = _read_exact(rfile, 4)
    if magic == BIN_ERR_MAGIC:
        (ln,) = struct.unpack("<I", _read_exact(rfile, 4))
        raise RuntimeError(_read_exact(rfile, ln).decode())
    if magic != BIN_MAGIC:
        raise RuntimeError(f"bad response magic {magic!r}")
    B_out, n = struct.unpack("<II", _read_exact(rfile, 8))
    payload = _read_exact(rfile, B_out * n * 4)
    if len(payload) != B_out * n * 4:
        raise RuntimeError(
            f"truncated response / connection closed: got {len(payload)} of "
            f"{B_out * n * 4} payload bytes")
    return np.frombuffer(payload, "<f4").reshape(B_out, n)


class _Stats:
    """Lightweight serving counters for the `{"cmd": "stats"}` endpoint: request/
    error/sample totals, rolling solve-latency percentiles (last 1024), and
    coalescing effectiveness. Semantics: `requests`/`errors` count SOLVE
    traffic and protocol failures (malformed JSON/frames); cmd requests
    (ping/stats/reload/shutdown) are never counted, succeed or fail. The
    reference has no observability at all; a long-lived daemon needs at least
    this much to be operated."""

    def __init__(self):
        from collections import deque

        self._lock = threading.Lock()
        self.t_start = time.time()
        self.requests = 0
        self.errors = 0
        self.samples = 0
        self.coalesced_batches = 0
        self.coalesced_requests = 0
        self.shed = 0
        self._lat = deque(maxlen=1024)

    def record(self, latency_ms: float, samples: int, ok: bool = True):
        # latency_ms is SOLVE latency: measured around the solver call only
        # (including any coalescing-window wait), excluding response
        # serialization/socket writes — identical definition on the binary
        # and JSON protocol paths.
        with self._lock:
            self.requests += 1
            if ok:
                self.samples += int(samples)
                self._lat.append(latency_ms)
            else:
                self.errors += 1

    def record_coalesced(self, n_requests: int):
        with self._lock:
            self.coalesced_batches += 1
            self.coalesced_requests += n_requests

    def record_shed(self):
        # Sheds are load management, not failures: counted in `requests` (the
        # client did offer a solve) and `shed`, never in `errors`, and they
        # contribute no latency sample (the refusal is immediate).
        with self._lock:
            self.requests += 1
            self.shed += 1

    def snapshot(self) -> dict:
        import numpy as np

        with self._lock:
            lats = list(self._lat)
            snap = {"uptime_s": round(time.time() - self.t_start, 1),
                    "requests": self.requests, "errors": self.errors,
                    "samples_solved": self.samples, "shed": self.shed,
                    "coalesced_batches": self.coalesced_batches,
                    "coalesced_requests": self.coalesced_requests}
        if lats:
            p50, p99 = np.percentile(np.asarray(lats), [50, 99])
            snap["latency_ms"] = {"p50": round(float(p50), 1),
                                  "p99": round(float(p99), 1),
                                  "window": len(lats)}
        return snap


class OverloadedError(RuntimeError):
    """Raised when `--max_pending` admission control sheds a solve request.

    The daemon measures a hard throughput ceiling (the compiled solve rate);
    when offered load exceeds it, unbounded queueing just converts the excess
    into latency (measured r4: p50 1004 ms at 8 uncoalesced clients — every
    request happily waits). With `--max_pending N`, at most N solve requests
    may be admitted (in flight + waiting on the solver lock / coalescing
    queue) at once; the N+1-th is refused IMMEDIATELY with this error (JSON
    `{"error": "OverloadedError: ..."}` / binary DBE1 frame), so clients get
    backpressure they can react to instead of a silently growing tail. Sheds
    are counted separately from errors in the stats (`shed`)."""


class _Coalescer:
    """Cross-request batching for the hot solve paths (dlasso/GNN and dlr).

    Without it, N small-B clients serialize on the solver lock and each pays a
    full dispatch (measured r3/r4: concurrency adds queueing delay, not chip
    throughput). With `--coalesce_ms T`, a dispatcher thread gathers concurrent
    requests for up to T ms (or until `max_batch` samples) and runs them as ONE
    padded solve, then scatters the per-request slices — so 8 clients at B=8
    approach the B=64 single-request rate instead of 8x the B=8 rate.

    A server serves one problem family, so the coalescer is built with that
    family's `kind` ("dlasso" = observation solves via `_Solver.solve`;
    "dlr" = regression fits via `_Solver.solve_dlr`, both the unfolded and
    classic-table dlr solvers; "classic" = global-observation color-sweep
    solves via `_Solver.solve_classic`) and every queued item carries the same
    tuple layout — (b,) or (x, y) — concatenated position-wise into the fused
    batch.

    Note on numerics: the solver's random state init assigns noise by position
    in the padded batch, so a coalesced request's answer can differ from its
    solo-request answer within the solver's init-noise tolerance — exactly as
    it already does between two clients batching differently. Requests with a
    topology override bypass coalescing (they need their own adj)."""

    def __init__(self, solver: "_Solver", window_ms: float, kind: str = "dlasso"):
        import queue

        assert kind in ("dlasso", "dlr", "classic"), kind
        self._kind = kind
        self._q: "queue.Queue" = queue.Queue()
        self._solver = solver
        self._window = window_ms / 1e3
        t = threading.Thread(target=self._loop, daemon=True,
                             name="serve-coalescer")
        t.start()

    def solve(self, b_np):
        # Validate HERE, per item — a malformed request must fail its own
        # client, never the other requests sharing a coalescing window.
        s = self._solver
        if b_np.ndim != 3 or b_np.shape[1:] != (s.P, s.m):
            raise ValueError(
                f"b must be [B,{s.P},{s.m}], got {list(b_np.shape)}")
        (y,) = self._submit((b_np,))
        return y, b_np.shape[0]

    def solve_dlr(self, x_np, y_np):
        # Same per-item validation/normalization as _Solver.solve_dlr so the
        # position-wise concatenation below is shape-safe.
        s = self._solver
        if x_np.ndim == 2:
            x_np = x_np[None]
        if y_np.ndim == 1:
            y_np = y_np[None]
        if y_np.ndim == 2:
            y_np = y_np[..., None]
        B = x_np.shape[0]
        if x_np.shape[1:] != (s.P, s.m) or y_np.shape != (B, s.P, 1):
            raise ValueError(
                f"x must be [B,{s.P},{s.m}] and y [B,{s.P}], got "
                f"{list(x_np.shape)} / {list(y_np.shape)}")
        a, w = self._submit((x_np, y_np))
        return a, w, B

    def solve_classic(self, b_np):
        s = self._solver
        if b_np.ndim == 1:
            b_np = b_np[None]
        if b_np.ndim != 2 or b_np.shape[1:] != (s.m,):
            raise ValueError(f"b must be [B,{s.m}] (global observation), "
                             f"got {list(b_np.shape)}")
        (y,) = self._submit((b_np,))
        return y, b_np.shape[0]

    def _submit(self, arrays):
        ev = threading.Event()
        slot: dict = {}
        self._q.put((arrays, slot, ev))
        # Bounded wait: if the dispatcher thread ever died, fail THIS request
        # with a clear error instead of hanging its handler forever (the
        # per-solve budget is generous — a coalesced window is the --coalesce_ms
        # gather plus one chip dispatch, well under a second at max_batch).
        if not ev.wait(timeout=self.SOLVE_TIMEOUT_S):
            raise RuntimeError(
                f"coalesced solve did not complete within "
                f"{self.SOLVE_TIMEOUT_S:.0f}s (dispatcher stalled or dead)")
        if "err" in slot:
            raise slot["err"]
        return slot["out"]

    SOLVE_TIMEOUT_S = 120.0   # >> any window + dispatch; only trips on a wedge

    def _dispatch(self, arrays):
        """Run one fused solve; returns the per-sample output arrays to scatter
        (row i of each output belongs to sample i of the fused batch)."""
        if self._kind == "dlr":
            a, w, _ = self._solver.solve_dlr(*arrays)
            return (a, w)
        if self._kind == "classic":
            y, _ = self._solver.solve_classic(arrays[0])
            return (y,)
        y, _ = self._solver.solve(arrays[0])
        return (y,)

    def _loop(self):
        import queue as _q

        while True:
            # The ENTIRE iteration runs under try/except: an exception anywhere
            # (including the queue-gather section) must never kill the
            # dispatcher thread — that would hang every future request.
            items = []
            try:
                items = [self._q.get()]
                deadline = time.perf_counter() + self._window
                total = items[0][0][0].shape[0]
                while total < self._solver.max_batch:
                    left = deadline - time.perf_counter()
                    if left <= 0:
                        break
                    try:
                        nxt = self._q.get(timeout=left)
                    except _q.Empty:
                        break
                    items.append(nxt)
                    total += nxt[0][0].shape[0]
                np = self._solver._np
                fused = tuple(np.concatenate(pos)
                              for pos in zip(*(it[0] for it in items)))
                outs = self._dispatch(fused)
                if len(items) > 1:
                    self._solver.stats.record_coalesced(len(items))
                off = 0
                for arrays, slot, ev in items:
                    n = arrays[0].shape[0]
                    slot["out"] = tuple(o[off:off + n] for o in outs)
                    off += n
                    ev.set()
            except Exception:  # noqa: BLE001 - isolate: retry each item alone so
                # one failing payload cannot poison its window-mates
                for arrays, slot, ev in items:
                    try:
                        slot["out"] = self._dispatch(arrays)
                    except Exception as e2:  # noqa: BLE001
                        slot["err"] = e2
                    ev.set()


class _Solver:
    """Checkpoint loaded once; one jitted solve at a fixed [max_batch, P, m] shape."""

    def __init__(self, run_dir: str, ckpt_name: str, max_batch: int, overrides: dict):
        import glob

        import jax
        import jax.numpy as jnp
        import numpy as np

        from ..config import Config
        from ..models.gnn_hypernet import (DLASSOGNNHyp, DLASSOGNNHypOneShot,
                                           DLASSOGNNHypOneShotCorrected)
        from ..models.unfolded import UnfoldedDLASSO
        from ..ops import graphs
        from ..utils import checkpoint as ckpt

        self.coalescer = None   # set by main() when --coalesce_ms > 0
        self.max_pending = None  # set by main() when --max_pending > 0
        self._pending = 0
        self._pending_lock = threading.Lock()
        self.stats = _Stats()
        args_path = os.path.join(run_dir, "args.json")
        cfg = None
        if os.path.exists(args_path):
            with open(args_path) as f:
                cfg = Config.from_json(f.read())
        # Classic segment-table runs (train/classic_loop.py, reference
        # `dlasso.py:59-102`) save `params_*.npy` hyp tables, not msgpack
        # checkpoints — detect them structurally so `dadmm-serve <classic_run>`
        # just works (older classic artifacts may even lack args.json; the
        # filename encodes P/prob/K).
        params_files = sorted(glob.glob(os.path.join(run_dir, "params_*.npy")))
        has_ckpt = any(
            os.path.exists(os.path.join(run_dir, name, "state.msgpack"))
            for name in {ckpt_name, "best", "last"})
        if params_files and not has_ckpt:
            if cfg is None:
                cfg = Config()
            for k, v in overrides.items():
                cfg = cfg.replace(**{k: v})
            self.cfg = cfg
            self.max_batch = max_batch
            self._mesh_agent_sharded = False
            self._init_classic(run_dir, params_files, overrides)
            return
        if cfg is None:
            raise SystemExit(f"{run_dir} has no args.json (and no classic "
                             "params_*.npy tables)")
        for k, v in overrides.items():
            cfg = cfg.replace(**{k: v})
        self.cfg = cfg
        self.max_batch = max_batch
        self._mesh_agent_sharded = False
        # Family dispatch mirrors cli.evaluate: args.json's `case` (recorded by the
        # dlr loop), with the directory-name suffix as a fallback for run dirs saved
        # before `case` was recorded.
        is_dlr = (cfg.case == "dlr" or
                  os.path.basename(os.path.normpath(run_dir)).endswith("unfolded_dlr"))
        self.case = "dlr" if is_dlr else cfg.case
        if is_dlr:
            if "dtype" in overrides or "gram_mode" in overrides:
                print("note: dlr serving currently runs dense float32 — "
                      "--dtype/--gram_mode are ignored for this family",
                      file=sys.stderr)
            self._init_dlr(run_dir, ckpt_name)
            return
        A = jnp.asarray(np.load(os.path.join(run_dir, "A.npy")))
        self.P, self.m, self.n = A.shape
        # Mesh-sharded serving (--mesh_data/--mesh_agents, mirroring cli.evaluate):
        # the compiled solve runs over a (data, agents) device mesh — batch shards
        # over `data`, the P agents (and the consensus collectives) over `agents`.
        n_mesh = cfg.mesh_data * cfg.mesh_agents
        if n_mesh > 1:
            _check_mesh_divisibility(cfg, max_batch, self.P)

        # GNN-family detection mirrors cli.evaluate: recorded tier in args.json,
        # directory-name suffix as fallback for runs saved before hyp_mode recording
        # (e.g. the flagship progressive run trained early in this repo's history).
        self.is_gnn = (cfg.hyp_mode in ("GHyp", "GHyp1", "GHyp1c") or os.path.basename(
            os.path.normpath(run_dir)).endswith("progressive"))
        self._run_dir = run_dir
        if self.is_gnn:
            model_cls = {"GHyp1": DLASSOGNNHypOneShot,
                         "GHyp1c": DLASSOGNNHypOneShotCorrected}.get(cfg.hyp_mode, DLASSOGNNHyp)
            model = model_cls(A, cfg)
            params, norm_state = model.init(jax.random.key(0))
            self._tree_template = {"params": params, "norm_state": norm_state}
            self._tree = self._restore(ckpt_name)
            # GNN runs train on fresh per-sample graphs; default serving topology
            # likewise (deterministic seed — override per request via "adj").
            self.default_adj = np.asarray(graphs.fast_sample_connected_er(
                int(cfg.seed) + 7, max_batch, cfg.P, max(cfg.graph_prob, getattr(cfg, 'graph_prob_floor', 0.3))))
            # The checkpoint tree is a jit ARGUMENT, not a closure constant, so
            # `{"cmd": "reload"}` can hot-swap weights without recompiling (same
            # shapes/dtypes => same compiled executable). Serving consumes only the
            # final iterate; slicing inside the jit lets XLA dead-code-eliminate
            # the stacked-Y materialization.
            if n_mesh > 1 and cfg.mesh_agents > 1:
                # Agent-sharded flagship serving: packed-ring GCN + nodewise head
                # (parallel/gnn_sharded.py). Topology is packed host-side once at
                # startup, so per-request "adj" overrides are rejected in this mode.
                if (cfg.hyp_mode not in ("GHyp",) or cfg.encoder_type != "gcn"
                        or cfg.decoder_type != "nodewise"):
                    raise SystemExit(
                        "--mesh_agents > 1 for the GNN family needs the flagship "
                        "tier with encoder_type=gcn decoder_type=nodewise "
                        "(parallel/gnn_sharded.py); other tiers/heads consume "
                        "global tensors — use --mesh_data N --mesh_agents 1")
                from ..models import dadmm_core
                from ..parallel import gnn_sharded, mesh as mesh_lib

                mesh = mesh_lib.make_mesh(cfg.mesh_data, cfg.mesh_agents)
                topo = gnn_sharded.ShardedGNNTopology(
                    self.default_adj, num_shards=cfg.mesh_agents)
                fwd = gnn_sharded.make_sharded_gnn_forward(mesh, model, _raw=True)
                self._mesh_agent_sharded = True

                def _gnn_sharded_fn(tree, k, b, adj):
                    del adj  # fixed packed topology (validated in solve())
                    k_init, _ = jax.random.split(k)
                    st0 = dadmm_core.init_state(
                        k_init, b.shape[0], cfg.P, cfg.n, dtype=b.dtype)
                    Y, _ = fwd(tree["params"], tree["norm_state"], st0, k, b,
                               topo.tree())
                    return Y[-1]

                self._fn = jax.jit(_gnn_sharded_fn)
                # the jit ignores adj (packed once at startup) — pass a scalar
                # placeholder instead of transferring [max_batch, P, P] per chunk
                # (at P=1024/max_batch=32 that would be ~134 MB of dead H2D)
                self._adj_placeholder = jnp.zeros((), jnp.float32)
            elif n_mesh > 1:
                # Data-parallel GNN serving: eval-mode forward is purely per-sample
                # (running stats, no dropout), so GSPMD shards the batch cleanly.
                from jax.sharding import NamedSharding, PartitionSpec
                from ..parallel import mesh as mesh_lib

                mesh = mesh_lib.make_mesh(cfg.mesh_data, 1)
                dp = NamedSharding(mesh, PartitionSpec(mesh_lib.DATA_AXIS))
                repl = NamedSharding(mesh, PartitionSpec())
                # final-iterate-only scan here too (the dense branch's +26%
                # lever — stacked-Y DCE is not guaranteed under GSPMD either)
                self._fn = jax.jit(
                    lambda tree, k, b, adj: model.apply_final(
                        tree["params"], tree["norm_state"], k, b, adj,
                        training=False),
                    in_shardings=(repl, repl, dp, dp))
            else:
                # final-iterate-only unroll (no per-iteration Y snapshot in the
                # scan — same serving lever as the table tier's apply_final)
                self._fn = jax.jit(lambda tree, k, b, adj: model.apply_final(
                    tree["params"], tree["norm_state"], k, b, adj, training=False))
        else:
            model = UnfoldedDLASSO(A, cfg)
            params = model.init()
            self._tree_template = {"params": params}
            self._tree = self._restore(ckpt_name)
            if n_mesh > 1:
                # Mesh-sharded unfolded serving: shard_map'd unroll with collective
                # consensus over (data, agents) — the table is derived from the
                # tree INSIDE the jit so hot reload still works.
                from ..models import dadmm_core, seq_hyperparam
                from ..ops import sensing
                from ..parallel import mesh as mesh_lib, unfolded_sharded

                mesh = mesh_lib.make_mesh(cfg.mesh_data, cfg.mesh_agents)
                factored = cfg.gram_mode == "factored" or (
                    cfg.gram_mode == "auto" and 2 * cfg.m < cfg.n)
                unroll = unfolded_sharded.make_sharded_unroll(
                    mesh,
                    gram_mode="factored" if factored else "gram",
                    nan_guard=cfg.nan_guard,
                    remat=False,  # serving: no backward pass to rematerialize for
                    solver_dtype=cfg.dtype if cfg.dtype != "float32" else None,
                    matmul_dtype=(cfg.matmul_dtype
                                  if cfg.matmul_dtype != "float32" else None),
                    final_only=True,  # no stacked-Y writes in the serving scan
                )
                op = A if factored else model.AtA
                K = int(cfg.GHN_iter_num)

                def _sharded_fn(tree, k, b, adj):
                    table = seq_hyperparam.hyp_table(
                        tree["params"]["seq_hyp"], model.max_param, training=False)
                    table = jnp.broadcast_to(table, (K, cfg.P, 4))
                    st0 = dadmm_core.init_state(
                        k, b.shape[0], cfg.P, cfg.n, dtype=b.dtype)
                    return unroll(st0, table, op, sensing.At_apply(A, b), adj)

                self._fn = jax.jit(_sharded_fn)
            else:
                # final-iterate-only unroll: no per-iteration Y snapshot write
                # (measured +26% serving throughput at the P=64 headline shape);
                # tree as jit argument => hot reload without recompile
                self._fn = jax.jit(lambda tree, k, b, adj: model.apply_final(
                    tree["params"], k, b, adj, training=False))
            gp = os.path.join(run_dir, "graph.npy")
            if os.path.exists(gp):  # imported/recovered topology (cli.import_torch)
                one = np.load(gp)
                self.default_adj = np.broadcast_to(
                    one, (max_batch, cfg.P, cfg.P)).copy()
            elif getattr(cfg, "graph_mode", "fixed") == "fresh":
                # run trained on fresh per-sample topologies — serve likewise
                self.default_adj = np.asarray(graphs.fast_sample_connected_er(
                    int(cfg.seed) + 7, max_batch, cfg.P, max(cfg.graph_prob, getattr(cfg, 'graph_prob_floor', 0.3))))
            else:                   # the run's fixed training graph, from its seed
                one = graphs.sample_er_adjacency(
                    np.random.default_rng(int(cfg.seed)), cfg.P, cfg.graph_prob)
                self.default_adj = np.broadcast_to(
                    one, (max_batch, cfg.P, cfg.P)).copy()
        self._key = jax.random.key(int(cfg.seed) + 777)
        self._jnp = jnp
        self._np = np
        self._jax = jax
        self._lock = threading.Lock()  # jit dispatch is thread-safe but keep FIFO
        self.warmup()

    def _classic_table(self, path):
        """Load + validate a classic hyp table [K, P, 4] (rho, alpha, tau, eta).

        Raises ValueError (NOT SystemExit): this runs both at startup (where
        _init_classic converts it to a clean exit) and from the `reload`
        command inside a handler thread, whose `except Exception` must catch
        it and answer the client — SystemExit would kill the handler silently."""
        import numpy as np

        table = np.load(path).astype(np.float32)
        if table.ndim != 3 or table.shape[1] not in (1, self.cfg.P):
            raise ValueError(f"{path}: expected a [K, P={self.cfg.P}, 4|6] classic "
                             f"hyp table, got {list(table.shape)}")
        if table.shape[-1] not in (4, 6):
            raise ValueError(f"{path}: last axis must be 4 (dlasso) or 6 (dlr) "
                             f"hyperparameters, got {table.shape[-1]}")
        want = getattr(self, "_classic_hyp_width", None)  # set after startup
        if want is not None and table.shape[-1] != want:
            raise ValueError(
                f"{path}: a {table.shape[-1]}-hyperparameter table cannot hot-"
                f"reload into a daemon serving the "
                f"{'dlr' if want == 6 else 'dlasso'} classic case")
        return table

    def _init_classic(self, run_dir: str, params_files, overrides: dict):
        """Classic color-sweep D-ADMM serving (reference `models.py:332-440`
        semantics; the reference's only inference surface for this family is the
        one-shot `dlasso.py --eval` script — here it serves requests).

        Request: {"b": [B x m_global]} (the global 500-dim observation; the
        solver row-partitions it across agents). Response y_hat = mean over
        agents of the final primal [B x n_global]. The topology/coloring is the
        run's cached color schedule (deterministic from the config seed, exactly
        like training — `train/classic_loop.py:load_or_create_graph`), so "adj"
        overrides are rejected: a classic table is meaningful only on the
        Gauss-Seidel sweep order it was trained with."""
        import re

        import jax
        import jax.numpy as jnp
        import numpy as np

        from ..models import classic
        from ..ops import classic_data
        from ..train import classic_loop

        cfg = self.cfg
        for k in ("dtype", "gram_mode"):
            if k in overrides:
                print(f"note: classic serving runs dense float32 color sweeps — "
                      f"--{k} is ignored for this family", file=sys.stderr)
        if cfg.mesh_data * cfg.mesh_agents > 1:
            raise SystemExit(
                "classic serving is single-device: the Gauss-Seidel color sweep "
                "is sequential over colors with a detached neighbor field "
                "(models/classic.py) and runs at reference shape P=5 — use the "
                "unfolded family for mesh-sharded serving")
        # Prefer the longest trained segment table (size=K in the filename).
        # Eval-curve artifacts share the params_ prefix (`params_*_iteration_*`,
        # written by `dadmm-dlasso --eval` into the same run dir) and are 1-D
        # loss arrays, not tables — exclude them before the no-suffix sentinel
        # (final full table) can match one.
        params_files = [p for p in params_files
                        if "_iteration_" not in os.path.basename(p)]
        if not params_files:
            raise SystemExit(f"{run_dir}: only eval-curve params_* files found "
                             "— no trained hyp table to serve")

        def _size(p):
            m = re.search(r"size=(\d+)", os.path.basename(p))
            return int(m.group(1)) if m else 10 ** 9  # no suffix = final full table
        self._params_path = max(params_files, key=_size)
        m_p = re.search(r"P=(\d+)", os.path.basename(self._params_path))
        if m_p and int(m_p.group(1)) != cfg.P:
            # args.json missing/stale: trust the artifact's own filename
            cfg = cfg.replace(P=int(m_p.group(1)))
        m_prob = re.search(r"prob=([0-9.]+)", os.path.basename(self._params_path))
        if m_prob:
            cfg = cfg.replace(graph_prob=float(m_prob.group(1)))
        self.cfg = cfg
        try:
            table = self._classic_table(self._params_path)
        except ValueError as e:   # startup: clean exit, not a traceback
            raise SystemExit(str(e))
        self._classic_hyp_width = int(table.shape[-1])
        sched = classic_loop.load_or_create_graph(cfg)
        self._run_dir = run_dir
        self.default_adj = None
        self.K = int(table.shape[0])
        self._table = jnp.asarray(table)
        self._key = jax.random.key(int(cfg.seed) + 777)
        self._jnp, self._np, self._jax = jnp, np, jax
        self._lock = threading.Lock()

        if self._classic_hyp_width == 6:
            # Classic dlr (reference `dlr.py` / `models.py:5-330`): serve the
            # regression FIT over the same {"x","y"} protocol as the unfolded
            # dlr daemon. The trained 6-hyperparameter table is data-
            # independent; the solver runs the color-sweep updates on the
            # run's cached schedule with a seeded deterministic state init.
            # Feature dim comes from args.json (cfg.lr_feature_dim, recorded at
            # training time) — NOT hard-coded 784 — so a table trained on any
            # feature width serves with the right solver shape; requests are
            # shape-checked against it in solve_dlr.
            d = int(cfg.lr_feature_dim)
            solver6 = classic.DADMMLRClassic(cfg.P, d)
            st0 = solver6.init_state(self.max_batch, seed=int(cfg.seed) + 777)
            self.case = "dlr"
            self._classic_dlr = True
            self.P, self.m, self.n = cfg.P, d, d

            def _fn6(t, x_pbd, y_pb1):
                out = solver6.run(t, x_pbd, y_pb1, sched, state=st0)
                return out["a"], out["omega"]

            self._fn = jax.jit(_fn6)
            x0 = jnp.zeros((cfg.P, self.max_batch, d), jnp.float32)
            y0 = jnp.zeros((cfg.P, self.max_batch, 1), jnp.float32)
            self._jax.block_until_ready(self._fn(self._table, x0, y0))
            return

        self.case = "classic"
        key = jax.random.key(int(cfg.seed))
        k_A, _, _ = jax.random.split(key, 3)   # same derivation as the trainer
        A_global = classic_data.global_sensing_matrix(k_A)
        solver = classic.DADMMLASSOClassic(A_global, cfg.P)
        self.P, self.m, self.n = cfg.P, A_global.shape[0], solver.n
        # table as a jit ARGUMENT -> hot reload without recompiling (a reload
        # with a different K recompiles once: the scan length is static)
        self._fn = jax.jit(
            lambda t, b: jnp.mean(solver.run(t, b, sched)[0], axis=0))
        b0 = jnp.zeros((self.max_batch, self.m), jnp.float32)
        self._jax.block_until_ready(self._fn(self._table, b0))

    def solve_classic(self, b_np, adj_np=None):
        """One classic solve: b [B, m_global] (or [m_global]) -> y_hat [B, n]."""
        np, jnp = self._np, self._jnp
        if adj_np is not None:
            raise ValueError(
                "classic serving uses the run's cached color schedule (the "
                "learned table is specific to its Gauss-Seidel sweep order); "
                "per-request adj overrides are not supported")
        if b_np.ndim == 1:
            b_np = b_np[None]
        B = b_np.shape[0]
        if b_np.shape[1:] != (self.m,):
            raise ValueError(f"b must be [B,{self.m}] (global observation), "
                             f"got {list(b_np.shape)}")
        out = []
        with self._lock:
            for lo in range(0, B, self.max_batch):
                c = b_np[lo:lo + self.max_batch]
                n_real = c.shape[0]
                pad = self.max_batch - n_real
                if pad:
                    c = np.concatenate([c, np.zeros((pad, self.m), c.dtype)])
                y = self._fn(self._table, jnp.asarray(c, jnp.float32))
                out.append(np.asarray(y)[:n_real])
        return np.concatenate(out), B

    def _restore(self, ckpt_name: str):
        """Restore the checkpoint tree (structure fixed by _tree_template)."""
        from ..utils import checkpoint as ckpt

        tree, _ = ckpt.restore_partial(
            os.path.join(self._run_dir, ckpt_name), self._tree_template)
        return tree

    def reload(self, ckpt_name: str) -> dict:
        """Hot-swap weights from disk without restarting or recompiling (the tree
        is a jit argument with unchanged shapes/dtypes). Serialized behind the
        solver lock so in-flight solves finish on the old weights."""
        t0 = time.perf_counter()
        if getattr(self, "_classic_hyp_width", None) is not None:
            # classic family (dlasso or dlr): re-read the table file ('best'/
            # 'last' = the serving table; any other name = a params_*.npy
            # relative to the run dir)
            path = (self._params_path if ckpt_name in ("best", "last")
                    else os.path.join(self._run_dir, ckpt_name))
            new_table = self._classic_table(path)
            with self._lock:
                self._table = self._jnp.asarray(new_table)
                self.K = int(new_table.shape[0])
            return {"ok": True, "reloaded": os.path.basename(path),
                    "latency_ms": round((time.perf_counter() - t0) * 1e3, 3)}
        new_tree = self._restore(ckpt_name)        # read/validate BEFORE locking
        with self._lock:
            self._tree = new_tree
        return {"ok": True, "reloaded": ckpt_name,
                "latency_ms": round((time.perf_counter() - t0) * 1e3, 3)}

    def _init_dlr(self, run_dir: str, ckpt_name: str):
        """dlr family: the "solve" is a distributed regression fit — request carries
        per-agent features x and targets y, the response the fitted (a, w) weights."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ..models import seq_hyperparam
        from ..models.unfolded_dlr import (DLRGNNHyp, DLRGNNHypOneShot,
                                           DLRGNNHypOneShotCorrected, UnfoldedDLR,
                                           init_state, unroll_table)
        from ..ops import graphs
        from ..utils import checkpoint as ckpt

        cfg = self.cfg
        self.P, self.m, self.n = cfg.P, cfg.n, cfg.n  # m := feature dim d for dlr
        self._run_dir = run_dir
        one = graphs.sample_er_adjacency(
            np.random.default_rng(int(cfg.seed)), cfg.P, cfg.graph_prob)
        self.default_adj = np.broadcast_to(
            one, (self.max_batch, cfg.P, cfg.P)).copy()
        n_mesh = cfg.mesh_data * cfg.mesh_agents
        if n_mesh > 1:
            _check_mesh_divisibility(cfg, self.max_batch, self.P)

        if cfg.hyp_mode == "GHyp":
            model = DLRGNNHyp(cfg.P, cfg.n, cfg)
            params, norm_state = model.init(jax.random.key(0))
            self._tree_template = {"params": params, "norm_state": norm_state}
            self._tree = self._restore(ckpt_name)

            if n_mesh > 1 and cfg.mesh_agents > 1:
                raise SystemExit(
                    "--mesh_agents > 1 is unavailable for the dlr GHyp tier: its "
                    "per-iteration hypernetwork uses the flattened global head "
                    "(DESIGN.md section 4) — use --mesh_data N --mesh_agents 1")

            def fn(tree, key, x, y, adj):
                _, _, st = model.apply_losses(
                    tree["params"], tree["norm_state"], key, x, y, adj,
                    training=False, return_state=True)
                return st.a, st.w

            if n_mesh > 1:
                # data-parallel GSPMD: eval-mode forward is per-sample
                from jax.sharding import NamedSharding, PartitionSpec
                from ..parallel import mesh as mesh_lib

                mesh = mesh_lib.make_mesh(cfg.mesh_data, 1)
                dp = NamedSharding(mesh, PartitionSpec(mesh_lib.DATA_AXIS))
                repl = NamedSharding(mesh, PartitionSpec())
                self._fn = jax.jit(fn, in_shardings=(repl, repl, dp, dp, dp))
            else:
                self._fn = jax.jit(fn)
        elif n_mesh > 1 and cfg.hyp_mode in ("GHyp1", "GHyp1c"):
            # Sharded one-shot tiers: replicated table eval + shard_map'd unroll
            # with collective neighbor sums (parallel/unfolded_sharded.py).
            from ..parallel import mesh as mesh_lib, unfolded_sharded

            model_cls = {"GHyp1": DLRGNNHypOneShot,
                         "GHyp1c": DLRGNNHypOneShotCorrected}[cfg.hyp_mode]
            model = model_cls(cfg.P, cfg.n, cfg)
            self._tree_template = {"params": model.init()}
            self._tree = self._restore(ckpt_name)
            mesh = mesh_lib.make_mesh(cfg.mesh_data, cfg.mesh_agents)
            run = unfolded_sharded.make_sharded_dlr_ghyp_unroll(
                mesh, model, remat=False)  # serving: no backward to rematerialize

            def _sharded_ghyp_fn(tree, key, x, y, adj):
                # training=True matches the dense serving path below (the tiers'
                # anti-saturation rescale is part of the validated model)
                st, _ = run(tree["params"], key, x, y, adj, training=True)
                return st.a, st.w

            self._fn = jax.jit(_sharded_ghyp_fn)
        else:
            model_cls = {"GHyp1": DLRGNNHypOneShot,
                         "GHyp1c": DLRGNNHypOneShotCorrected}.get(cfg.hyp_mode,
                                                                  UnfoldedDLR)
            model = model_cls(cfg.P, cfg.n, cfg)
            params = model.init()
            self._tree_template = {"params": params}
            self._tree = self._restore(ckpt_name)

            # training=True matches cli.evaluate and the training loop's eval_step
            # (the table tiers' anti-saturation rescale is part of the validated
            # model), so served fits reproduce the reported metrics exactly.
            def fn(tree, key, x, y, adj):
                step_fn = None
                if cfg.hyp_mode in ("GHyp1", "GHyp1c"):
                    table = model.table(tree["params"], x, y, adj, training=True)
                    step_fn = model.make_step_fn(tree["params"])  # None for GHyp1
                else:
                    table = seq_hyperparam.hyp_table(
                        tree["params"]["seq_hyp"], model.max_param, training=True,
                        max_penalty_threshold=cfg.max_penalty_threshold,
                        penalty_reduction_factor=cfg.penalty_reduction_factor)
                st0 = init_state(key, x.shape[0], cfg.P, cfg.n, dtype=x.dtype)
                st, _ = unroll_table(st0, table, x, y, adj, remat=cfg.remat,
                                     step_hyp_fn=step_fn)
                return st.a, st.w

            if n_mesh > 1:
                # Sharded table tier: collective neighbor sums over (data, agents).
                from ..parallel import mesh as mesh_lib, unfolded_sharded

                mesh = mesh_lib.make_mesh(cfg.mesh_data, cfg.mesh_agents)
                sharded_unroll = unfolded_sharded.make_sharded_dlr_unroll(
                    mesh, remat=False)
                K = int(cfg.GHN_iter_num)

                def _sharded_table_fn(tree, key, x, y, adj):
                    table = seq_hyperparam.hyp_table(
                        tree["params"]["seq_hyp"], model.max_param, training=True,
                        max_penalty_threshold=cfg.max_penalty_threshold,
                        penalty_reduction_factor=cfg.penalty_reduction_factor)
                    table = jnp.broadcast_to(table, (K, cfg.P, 6))
                    st0 = init_state(key, x.shape[0], cfg.P, cfg.n, dtype=x.dtype)
                    st, _ = sharded_unroll(st0, table, x, y, adj)
                    return st.a, st.w

                self._fn = jax.jit(_sharded_table_fn)
            else:
                self._fn = jax.jit(fn)
        self._key = jax.random.key(int(cfg.seed) + 777)
        self._jnp, self._np, self._jax = jnp, np, jax
        self._lock = threading.Lock()
        self.warmup()

    def warmup(self):
        np, jnp = self._np, self._jnp
        if self.case == "dlr":
            x = jnp.zeros((self.max_batch, self.P, self.m), jnp.float32)
            y = jnp.zeros((self.max_batch, self.P, 1), jnp.float32)
            out = self._fn(self._tree, self._key, x, y,
                           jnp.asarray(self.default_adj, jnp.float32))
            self._jax.block_until_ready(out)
            self.K = int(self.cfg.GHN_iter_num)
            return
        b = jnp.zeros((self.max_batch, self.P, self.m), jnp.float32)
        adj_arg = (self._adj_placeholder if self._mesh_agent_sharded
                   else jnp.asarray(self.default_adj, jnp.float32))
        y_fin = self._fn(self._tree, self._key, b, adj_arg)
        self._jax.block_until_ready(y_fin)
        self.K = int(self.cfg.GHN_iter_num)  # _fn now returns the final iterate only

    def _validated_adj(self, adj_np, B):
        """Broadcast a shared [P,P] topology to [B,P,P]; reject anything else."""
        np = self._np
        if adj_np is None:
            return None
        if adj_np.shape == (self.P, self.P):  # one topology for the whole request
            return np.broadcast_to(adj_np, (B, self.P, self.P))
        if adj_np.shape != (B, self.P, self.P):
            raise ValueError(f"adj must be [{self.P},{self.P}] or "
                             f"[B,{self.P},{self.P}], got {list(adj_np.shape)}")
        return adj_np

    def _iter_chunks(self, B, arrays, adj_np):
        """Yield (per-chunk arrays padded to the compiled batch, adj chunk, n_real).

        Requests are padded/chunked to the ONE compiled batch shape — the TPU
        serving discipline that keeps the server at a single compiled program.
        Per-sample topologies chunk alongside the payload (padding repeats the
        last row; padded samples are sliced off the answer)."""
        np = self._np
        for lo in range(0, B, self.max_batch):
            chunks, n_real = [], None
            for arr in arrays:
                c = arr[lo:lo + self.max_batch]
                n_real = c.shape[0]
                pad = self.max_batch - n_real
                if pad:
                    c = np.concatenate(
                        [c, np.zeros((pad,) + c.shape[1:], c.dtype)])
                chunks.append(c)
            adj = self.default_adj
            if adj_np is not None:
                a_chunk = adj_np[lo:lo + self.max_batch]
                pad = self.max_batch - a_chunk.shape[0]
                if pad:
                    a_chunk = np.concatenate(
                        [a_chunk, np.repeat(a_chunk[-1:], pad, axis=0)])
                adj = a_chunk
            yield chunks, adj, n_real

    def _solve_classic_dlr(self, x_np, y_np, adj_np=None):
        """Classic color-sweep dlr fit: x [B,P,d], y [B,P] -> (a [B,P,d],
        w [B,P]); the solver's native layout is agent-major [P,B,...]."""
        np, jnp = self._np, self._jnp
        if adj_np is not None:
            raise ValueError(
                "classic serving uses the run's cached color schedule (the "
                "learned table is specific to its Gauss-Seidel sweep order); "
                "per-request adj overrides are not supported")
        if x_np.ndim == 2:
            x_np = x_np[None]
        if y_np.ndim == 1:
            y_np = y_np[None]
        if y_np.ndim == 2:
            y_np = y_np[..., None]
        B = x_np.shape[0]
        if x_np.shape[1:] != (self.P, self.m) or y_np.shape != (B, self.P, 1):
            raise ValueError(
                f"x must be [B,{self.P},{self.m}] and y [B,{self.P}], got "
                f"{list(x_np.shape)} / {list(y_np.shape)}")
        a_out, w_out = [], []
        with self._lock:
            for (xc, yc), _adj, n_real in self._iter_chunks(B, (x_np, y_np), None):
                a, w = self._fn(self._table,
                                jnp.asarray(np.moveaxis(xc, 0, 1), jnp.float32),
                                jnp.asarray(np.moveaxis(yc, 0, 1), jnp.float32))
                a_out.append(np.moveaxis(np.asarray(a), 0, 1)[:n_real])
                w_out.append(np.moveaxis(np.asarray(w), 0, 1)[:n_real, :, 0])
        return np.concatenate(a_out), np.concatenate(w_out), B

    def solve_dlr(self, x_np, y_np, adj_np=None):
        """Fit the distributed regression: returns (a [B,P,d], w [B,P]) fitted per
        agent, chunked/padded to the compiled batch like `solve`."""
        if getattr(self, "_classic_dlr", False):
            return self._solve_classic_dlr(x_np, y_np, adj_np)
        np, jnp = self._np, self._jnp
        if x_np.ndim == 2:
            x_np = x_np[None]
        if y_np.ndim == 1:
            y_np = y_np[None]
        if y_np.ndim == 2:
            y_np = y_np[..., None]
        B = x_np.shape[0]
        if x_np.shape[1:] != (self.P, self.m) or y_np.shape != (B, self.P, 1):
            raise ValueError(
                f"x must be [B,{self.P},{self.m}] and y [B,{self.P}], got "
                f"{list(x_np.shape)} / {list(y_np.shape)}")
        adj_np = self._validated_adj(adj_np, B)
        a_out, w_out = [], []
        with self._lock:
            for (xc, yc), adj, n_real in self._iter_chunks(B, (x_np, y_np), adj_np):
                a, w = self._fn(self._tree, self._key,
                                jnp.asarray(xc, jnp.float32),
                                jnp.asarray(yc, jnp.float32),
                                jnp.asarray(adj, jnp.float32))
                a_out.append(np.asarray(a)[:n_real])
                w_out.append(np.asarray(w)[:n_real, :, 0])
        return np.concatenate(a_out), np.concatenate(w_out), B

    @contextlib.contextmanager
    def admission(self):
        """Bounded-pending admission gate (`--max_pending`). Every handler
        solve — direct, coalesced, any family — runs inside this context:
        `_pending` counts admitted requests from acceptance to completion
        (waiting on the solver lock / coalescing queue included), and request
        `max_pending + 1` is shed IMMEDIATELY with OverloadedError instead of
        joining an unbounded queue. None (default) = admit everything."""
        if self.max_pending is not None:
            with self._pending_lock:
                if self._pending >= self.max_pending:
                    raise OverloadedError(
                        f"overloaded: {self._pending} solve requests pending "
                        f">= max_pending={self.max_pending}; retry later")
                self._pending += 1
        try:
            yield
        finally:
            if self.max_pending is not None:
                with self._pending_lock:
                    self._pending -= 1

    def solve(self, b_np, adj_np=None):
        np, jnp = self._np, self._jnp
        if b_np.ndim == 2:
            b_np = b_np[None]
        B = b_np.shape[0]
        if b_np.shape[1:] != (self.P, self.m):
            raise ValueError(f"b must be [B,{self.P},{self.m}], got {list(b_np.shape)}")
        if adj_np is not None and self._mesh_agent_sharded:
            raise ValueError(
                "agent-sharded serving packs the topology once at startup; "
                "per-request adj overrides need --mesh_agents 1")
        adj_np = self._validated_adj(adj_np, B)
        out = []
        with self._lock:
            for (chunk,), adj, n_real in self._iter_chunks(B, (b_np,), adj_np):
                adj_arg = (self._adj_placeholder if self._mesh_agent_sharded
                           else jnp.asarray(adj, jnp.float32))
                y_fin = self._fn(self._tree, self._key,
                                 jnp.asarray(chunk, jnp.float32), adj_arg)
                y_hat = np.asarray(jnp.mean(y_fin, axis=1))  # consensus over agents
                out.append(y_hat[:n_real])
        return np.concatenate(out), B


def _make_handler(solver: _Solver, server_ref: dict,
                  max_request_bytes: int = 64 * 1024 * 1024):
    import numpy as np

    class Handler(socketserver.StreamRequestHandler):
        def _handle_binary(self) -> bool:
            """One DBF1 solve frame (module docstring). Returns False to close the
            connection (protocol desync: framing errors can't be resynced), True to
            keep serving. Payload bytes go straight through np.frombuffer — no JSON
            string alloc on the hot path (the measured serving tail, PARITY.md)."""
            hdr = _read_exact(self.rfile, 16)
            if len(hdr) < 16:
                return False
            magic, B, P, m = struct.unpack("<4sIII", hdr)
            nbytes = B * P * m * 4
            if magic != BIN_MAGIC or nbytes > max_request_bytes or nbytes == 0:
                solver.stats.record(0.0, 0, ok=False)  # count like payload errors
                msg = (f"bad frame: magic={magic!r} payload={nbytes}B "
                       f"(cap {max_request_bytes})").encode()
                self.wfile.write(struct.pack("<4sI", BIN_ERR_MAGIC, len(msg)) + msg)
                self.wfile.flush()
                return False
            payload = _read_exact(self.rfile, nbytes)
            if len(payload) < nbytes:
                return False
            t0 = time.perf_counter()
            try:
                with solver.admission():
                    if solver.case == "dlr":
                        raise ValueError(
                            "binary frames serve the dlasso/GNN families; dlr uses JSON")
                    if solver.case == "classic":
                        # classic observations are global [B, m]: frames carry P=1
                        if P != 1:
                            raise ValueError(
                                f"classic frames need P=1 (global b), got P={P}")
                        b = np.frombuffer(payload, "<f4").reshape(B, m)
                        if solver.coalescer is not None:
                            y_hat, B_out = solver.coalescer.solve_classic(b)
                        else:
                            y_hat, B_out = solver.solve_classic(b)
                    elif solver.coalescer is not None:
                        b = np.frombuffer(payload, "<f4").reshape(B, P, m)
                        y_hat, B_out = solver.coalescer.solve(b)
                    else:
                        b = np.frombuffer(payload, "<f4").reshape(B, P, m)
                        y_hat, B_out = solver.solve(b)
                # Solve latency is measured HERE — around the solver call only
                # (incl. any coalescing-window wait), excluding response
                # serialization and socket I/O — the same definition as the
                # JSON path, so the stats endpoint's p50/p99 aggregate one
                # consistent quantity across both protocols.
                lat_ms = (time.perf_counter() - t0) * 1e3
                arr = np.ascontiguousarray(y_hat, dtype="<f4")
                self.wfile.write(struct.pack("<4sII", BIN_MAGIC, B_out,
                                             arr.shape[1]) + arr.tobytes())
                # record only after the response is written: a write failure
                # lands in the except and must not double-count the request
                solver.stats.record(lat_ms, B_out)
            except Exception as e:  # noqa: BLE001 - bad frame payload must not kill serving
                if isinstance(e, OverloadedError):
                    solver.stats.record_shed()
                else:
                    solver.stats.record(0.0, 0, ok=False)
                msg = f"{type(e).__name__}: {e}".encode()
                self.wfile.write(struct.pack("<4sI", BIN_ERR_MAGIC, len(msg)) + msg)
            self.wfile.flush()
            return True

        def handle(self):
            while True:
                # Per-request dispatch on the first byte: JSON lines start with
                # "{" (or whitespace), binary frames with the DBF1 magic.
                head = self.rfile.peek(1)[:1]
                if not head:
                    return
                if head == BIN_MAGIC[:1]:
                    if not self._handle_binary():
                        return
                    continue
                # Size-guarded line read: an unbounded `for raw in rfile` would
                # buffer an arbitrarily large (malicious or buggy) line in memory
                # before the JSON parse ever sees it. readline(limit) caps the
                # buffer; a line that hits the cap without its newline cannot be
                # resynced on a line protocol, so the connection is refused closed.
                raw = self.rfile.readline(max_request_bytes)
                if not raw:
                    return
                if len(raw) >= max_request_bytes and not raw.endswith(b"\n"):
                    self.wfile.write(json.dumps({
                        "error": f"request exceeds max_request_bytes="
                                 f"{max_request_bytes}"}).encode() + b"\n")
                    self.wfile.flush()
                    return
                raw = raw.strip()
                if not raw:
                    continue
                t0 = time.perf_counter()
                req = None
                try:
                    req = json.loads(raw)
                    if req.get("cmd") == "ping":
                        resp = {"ok": True, "P": solver.P, "m": solver.m,
                                "n": solver.n, "K": solver.K,
                                "max_batch": solver.max_batch}
                    elif req.get("cmd") == "stats":
                        resp = {"ok": True, **solver.stats.snapshot()}
                    elif req.get("cmd") == "reload":
                        resp = solver.reload(req.get("ckpt", "best"))
                    elif req.get("cmd") == "shutdown":
                        self.wfile.write(b'{"ok": true, "shutdown": true}\n')
                        self.wfile.flush()
                        threading.Thread(
                            target=server_ref["server"].shutdown, daemon=True).start()
                        return
                    elif solver.case == "dlr":
                        x = np.asarray(req["x"], np.float32)
                        y = np.asarray(req["y"], np.float32)
                        adj = (np.asarray(req["adj"], np.float32)
                               if "adj" in req else None)
                        with solver.admission():
                            if solver.coalescer is not None and adj is None:
                                a, w, B = solver.coalescer.solve_dlr(x, y)
                            else:
                                a, w, B = solver.solve_dlr(x, y, adj)
                        resp = {"a": a.tolist(), "w": w.tolist(), "batch": B,
                                "K": solver.K,
                                "latency_ms": round(
                                    (time.perf_counter() - t0) * 1e3, 3)}
                    elif solver.case == "classic":
                        b = np.asarray(req["b"], np.float32)
                        adj = (np.asarray(req["adj"], np.float32)
                               if "adj" in req else None)
                        with solver.admission():
                            if solver.coalescer is not None and adj is None:
                                y_hat, B = solver.coalescer.solve_classic(b)
                            else:
                                y_hat, B = solver.solve_classic(b, adj)
                        resp = {"y_hat": y_hat.tolist(), "batch": B,
                                "K": solver.K,
                                "latency_ms": round(
                                    (time.perf_counter() - t0) * 1e3, 3)}
                    else:
                        b = np.asarray(req["b"], np.float32)
                        adj = (np.asarray(req["adj"], np.float32)
                               if "adj" in req else None)
                        with solver.admission():
                            if solver.coalescer is not None and adj is None:
                                if b.ndim == 2:
                                    b = b[None]
                                y_hat, B = solver.coalescer.solve(b)
                            else:
                                y_hat, B = solver.solve(b, adj)
                        resp = {"y_hat": y_hat.tolist(), "batch": B, "K": solver.K,
                                "latency_ms": round(
                                    (time.perf_counter() - t0) * 1e3, 3)}
                    if "batch" in resp:        # a solve (any family) succeeded
                        solver.stats.record(resp.get("latency_ms", 0.0),
                                            resp["batch"])
                except Exception as e:  # noqa: BLE001 - a bad request must not kill serving
                    # stats cover SOLVE traffic + protocol failures; a failed
                    # cmd request (bad reload name etc.) is answered but not
                    # counted — else an idle daemon's dashboard reads 100%
                    # error rate from operator typos
                    if isinstance(e, OverloadedError):
                        solver.stats.record_shed()
                    elif not (isinstance(req, dict) and "cmd" in req):
                        solver.stats.record(0.0, 0, ok=False)
                    resp = {"error": f"{type(e).__name__}: {e}"}
                self.wfile.write(json.dumps(resp).encode() + b"\n")
                self.wfile.flush()

    return Handler


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("usage: serve <run_dir> [--port 8763] [--host 127.0.0.1] "
              "[--max_batch 32] [--ckpt best] [--device tpu] [--dtype bfloat16] "
              "[--gram_mode factored] [--mesh_data D] [--mesh_agents A] "
              "[--compile_cache DIR] [--max_request_mb 64] [--coalesce_ms T] "
              "[--max_pending N]")
        return
    run_dir = argv[0]
    opts = dict(zip(argv[1::2], argv[2::2]))

    from ..utils.platform import enable_compile_cache, select_device

    # Provision devices from the EFFECTIVE mesh (run's recorded args.json values,
    # overridden by CLI flags) — _Solver reads the same merged config, so a run
    # TRAINED with a mesh serves sharded by default and must find its devices.
    from ..config import Config as _Config

    try:
        with open(os.path.join(run_dir, "args.json")) as f:
            _run_cfg = _Config.from_json(f.read())
        _md, _ma = _run_cfg.mesh_data, _run_cfg.mesh_agents
    except (OSError, ValueError, KeyError, TypeError, json.JSONDecodeError):
        # A missing/corrupt/partial args.json must not kill the daemon at the
        # provisioning step with a raw traceback — fall back to a 1x1 mesh here;
        # _Solver re-reads the file and raises the clearer error if it is truly
        # unusable (vs merely lacking mesh fields).
        _md = _ma = 1

    def _int_flag(name, default):
        val = opts.get(name, default)
        try:
            iv = int(val)
        except (TypeError, ValueError):
            raise SystemExit(f"{name} must be an integer, got {val!r}")
        if iv < 1:
            raise SystemExit(f"{name} must be >= 1, got {iv}")
        return iv

    n_mesh = _int_flag("--mesh_data", _md) * _int_flag("--mesh_agents", _ma)
    select_device(opts.get("--device", "tpu"),
                  host_device_count=n_mesh if n_mesh > 1 else None)
    if "--compile_cache" in opts:
        # Persistent XLA compilation cache: restarting the daemon reuses the compiled
        # executable instead of paying the 20-40s (sometimes minutes, through the
        # tunnel) first-compile, the production cold-start discipline.
        enable_compile_cache(opts["--compile_cache"])
    overrides = {}
    if "--dtype" in opts:
        overrides["dtype"] = opts["--dtype"]
    if "--gram_mode" in opts:
        overrides["gram_mode"] = opts["--gram_mode"]
    if "--mesh_data" in opts:
        overrides["mesh_data"] = _int_flag("--mesh_data", 1)
    if "--mesh_agents" in opts:
        overrides["mesh_agents"] = _int_flag("--mesh_agents", 1)
    solver = _Solver(run_dir, opts.get("--ckpt", "best"),
                     _int_flag("--max_batch", 32), overrides)
    try:
        coalesce_ms = float(opts.get("--coalesce_ms", "0"))
    except (TypeError, ValueError):
        raise SystemExit(f"--coalesce_ms must be a number of milliseconds, "
                         f"got {opts.get('--coalesce_ms')!r}")
    if coalesce_ms < 0:
        raise SystemExit(f"--coalesce_ms must be >= 0, got {coalesce_ms}")
    if coalesce_ms > 0:
        kind = solver.case if solver.case in ("dlr", "classic") else "dlasso"
        solver.coalescer = _Coalescer(solver, coalesce_ms, kind)
    try:
        max_pending = int(opts.get("--max_pending", "0"))
    except (TypeError, ValueError):
        raise SystemExit(f"--max_pending must be an integer, "
                         f"got {opts.get('--max_pending')!r}")
    if max_pending < 0:
        raise SystemExit(f"--max_pending must be >= 0, got {max_pending}")
    if max_pending > 0:
        solver.max_pending = max_pending

    server_ref: dict = {}
    socketserver.ThreadingTCPServer.allow_reuse_address = True
    # Handler threads block reading their sockets; without daemon_threads the
    # server_close() join would hang shutdown while any client stays connected.
    socketserver.ThreadingTCPServer.daemon_threads = True
    server = socketserver.ThreadingTCPServer(
        (opts.get("--host", "127.0.0.1"), int(opts.get("--port", 8763))),
        _make_handler(solver, server_ref,
                      max_request_bytes=int(
                          float(opts.get("--max_request_mb", "64")) * 1024 * 1024)))
    server_ref["server"] = server
    host, port = server.server_address
    # Machine-readable readiness line (stdout): clients/tests parse the bound port.
    print(json.dumps({"serving": run_dir, "host": host, "port": port,
                      "P": solver.P, "m": solver.m, "n": solver.n, "K": solver.K,
                      "max_batch": solver.max_batch}), flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    print("server stopped", file=sys.stderr)


if __name__ == "__main__":
    main()
