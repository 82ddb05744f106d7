"""End-to-end test of the batch-inference server (`cli/serve.py`).

Spawns the server as a real subprocess (CPU backend) on a trained/imported run,
then drives the JSON-lines TCP protocol: health check, single-sample solve, batch
solve with padding, topology override, malformed request, shutdown.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

RUN = os.path.join(os.path.dirname(__file__), os.pardir,
                   "results_parity", "imported_csv_folder1")
pytestmark = [pytest.mark.skipif(
    not os.path.exists(os.path.join(RUN, "best", "state.msgpack")),
    reason="imported golden run not present",
), pytest.mark.slow]


class Client:
    def __init__(self, host, port):
        self.sock = socket.create_connection((host, port), timeout=120)
        self.f = self.sock.makefile("rwb")

    def call(self, obj):
        self.f.write(json.dumps(obj).encode() + b"\n")
        self.f.flush()
        return json.loads(self.f.readline())


@pytest.fixture(scope="module")
def server():
    proc = subprocess.Popen(
        [sys.executable, "-m",
         "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve",
         RUN, "--device", "cpu", "--port", "0", "--max_batch", "4"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=os.path.join(os.path.dirname(__file__), os.pardir),
    )
    ready = json.loads(proc.stdout.readline())  # readiness line with the bound port
    yield ready, proc
    if proc.poll() is None:
        proc.kill()
    proc.wait(timeout=30)


def test_serve_protocol(server):
    ready, proc = server
    assert ready["P"] == 5 and ready["m"] == 100 and ready["n"] == 500
    cli = Client(ready["host"], ready["port"])

    pong = cli.call({"cmd": "ping"})
    assert pong["ok"] and pong["K"] == 25

    # real problem: b = A @ y for a sparse y; the served solution must be close
    A = np.load(os.path.join(RUN, "A.npy"))
    rng = np.random.default_rng(0)
    y = 2.0 * rng.standard_normal(500) * (rng.random(500) <= 0.25)
    b = np.einsum("pmn,n->pm", A, y)

    one = cli.call({"b": b.tolist()})  # single sample [P, m]
    assert one["batch"] == 1 and one["K"] == 25
    y_hat = np.asarray(one["y_hat"])[0]
    nmse = np.sum((y_hat - y) ** 2) / np.sum(y ** 2)
    assert nmse < 0.6  # imported reference table converges (PARITY: ~0.25 loss)

    # batch larger than max_batch exercises chunking + padding
    B = 6
    ys = 2.0 * rng.standard_normal((B, 500)) * (rng.random((B, 500)) <= 0.25)
    bs = np.einsum("pmn,bn->bpm", A, ys)
    resp = cli.call({"b": bs.tolist()})
    assert resp["batch"] == B and len(resp["y_hat"]) == B

    # topology override changes the consensus path but must still solve
    adj = np.zeros((5, 5)); adj[0, 1:] = adj[1:, 0] = 1  # star graph
    resp2 = cli.call({"b": b.tolist(), "adj": adj.tolist()})
    assert len(resp2["y_hat"]) == 1
    assert np.isfinite(np.asarray(resp2["y_hat"])).all()

    # per-sample topologies chunk alongside b across compiled-batch boundaries:
    # all-same-graph via the batched path must equal the shared-graph path exactly
    adj_b = np.broadcast_to(adj, (B, 5, 5))
    r_shared = cli.call({"b": bs.tolist(), "adj": adj.tolist()})
    r_batched = cli.call({"b": bs.tolist(), "adj": adj_b.tolist()})
    np.testing.assert_allclose(r_batched["y_hat"], r_shared["y_hat"], atol=1e-6)
    # wrong per-sample count is a protocol error, not silent reuse
    assert "error" in cli.call({"b": bs.tolist(),
                                "adj": adj_b[: B - 1].tolist()})

    # malformed request gets an error response, not a dead server
    bad = cli.call({"b": [[1.0, 2.0]]})
    assert "error" in bad
    assert cli.call({"cmd": "ping"})["ok"]

    # shutdown must complete even while another client holds an idle connection
    idle = Client(ready["host"], ready["port"])
    assert idle.call({"cmd": "ping"})["ok"]
    assert cli.call({"cmd": "shutdown"})["shutdown"]
    proc.wait(timeout=60)
    assert proc.returncode == 0


_PARITY = os.path.join(os.path.dirname(__file__), os.pardir, "results_parity")

GNN_RUN = os.path.join(_PARITY, "20260817_051436_progressive")


@pytest.mark.skipif(
    not os.path.exists(os.path.join(GNN_RUN, "best", "state.msgpack")),
    reason="trained flagship run not present",
)
def test_serve_gnn_family_dirname_fallback():
    """The flagship progressive run predates hyp_mode recording (args.json says
    'unfolded'); serve must dispatch it to the GNN family via the directory-name
    fallback like cli.evaluate, not crash restoring a table checkpoint."""
    proc = subprocess.Popen(
        [sys.executable, "-m",
         "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve",
         GNN_RUN, "--device", "cpu", "--port", "0", "--max_batch", "1"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=os.path.join(os.path.dirname(__file__), os.pardir),
    )
    try:
        ready = json.loads(proc.stdout.readline())
        assert (ready["P"], ready["m"], ready["n"]) == (5, 100, 500)
        cli = Client(ready["host"], ready["port"])
        A = np.load(os.path.join(GNN_RUN, "A.npy"))
        rng = np.random.default_rng(0)
        y = 2.0 * rng.standard_normal(500) * (rng.random(500) <= 0.25)
        b = np.einsum("pmn,n->pm", A, y)
        resp = cli.call({"b": b.tolist()})
        y_hat = np.asarray(resp["y_hat"])[0]
        nmse = np.sum((y_hat - y) ** 2) / np.sum(y ** 2)
        assert nmse < 0.6  # trained flagship solves (PARITY: ~0.21 loss)
        assert cli.call({"cmd": "shutdown"})["shutdown"]
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)
# one trained run per learned tier — each takes a distinct path in _Solver._init_dlr
DLR_RUNS = {
    "table": os.path.join(_PARITY, "unfolded_dlr", "20260818_060235_unfolded_dlr"),
    "GHyp": os.path.join(_PARITY, "dlr_ghyp_more_data", "20260819_042101_unfolded_dlr"),
    "GHyp1": os.path.join(_PARITY, "dlr_ghyp1", "20260818_225615_unfolded_dlr"),
    "GHyp1c": os.path.join(_PARITY, "dlr_ghyp1c", "20260819_212330_unfolded_dlr"),
}
# fit-MSE gate as a fraction of var(y): each tier must clearly beat predicting the
# mean; bounds track the recorded val losses (PARITY.md) with headroom
DLR_FIT_GATE = {"table": 0.35, "GHyp": 0.05, "GHyp1": 0.25, "GHyp1c": 0.1}


@pytest.mark.parametrize("tier", sorted(DLR_RUNS))
def test_serve_dlr_family(tier):
    """dlr runs serve the regression fit: {x, y} -> fitted per-agent (a, w)."""
    run = DLR_RUNS[tier]
    if not os.path.exists(os.path.join(run, "best", "state.msgpack")):
        pytest.skip("trained dlr run not present")
    proc = subprocess.Popen(
        [sys.executable, "-m",
         "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve",
         run, "--device", "cpu", "--port", "0", "--max_batch", "4"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=os.path.join(os.path.dirname(__file__), os.pardir),
    )
    try:
        ready = json.loads(proc.stdout.readline())
        P, d = ready["P"], ready["m"]
        assert (P, d) == (5, 50)
        cli = Client(ready["host"], ready["port"])
        assert cli.call({"cmd": "ping"})["ok"]

        # linear models y = x.a* + b* must be fit well by the trained run; sample
        # at the training distribution (ops/data.py:make_dlr_dataset): per-scenario
        # a* ~ N(0,1), intercept b* ~ N(0,1), x ~ N(0,1)/sqrt(d)
        rng = np.random.default_rng(0)
        B = 6  # > max_batch exercises chunking + padding
        a_true = rng.standard_normal((B, d))
        b_true = rng.standard_normal((B, 1))
        x = rng.standard_normal((B, P, d)) / np.sqrt(d)
        y = np.einsum("bpd,bd->bp", x, a_true) + b_true
        resp = cli.call({"x": x.tolist(), "y": y.tolist()})
        assert resp["batch"] == B and resp["K"] == ready["K"]
        a = np.asarray(resp["a"])
        w = np.asarray(resp["w"])
        assert a.shape == (B, P, d) and w.shape == (B, P)
        pred = np.einsum("bpd,bpd->bp", x, a) + w
        fit_mse = np.mean((pred - y) ** 2)
        assert fit_mse < DLR_FIT_GATE[tier] * np.var(y)

        # dlasso-style request against a dlr run is an error, not a crash
        assert "error" in cli.call({"b": x[0].tolist()})
        assert cli.call({"cmd": "ping"})["ok"]
        assert cli.call({"cmd": "shutdown"})["shutdown"]
        proc.wait(timeout=60)
        assert proc.returncode == 0
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)


def test_serve_persistent_compile_cache(tmp_path):
    """`--compile_cache DIR` must populate a persistent XLA compilation cache on first
    start and leave the daemon fully functional when restarted against the warm cache
    (the production cold-start path)."""
    cache = tmp_path / "xla_cache"

    def start():
        proc = subprocess.Popen(
            [sys.executable, "-m",
             "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve",
             RUN, "--device", "cpu", "--port", "0", "--max_batch", "2",
             "--compile_cache", str(cache)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            cwd=os.path.join(os.path.dirname(__file__), os.pardir),
        )
        ready = json.loads(proc.stdout.readline())
        return proc, ready

    for round_idx in range(2):  # cold start, then warm restart
        proc, ready = start()
        try:
            cli = Client(ready["host"], ready["port"])
            assert cli.call({"cmd": "ping"})["ok"]
            assert cli.call({"cmd": "shutdown"})["shutdown"]
            proc.wait(timeout=60)
        finally:
            if proc.poll() is None:
                proc.kill()
                proc.wait(timeout=30)
        entries = [f for f in os.listdir(cache) if not f.startswith(".")]
        assert entries, f"compilation cache empty after round {round_idx}"


def test_serve_concurrent_clients():
    """ThreadingTCPServer under concurrent load: N clients solving simultaneously must
    each get a correct, complete response (device execution is serialized inside the
    solver; the protocol layer must not interleave or drop replies). Own server
    subprocess — the module fixture's server is shut down by test_serve_protocol."""
    import threading

    proc = subprocess.Popen(
        [sys.executable, "-m",
         "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve",
         RUN, "--device", "cpu", "--port", "0", "--max_batch", "4"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=os.path.join(os.path.dirname(__file__), os.pardir),
    )
    ready = json.loads(proc.stdout.readline())
    A = np.load(os.path.join(RUN, "A.npy"))
    rng = np.random.default_rng(1)
    n_clients = 6
    ys = 2.0 * rng.standard_normal((n_clients, 500)) * (rng.random((n_clients, 500)) <= 0.25)
    results = [None] * n_clients

    def worker(i):
        cli = Client(ready["host"], ready["port"])
        b = np.einsum("pmn,n->pm", A, ys[i])
        for _ in range(3):  # several round trips per connection
            resp = cli.call({"b": b.tolist()})
            assert resp["batch"] == 1, resp
        results[i] = np.asarray(resp["y_hat"])[0]

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
        assert not t.is_alive(), "client thread hung"
    try:
        for i in range(n_clients):
            assert results[i] is not None
            nmse = np.sum((results[i] - ys[i]) ** 2) / np.sum(ys[i] ** 2)
            assert nmse < 0.6, f"client {i} got a wrong solution (nmse {nmse:.3f})"
        cli = Client(ready["host"], ready["port"])
        assert cli.call({"cmd": "shutdown"})["shutdown"]
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)


def test_serve_max_request_size_guard():
    """A request line exceeding --max_request_mb gets an error reply and a closed
    connection instead of an unbounded buffer; the server stays healthy."""
    proc = subprocess.Popen(
        [sys.executable, "-m",
         "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve",
         RUN, "--device", "cpu", "--port", "0", "--max_batch", "2",
         "--max_request_mb", "0.25"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=os.path.join(os.path.dirname(__file__), os.pardir),
    )
    try:
        ready = json.loads(proc.stdout.readline())
        cli = Client(ready["host"], ready["port"])
        # ~1.4 MB request against a 0.25 MB cap
        big = {"b": np.zeros((2, 5, 100)).tolist(), "pad": "x" * (1 << 20)}
        resp = cli.call(big)
        assert "error" in resp and "max_request_bytes" in resp["error"]
        # the offending connection is closed...
        assert cli.f.readline() == b""
        # ...but the server keeps serving new clients
        cli2 = Client(ready["host"], ready["port"])
        assert cli2.call({"cmd": "ping"})["ok"]
        assert cli2.call({"cmd": "shutdown"})["shutdown"]
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)


@pytest.mark.parametrize("tier,mesh_data,mesh_agents",
                         [("table", 1, 5), ("table", 2, 1),
                          ("GHyp1c", 1, 5), ("GHyp", 2, 1)])
def test_serve_dlr_mesh_sharded_matches_dense(tier, mesh_data, mesh_agents):
    """dlr mesh serving: the sharded fits (table tier via the collective-consensus
    unroll, one-shot tiers via the replicated-table + shard_map pipeline, GHyp
    data-parallel) must match the dense daemon's fitted (a, w)."""
    run = DLR_RUNS[tier]
    if not os.path.exists(os.path.join(run, "best", "state.msgpack")):
        pytest.skip("trained dlr run not present")

    def start(extra):
        proc = subprocess.Popen(
            [sys.executable, "-m",
             "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve",
             run, "--device", "cpu", "--port", "0", "--max_batch", "2"] + extra,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            cwd=os.path.join(os.path.dirname(__file__), os.pardir),
        )
        return proc, json.loads(proc.stdout.readline())

    dense_p, dense_r = start([])
    mesh_p, mesh_r = start(["--mesh_data", str(mesh_data),
                            "--mesh_agents", str(mesh_agents)])
    try:
        P, d = dense_r["P"], dense_r["m"]
        rng = np.random.default_rng(9)
        B = 3  # > max_batch: chunking through the sharded path
        a_true = rng.standard_normal((B, d))
        b_true = rng.standard_normal((B, 1))
        x = rng.standard_normal((B, P, d)) / np.sqrt(d)
        y = np.einsum("bpd,bd->bp", x, a_true) + b_true
        req = {"x": x.tolist(), "y": y.tolist()}
        dense_cli = Client(dense_r["host"], dense_r["port"])
        mesh_cli = Client(mesh_r["host"], mesh_r["port"])
        want = dense_cli.call(req)
        got = mesh_cli.call(req)
        assert "a" in got, got
        np.testing.assert_allclose(np.asarray(got["a"]), np.asarray(want["a"]),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(got["w"]), np.asarray(want["w"]),
                                   rtol=1e-3, atol=1e-3)
        for cli in (dense_cli, mesh_cli):
            assert cli.call({"cmd": "shutdown"})["shutdown"]
        dense_p.wait(timeout=60)
        mesh_p.wait(timeout=60)
    finally:
        for proc in (dense_p, mesh_p):
            if proc.poll() is None:
                proc.kill()
                proc.wait(timeout=30)


def test_serve_mesh_trained_run_without_flags(tmp_path):
    """A run TRAINED with mesh flags (args.json records mesh_data/mesh_agents > 1)
    must serve sharded by default with NO CLI mesh flags: main() provisions
    devices from the merged effective mesh, not just the CLI values (regression:
    the two n_mesh computations used to disagree and the daemon died at startup)."""
    import shutil

    run = tmp_path / "mesh_trained"
    shutil.copytree(RUN, run)
    cfg = json.load(open(run / "args.json"))
    cfg["mesh_data"], cfg["mesh_agents"] = 2, 1
    json.dump(cfg, open(run / "args.json", "w"))

    proc = subprocess.Popen(
        [sys.executable, "-m",
         "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve",
         str(run), "--device", "cpu", "--port", "0", "--max_batch", "2"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=os.path.join(os.path.dirname(__file__), os.pardir),
    )
    try:
        line = proc.stdout.readline()
        assert line, f"server died at startup (rc={proc.poll()})"
        ready = json.loads(line)
        cli = Client(ready["host"], ready["port"])
        assert cli.call({"cmd": "ping"})["ok"]
        A = np.load(os.path.join(RUN, "A.npy"))
        rng = np.random.default_rng(0)
        y = 2.0 * rng.standard_normal(500) * (rng.random(500) <= 0.25)
        b = np.einsum("pmn,n->pm", A, y)
        resp = cli.call({"b": b.tolist()})
        assert np.isfinite(np.asarray(resp["y_hat"])).all()
        assert cli.call({"cmd": "shutdown"})["shutdown"]
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)


NODEWISE_RUN = os.path.join(_PARITY, "nodewise_parity", "20260820_091309_progressive")


@pytest.mark.skipif(
    not os.path.exists(os.path.join(NODEWISE_RUN, "best", "state.msgpack")),
    reason="trained nodewise flagship run not present",
)
def test_serve_gnn_agent_sharded_matches_dense():
    """Agent-sharded flagship serving (--mesh_agents 5 on the trained nodewise
    GHyp run): packed-ring GCN + collective consensus inside the daemon must
    return the dense daemon's solutions; per-request adj overrides are rejected
    in this mode (topology is packed once at startup)."""
    def start(extra):
        proc = subprocess.Popen(
            [sys.executable, "-m",
             "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve",
             NODEWISE_RUN, "--device", "cpu", "--port", "0",
             "--max_batch", "2"] + extra,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            cwd=os.path.join(os.path.dirname(__file__), os.pardir),
        )
        return proc, json.loads(proc.stdout.readline())

    A = np.load(os.path.join(NODEWISE_RUN, "A.npy"))
    rng = np.random.default_rng(11)
    B = 2
    ys = 2.0 * rng.standard_normal((B, 500)) * (rng.random((B, 500)) <= 0.25)
    bs = np.einsum("pmn,bn->bpm", A, ys)
    dense_p, dense_r = start([])
    mesh_p, mesh_r = start(["--mesh_data", "1", "--mesh_agents", "5"])
    try:
        dense_cli = Client(dense_r["host"], dense_r["port"])
        mesh_cli = Client(mesh_r["host"], mesh_r["port"])
        want = np.asarray(dense_cli.call({"b": bs.tolist()})["y_hat"])
        got = np.asarray(mesh_cli.call({"b": bs.tolist()})["y_hat"])
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
        nm_w = np.sum((want - ys) ** 2) / np.sum(ys ** 2)
        nm_g = np.sum((got - ys) ** 2) / np.sum(ys ** 2)
        assert abs(nm_g - nm_w) < 1e-3 * max(nm_w, 1e-6), (nm_g, nm_w)
        # adj override is a clean protocol error in agent-sharded mode
        adj = np.zeros((5, 5)); adj[0, 1:] = adj[1:, 0] = 1
        resp = mesh_cli.call({"b": bs.tolist(), "adj": adj.tolist()})
        assert "error" in resp and "mesh_agents" in resp["error"]
        assert mesh_cli.call({"cmd": "ping"})["ok"]
        for cli in (dense_cli, mesh_cli):
            assert cli.call({"cmd": "shutdown"})["shutdown"]
        dense_p.wait(timeout=60)
        mesh_p.wait(timeout=60)
    finally:
        for proc in (dense_p, mesh_p):
            if proc.poll() is None:
                proc.kill()
                proc.wait(timeout=30)


@pytest.mark.parametrize("mesh_data,mesh_agents", [(1, 5), (2, 1)])
def test_serve_mesh_sharded_matches_dense(mesh_data, mesh_agents):
    """--mesh_data/--mesh_agents serving: the shard_map'd unroll (agent axis with
    collective consensus, or the data axis) returns the same solutions as the
    dense single-device server, and hot reload keeps working on the mesh."""
    def start(extra):
        proc = subprocess.Popen(
            [sys.executable, "-m",
             "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve",
             RUN, "--device", "cpu", "--port", "0", "--max_batch", "2"] + extra,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            cwd=os.path.join(os.path.dirname(__file__), os.pardir),
        )
        return proc, json.loads(proc.stdout.readline())

    A = np.load(os.path.join(RUN, "A.npy"))
    rng = np.random.default_rng(5)
    B = 3  # > max_batch: chunking + padding through the sharded path
    ys = 2.0 * rng.standard_normal((B, 500)) * (rng.random((B, 500)) <= 0.25)
    bs = np.einsum("pmn,bn->bpm", A, ys)

    dense_p, dense_r = start([])
    mesh_p, mesh_r = start(["--mesh_data", str(mesh_data),
                            "--mesh_agents", str(mesh_agents)])
    try:
        dense_cli = Client(dense_r["host"], dense_r["port"])
        mesh_cli = Client(mesh_r["host"], mesh_r["port"])
        want = np.asarray(dense_cli.call({"b": bs.tolist()})["y_hat"])
        got = np.asarray(mesh_cli.call({"b": bs.tolist()})["y_hat"])
        # atol 1e-3 not 1e-5: K=25 iterations through sign() amplify
        # cross-compilation rounding at near-zero coordinates (measured max
        # 3e-5); the solution-level NMSE check below is the real gate.
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)
        nm_want = np.sum((want - ys) ** 2) / np.sum(ys ** 2)
        nm_got = np.sum((got - ys) ** 2) / np.sum(ys ** 2)
        assert abs(nm_got - nm_want) < 1e-3 * max(nm_want, 1e-6), (nm_got, nm_want)
        r = mesh_cli.call({"cmd": "reload"})
        assert r["ok"]
        got2 = np.asarray(mesh_cli.call({"b": bs.tolist()})["y_hat"])
        np.testing.assert_allclose(got2, want, rtol=1e-4, atol=1e-3)
        for cli in (dense_cli, mesh_cli):
            assert cli.call({"cmd": "shutdown"})["shutdown"]
        dense_p.wait(timeout=60)
        mesh_p.wait(timeout=60)
    finally:
        for proc in (dense_p, mesh_p):
            if proc.poll() is None:
                proc.kill()
                proc.wait(timeout=30)


def test_serve_hot_reload():
    """{"cmd": "reload"} hot-swaps checkpoint weights without restart or
    recompile; solves before and after agree (same checkpoint re-read), and a
    bogus checkpoint name errors without killing the server."""
    proc = subprocess.Popen(
        [sys.executable, "-m",
         "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve",
         RUN, "--device", "cpu", "--port", "0", "--max_batch", "2"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=os.path.join(os.path.dirname(__file__), os.pardir),
    )
    try:
        ready = json.loads(proc.stdout.readline())
        cli = Client(ready["host"], ready["port"])
        A = np.load(os.path.join(RUN, "A.npy"))
        rng = np.random.default_rng(0)
        y = 2.0 * rng.standard_normal(500) * (rng.random(500) <= 0.25)
        b = np.einsum("pmn,n->pm", A, y)
        before = np.asarray(cli.call({"b": b.tolist()})["y_hat"])

        r = cli.call({"cmd": "reload"})
        assert r["ok"] and r["reloaded"] == "best"
        after = np.asarray(cli.call({"b": b.tolist()})["y_hat"])
        np.testing.assert_allclose(after, before, atol=1e-6)

        # the run dir also has a `last` checkpoint — reload to it and back
        if os.path.exists(os.path.join(RUN, "last", "state.msgpack")):
            assert cli.call({"cmd": "reload", "ckpt": "last"})["reloaded"] == "last"
            assert np.isfinite(np.asarray(cli.call({"b": b.tolist()})["y_hat"])).all()

        bad = cli.call({"cmd": "reload", "ckpt": "nope"})
        assert "error" in bad
        assert cli.call({"cmd": "ping"})["ok"]
        assert cli.call({"cmd": "shutdown"})["shutdown"]
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)


def test_serve_binary_protocol():
    """DBF1 binary frames: same answers as JSON, mixed freely on one connection,
    error frames for bad payloads without killing the connection (cli/serve.py
    module docstring — the path that removes the measured JSON/GIL ceiling)."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve import binary_solve

    proc = subprocess.Popen(
        [sys.executable, "-m",
         "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve",
         RUN, "--device", "cpu", "--port", "0", "--max_batch", "4",
         "--max_request_mb", "1"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=os.path.join(os.path.dirname(__file__), os.pardir),
    )
    ready = json.loads(proc.stdout.readline())
    try:
        cli = Client(ready["host"], ready["port"])
        A = np.load(os.path.join(RUN, "A.npy"))
        rng = np.random.default_rng(3)
        B = 6  # larger than max_batch: exercises chunking under binary framing
        ys = 2.0 * rng.standard_normal((B, 500)) * (rng.random((B, 500)) <= 0.25)
        bs = np.einsum("pmn,bn->bpm", A, ys).astype(np.float32)

        via_json = np.asarray(cli.call({"b": bs.tolist()})["y_hat"],
                              dtype=np.float32)
        via_bin = binary_solve(cli.f, cli.f, bs)
        assert via_bin.shape == (B, 500)
        # identical bytes in (JSON floats round-trip f32 exactly) => near-identical out
        np.testing.assert_allclose(via_bin, via_json, atol=1e-5)

        # single-sample [P, m] form
        one = binary_solve(cli.f, cli.f, bs[0])
        np.testing.assert_allclose(one[0], via_bin[0], atol=1e-6)

        # wrong agent/measurement dims -> DBE1 error frame, connection stays usable
        with pytest.raises(RuntimeError, match="b must be"):
            binary_solve(cli.f, cli.f, np.zeros((2, 3, 7), np.float32))
        assert cli.call({"cmd": "ping"})["ok"]  # JSON still works after binary error

        # oversized frame (beyond --max_request_mb) is refused and closes the
        # connection (framing can't resync after a refused header)
        big_B = (1 * 1024 * 1024) // (5 * 100 * 4) + 1
        import struct as _struct
        cli.f.write(_struct.pack("<4sIII", b"DBF1", big_B, 5, 100))
        cli.f.flush()
        assert cli.f.read(4) == b"DBE1"
        (ln,) = _struct.unpack("<I", cli.f.read(4))
        assert b"cap" in cli.f.read(ln)
        assert cli.f.read(1) == b""  # server closed the connection

        cli2 = Client(ready["host"], ready["port"])
        assert cli2.call({"cmd": "shutdown"})["shutdown"]
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)


def test_serve_coalescing_no_sample_mixing():
    """--coalesce_ms batches concurrent requests into one padded solve; the
    critical invariant is routing: every client gets ITS OWN samples' answers
    back. Each of 6 threads solves for a distinct sparse ground truth; each
    response must decode its own truth (and not any other thread's)."""
    import threading

    from hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve import binary_solve

    proc = subprocess.Popen(
        [sys.executable, "-m",
         "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve",
         RUN, "--device", "cpu", "--port", "0", "--max_batch", "8",
         "--coalesce_ms", "30"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=os.path.join(os.path.dirname(__file__), os.pardir),
    )
    try:
        ready = json.loads(proc.stdout.readline())
        A = np.load(os.path.join(RUN, "A.npy"))
        rng = np.random.default_rng(7)
        N = 6
        truths = [2.0 * rng.standard_normal(500) * (rng.random(500) <= 0.25)
                  for _ in range(N)]
        obs = [np.einsum("pmn,n->pm", A, t).astype(np.float32) for t in truths]

        barrier = threading.Barrier(N)
        results = [None] * N

        def client(i):
            cli = Client(ready["host"], ready["port"])
            barrier.wait()
            for _ in range(3):  # several rounds: coalesced compositions vary
                y = binary_solve(cli.f.raw if hasattr(cli.f, "raw") else cli.f,
                                 cli.f, obs[i][None])
            results[i] = np.asarray(y)[0]
            cli.sock.close()

        threads = [threading.Thread(target=client, args=(i,)) for i in range(N)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        for i in range(N):
            assert results[i] is not None, f"client {i} got no answer"
            own = np.sum((results[i] - truths[i]) ** 2) / np.sum(truths[i] ** 2)
            assert own < 0.6, f"client {i} NMSE vs own truth: {own:.3f}"
            for j in range(N):
                if j == i:
                    continue
                other = (np.sum((results[i] - truths[j]) ** 2)
                         / np.sum(truths[j] ** 2))
                assert other > own * 1.5, (
                    f"client {i}'s answer matches client {j}'s truth — "
                    "coalescer mixed samples")

        # JSON path coalesces too; adj-override requests bypass cleanly
        cli = Client(ready["host"], ready["port"])
        r = cli.call({"b": obs[0].tolist()})
        own = (np.sum((np.asarray(r["y_hat"])[0] - truths[0]) ** 2)
               / np.sum(truths[0] ** 2))
        assert own < 0.6
        adj = np.zeros((5, 5)); adj[0, 1:] = adj[1:, 0] = 1
        r2 = cli.call({"b": obs[0].tolist(), "adj": adj.tolist()})
        assert np.isfinite(np.asarray(r2["y_hat"])).all()
        assert cli.call({"cmd": "shutdown"})["ok"]
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)


def test_serve_coalescing_composes_with_mesh():
    """--coalesce_ms works on top of the mesh-sharded solve (the coalescer sits
    above solver.solve, which already runs the shard_map'd unroll)."""
    proc = subprocess.Popen(
        [sys.executable, "-m",
         "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve",
         RUN, "--device", "cpu", "--port", "0", "--max_batch", "8",
         "--mesh_data", "2", "--mesh_agents", "1", "--coalesce_ms", "20"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=os.path.join(os.path.dirname(__file__), os.pardir),
    )
    try:
        ready = json.loads(proc.stdout.readline())
        A = np.load(os.path.join(RUN, "A.npy"))
        rng = np.random.default_rng(3)
        y = 2.0 * rng.standard_normal(500) * (rng.random(500) <= 0.25)
        b = np.einsum("pmn,n->pm", A, y).astype(np.float32)
        cli = Client(ready["host"], ready["port"])
        r = cli.call({"b": b.tolist()})
        got = np.asarray(r["y_hat"])[0]
        nmse = np.sum((got - y) ** 2) / np.sum(y ** 2)
        assert nmse < 0.6
        assert cli.call({"cmd": "shutdown"})["ok"]
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)


def test_serve_stats_endpoint():
    """{"cmd": "stats"}: request/error/sample counters, rolling latency, and
    coalescing effectiveness are tracked across JSON and binary solves."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve import binary_solve

    proc = subprocess.Popen(
        [sys.executable, "-m",
         "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve",
         RUN, "--device", "cpu", "--port", "0", "--max_batch", "4",
         "--coalesce_ms", "5"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=os.path.join(os.path.dirname(__file__), os.pardir),
    )
    try:
        ready = json.loads(proc.stdout.readline())
        cli = Client(ready["host"], ready["port"])

        s0 = cli.call({"cmd": "stats"})
        assert s0["ok"] and s0["requests"] == 0 and s0["errors"] == 0

        b = np.zeros((5, 100), np.float32)
        assert "y_hat" in cli.call({"b": b.tolist()})          # JSON solve
        binary_solve(cli.f, cli.f, b[None])                     # binary solve
        assert "error" in cli.call({"b": [[1.0]]})              # malformed

        s1 = cli.call({"cmd": "stats"})
        assert s1["requests"] == 3 and s1["errors"] == 1
        assert s1["samples_solved"] == 2
        assert s1["latency_ms"]["window"] == 2
        assert s1["latency_ms"]["p50"] > 0
        assert s1["uptime_s"] >= 0
        # cmd requests are not counted as solves
        assert cli.call({"cmd": "stats"})["requests"] == 3
        assert cli.call({"cmd": "shutdown"})["ok"]
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)


def test_serve_dlr_coalescing_routing():
    """--coalesce_ms on a dlr run batches concurrent regression fits into one
    padded solve; the routing invariant is the same as dlasso's: every client
    gets the fit of ITS OWN (x, y) back. Each of 4 threads fits a distinct
    linear model; the returned (a, w) must predict its own y well and any
    other thread's y badly. Uses the GHyp tier: its fit quality (~0.01-0.09
    MSE fraction solo AND fused, vs >1.8 cross-client) gives the routing
    check an order-of-magnitude margin over coalescing init-noise drift."""
    import threading

    run = DLR_RUNS["GHyp"]
    if not os.path.exists(os.path.join(run, "best", "state.msgpack")):
        pytest.skip("trained dlr run not present")
    proc = subprocess.Popen(
        [sys.executable, "-m",
         "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve",
         run, "--device", "cpu", "--port", "0", "--max_batch", "8",
         "--coalesce_ms", "30"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=os.path.join(os.path.dirname(__file__), os.pardir),
    )
    try:
        ready = json.loads(proc.stdout.readline())
        P, d = ready["P"], ready["m"]
        rng = np.random.default_rng(5)
        N = 4
        a_true = rng.standard_normal((N, d))
        b_true = rng.standard_normal((N, 1))
        xs = rng.standard_normal((N, 2, P, d)).astype(np.float32) / np.sqrt(d)
        ys = (np.einsum("cbpd,cd->cbp", xs, a_true)
              + b_true[:, None]).astype(np.float32)

        barrier = threading.Barrier(N)
        results = [None] * N

        def client(i):
            cli = Client(ready["host"], ready["port"])
            barrier.wait()
            for _ in range(3):  # several rounds: coalesced compositions vary
                r = cli.call({"x": xs[i].tolist(), "y": ys[i].tolist()})
            results[i] = (np.asarray(r["a"]), np.asarray(r["w"]))
            cli.sock.close()

        threads = [threading.Thread(target=client, args=(i,)) for i in range(N)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        for i in range(N):
            assert results[i] is not None, f"client {i} got no answer"
            a, w = results[i]
            assert a.shape == (2, P, d) and w.shape == (2, P)
            pred = np.einsum("bpd,bpd->bp", xs[i], a) + w
            own = np.mean((pred - ys[i]) ** 2) / np.var(ys[i])
            assert own < 0.2, f"client {i} fit MSE frac vs own y: {own:.3f}"
            for j in range(N):
                if j == i:
                    continue
                pred_j = np.einsum("bpd,bpd->bp", xs[j], a) + w
                other = np.mean((pred_j - ys[j]) ** 2) / np.var(ys[j])
                assert other > max(own * 5, 0.3), (
                    f"client {i}'s fit predicts client {j}'s data "
                    f"({other:.3f} vs own {own:.3f}) — dlr coalescer "
                    "mixed samples")

        # adj-override dlr requests bypass the coalescer cleanly
        cli = Client(ready["host"], ready["port"])
        adj = np.zeros((P, P)); adj[0, 1:] = adj[1:, 0] = 1
        r2 = cli.call({"x": xs[0].tolist(), "y": ys[0].tolist(),
                       "adj": adj.tolist()})
        assert np.isfinite(np.asarray(r2["a"])).all()
        assert cli.call({"cmd": "shutdown"})["ok"]
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)


def test_serve_overload_shedding():
    """--max_pending 1: when concurrent offered load exceeds the solve queue
    bound, excess requests are refused IMMEDIATELY with an OverloadedError
    response (JSON error / binary DBE1) instead of queueing without limit;
    sheds land in the `shed` stats counter, not `errors`, and the daemon
    keeps serving afterwards."""
    import threading

    from hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve import binary_solve

    proc = subprocess.Popen(
        [sys.executable, "-m",
         "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve",
         RUN, "--device", "cpu", "--port", "0", "--max_batch", "8",
         "--max_pending", "1"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=os.path.join(os.path.dirname(__file__), os.pardir),
    )
    try:
        ready = json.loads(proc.stdout.readline())
        b = np.zeros((4, 5, 100), np.float32)

        N, ROUNDS = 6, 4
        barrier = threading.Barrier(N)
        ok_count = [0] * N
        shed_count = [0] * N
        bad = []

        def client(i):
            cli = Client(ready["host"], ready["port"])
            barrier.wait()
            for _ in range(ROUNDS):
                r = cli.call({"b": b.tolist()})
                if "y_hat" in r:
                    ok_count[i] += 1
                elif "OverloadedError" in r.get("error", ""):
                    shed_count[i] += 1
                else:
                    bad.append(r)
            cli.sock.close()

        threads = [threading.Thread(target=client, args=(i,)) for i in range(N)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not bad, f"unexpected responses: {bad[:3]}"
        n_ok, n_shed = sum(ok_count), sum(shed_count)
        assert n_ok >= 1, "no request was ever admitted"
        assert n_shed >= 1, "no request was ever shed at 6x concurrency"
        assert n_ok + n_shed == N * ROUNDS

        cli = Client(ready["host"], ready["port"])
        s = cli.call({"cmd": "stats"})
        assert s["shed"] == n_shed
        assert s["errors"] == 0              # sheds are not failures
        assert s["requests"] == N * ROUNDS   # but they ARE offered solves
        assert s["samples_solved"] == 4 * n_ok

        # binary path sheds with a DBE1 OverloadedError frame: race two
        # binary clients against the single admission slot — whenever their
        # tight solve loops overlap (near-certain within a few dozen rounds),
        # one of them is refused with the error frame.
        import time as _time

        shed_seen = threading.Event()

        def bin_racer():
            c = Client(ready["host"], ready["port"])
            t_end = _time.monotonic() + 30
            while not shed_seen.is_set() and _time.monotonic() < t_end:
                try:
                    binary_solve(c.f, c.f, b)
                except RuntimeError as e:
                    if "OverloadedError" in str(e):
                        shed_seen.set()
                        break
                    raise
            c.sock.close()

        racers = [threading.Thread(target=bin_racer) for _ in range(3)]
        for t in racers:
            t.start()
        for t in racers:
            t.join(timeout=120)
        assert shed_seen.is_set(), \
            "binary path never shed with 3 racing clients on 1 slot"

        # daemon is healthy after the storm
        assert cli.call({"cmd": "ping"})["ok"]
        assert "y_hat" in cli.call({"b": b.tolist()})
        assert cli.call({"cmd": "shutdown"})["ok"]
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)
