"""Serving the CLASSIC segment-table family (`cli/serve.py` classic path).

The reference's only inference surface for this family is the one-shot
`dlasso.py --eval` script (`dlasso.py:41-50`); here the trained color-sweep
table serves requests over the same daemon protocol as every other family.
Drives a real subprocess on the committed classic run artifact
(results_parity/classic_dlasso — params_*.npy tables, NO args.json: exercises
the filename-metadata fallback) and checks served answers match a direct
in-process `DADMMLASSOClassic.run` (assert_allclose 2e-4) on the same table + cached color schedule.
"""

import glob
import json
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), os.pardir)
RUN = os.path.join(REPO, "results_parity", "classic_dlasso",
                   "20260817_104123_dlasso_classic")
DLR_RUN = os.path.join(REPO, "results_parity", "classic_dlr",
                       "20260819_031928_dlr_classic")
pytestmark = [pytest.mark.skipif(
    not glob.glob(os.path.join(RUN, "params_*.npy")),
    reason="committed classic run not present",
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
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, cwd=REPO,
    )
    ready = json.loads(proc.stdout.readline())
    yield ready, proc
    if proc.poll() is None:
        proc.kill()
    proc.wait(timeout=30)


def _expected_table():
    files = glob.glob(os.path.join(RUN, "params_*.npy"))
    def size(p):
        m = re.search(r"size=(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else 10 ** 9
    path = max(files, key=size)
    return np.load(path).astype(np.float32)


def _direct_solver():
    """The same solver construction the daemon performs (default-config seed,
    cached color schedule), for matched (2e-4) reference answers."""
    import jax

    from hyperparameter_gnn_unfolded_d_admm_main_tpu.config import Config
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.models import classic
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import classic_data
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.train import classic_loop

    cfg = Config()
    key = jax.random.key(int(cfg.seed))
    k_A, _, _ = jax.random.split(key, 3)
    A_global = classic_data.global_sensing_matrix(k_A)
    cwd = os.getcwd()
    os.chdir(REPO)   # the graph cache lives under REPO/"graphs data"
    try:
        sched = classic_loop.load_or_create_graph(cfg)
    finally:
        os.chdir(cwd)
    return classic.DADMMLASSOClassic(A_global, cfg.P), sched, A_global


def test_classic_serve_protocol_and_parity(server):
    import jax.numpy as jnp

    ready, proc = server
    assert ready["P"] == 5 and ready["m"] == 500 and ready["n"] == 2000
    cli = Client(ready["host"], ready["port"])

    table = _expected_table()
    pong = cli.call({"cmd": "ping"})
    assert pong["ok"] and pong["K"] == table.shape[0]

    solver, sched, A_global = _direct_solver()
    rng = np.random.default_rng(0)
    B = 6  # > max_batch: exercises chunking/padding
    ys = 2.0 * rng.standard_normal((B, 2000)) * (rng.random((B, 2000)) <= 0.25)
    bs = np.einsum("mn,bn->bm", np.asarray(A_global), ys).astype(np.float32)

    resp = cli.call({"b": bs.tolist()})
    assert resp["batch"] == B
    got = np.asarray(resp["y_hat"], np.float32)
    assert got.shape == (B, 2000)

    X, _, _ = solver.run(jnp.asarray(table), jnp.asarray(bs), sched)
    want = np.asarray(X).mean(axis=0)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # single global observation [m]
    one = cli.call({"b": bs[0].tolist()})
    assert one["batch"] == 1
    np.testing.assert_allclose(np.asarray(one["y_hat"])[0], got[0],
                               rtol=2e-4, atol=2e-4)

    # adj overrides are rejected (the table is sweep-order-specific)
    err = cli.call({"b": bs[0].tolist(), "adj": np.eye(5).tolist()})
    assert "color schedule" in err.get("error", "")

    # binary frames: P=1 carries the global observation
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve import binary_solve

    via_bin = binary_solve(cli.f, cli.f, bs[:, None, :])
    np.testing.assert_allclose(via_bin, got, atol=1e-5)

    # hot reload of a shorter segment table changes K
    shorter = sorted(glob.glob(os.path.join(RUN, "params_*size=4.npy")))
    if shorter:
        r = cli.call({"cmd": "reload",
                      "ckpt": os.path.basename(shorter[0])})
        assert r["ok"]
        assert cli.call({"cmd": "ping"})["K"] == 4

    assert cli.call({"cmd": "shutdown"})["ok"]
    proc.wait(timeout=30)


@pytest.mark.skipif(not glob.glob(os.path.join(DLR_RUN, "params_*.npy")),
                    reason="committed classic dlr run not present")
def test_classic_dlr_serves_regression_fits():
    """6-hyperparameter (classic dlr) tables serve the regression fit over the
    dlr {"x","y"} protocol, matching a direct DADMMLRClassic.run (assert_allclose 2e-4) on the
    same table + cached schedule + seeded state init."""
    import jax
    import jax.numpy as jnp

    proc = subprocess.Popen(
        [sys.executable, "-m",
         "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve",
         DLR_RUN, "--device", "cpu", "--port", "0", "--max_batch", "2"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, cwd=REPO,
    )
    try:
        ready = json.loads(proc.stdout.readline())
        d = 28 * 28
        assert ready["P"] == 5 and ready["m"] == d
        cli = Client(ready["host"], ready["port"])

        files = glob.glob(os.path.join(DLR_RUN, "params_*.npy"))
        files = [f for f in files if "_iteration_" not in os.path.basename(f)]
        def size(p):
            m = re.search(r"size=(\d+)", os.path.basename(p))
            return int(m.group(1)) if m else 10 ** 9
        table = np.load(max(files, key=size)).astype(np.float32)
        assert cli.call({"cmd": "ping"})["K"] == table.shape[0]

        rng = np.random.default_rng(1)
        B = 3  # > max_batch: exercises chunk/pad through the agent-major path
        x = rng.standard_normal((B, 5, d)).astype(np.float32) * 0.05
        y = rng.standard_normal((B, 5)).astype(np.float32)
        resp = cli.call({"x": x.tolist(), "y": y.tolist()})
        assert resp["batch"] == B
        a_got = np.asarray(resp["a"], np.float32)
        w_got = np.asarray(resp["w"], np.float32)
        assert a_got.shape == (B, 5, d) and w_got.shape == (B, 5)
        assert np.isfinite(a_got).all() and np.isfinite(w_got).all()

        # direct reference answer: same table/schedule/seeded init, padded B=2
        # chunks exactly as the daemon runs them
        from hyperparameter_gnn_unfolded_d_admm_main_tpu.config import Config
        from hyperparameter_gnn_unfolded_d_admm_main_tpu.models import classic
        from hyperparameter_gnn_unfolded_d_admm_main_tpu.train import classic_loop

        with open(os.path.join(DLR_RUN, "args.json")) as f:
            cfg = Config.from_json(f.read())
        cwd = os.getcwd()
        os.chdir(REPO)
        try:
            sched = classic_loop.load_or_create_graph(cfg)
        finally:
            os.chdir(cwd)
        solver = classic.DADMMLRClassic(cfg.P, d)
        st0 = solver.init_state(2, seed=int(cfg.seed) + 777)
        a_ref = np.zeros((4, 5, d), np.float32)
        w_ref = np.zeros((4, 5), np.float32)
        xp = np.concatenate([x, np.zeros((1, 5, d), np.float32)])
        yp = np.concatenate([y, np.zeros((1, 5), np.float32)])
        for lo in (0, 2):
            out = solver.run(jnp.asarray(table),
                             jnp.asarray(np.moveaxis(xp[lo:lo + 2], 0, 1)),
                             jnp.asarray(np.moveaxis(yp[lo:lo + 2, :, None], 0, 1)),
                             sched, state=st0)
            a_ref[lo:lo + 2] = np.moveaxis(np.asarray(out["a"]), 0, 1)
            w_ref[lo:lo + 2] = np.moveaxis(np.asarray(out["omega"]), 0, 1)[..., 0]
        np.testing.assert_allclose(a_got, a_ref[:B], rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(w_got, w_ref[:B], rtol=2e-4, atol=2e-4)

        # adj overrides rejected, like classic dlasso
        err = cli.call({"x": x.tolist(), "y": y.tolist(),
                        "adj": np.eye(5).tolist()})
        assert "color schedule" in err.get("error", "")
        assert cli.call({"cmd": "shutdown"})["ok"]
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)


def test_classic_serve_coalescing_matches_direct():
    """--coalesce_ms on a classic run fuses concurrent global-observation
    solves into one color-sweep batch. The classic solver's state init is
    deterministic (zeros) and samples are independent along the batch axis,
    so every client's coalesced answer must match its direct per-sample
    solve exactly (2e-4, same as the protocol parity test)."""
    import threading

    import jax.numpy as jnp

    proc = subprocess.Popen(
        [sys.executable, "-m",
         "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve",
         RUN, "--device", "cpu", "--port", "0", "--max_batch", "8",
         "--coalesce_ms", "25"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, cwd=REPO,
    )
    try:
        ready = json.loads(proc.stdout.readline())
        table = _expected_table()
        solver, sched, A_global = _direct_solver()
        rng = np.random.default_rng(9)
        N = 3
        ys = 2.0 * rng.standard_normal((N, 2000)) * (rng.random((N, 2000)) <= 0.25)
        bs = np.einsum("mn,bn->bm", np.asarray(A_global), ys).astype(np.float32)

        X, _, _ = solver.run(jnp.asarray(table), jnp.asarray(bs), sched)
        want = np.asarray(X).mean(axis=0)

        barrier = threading.Barrier(N)
        results = [None] * N

        def client(i):
            cli = Client(ready["host"], ready["port"])
            barrier.wait()
            for _ in range(3):
                r = cli.call({"b": bs[i].tolist()})
            results[i] = np.asarray(r["y_hat"], np.float32)[0]
            cli.sock.close()

        threads = [threading.Thread(target=client, args=(i,)) for i in range(N)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        for i in range(N):
            assert results[i] is not None, f"client {i} got no answer"
            np.testing.assert_allclose(results[i], want[i], rtol=2e-4, atol=2e-4)

        cli = Client(ready["host"], ready["port"])
        assert cli.call({"cmd": "shutdown"})["ok"]
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)
