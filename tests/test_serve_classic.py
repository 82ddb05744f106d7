"""Serving the CLASSIC segment-table family (`cli/serve.py` classic path).

The reference's only inference surface for this family is the one-shot
`dlasso.py --eval` script (`dlasso.py:41-50`); here the trained color-sweep
table serves requests over the same daemon protocol as every other family.
Drives a real subprocess on the committed classic run artifact
(results_parity/classic_dlasso — params_*.npy tables, NO args.json: exercises
the filename-metadata fallback) and checks served answers bit-match a direct
in-process `DADMMLASSOClassic.run` on the same table + cached color schedule.
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
    cached color schedule), for bit-match reference answers."""
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
def test_classic_dlr_tables_are_refused_with_pointer():
    """6-hyperparameter (dlr) tables refuse to serve, with the documented
    pointer to the eval surface — the reference's classic dlr is a curve
    artifact, not a request/response service."""
    proc = subprocess.Popen(
        [sys.executable, "-m",
         "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve",
         DLR_RUN, "--device", "cpu", "--port", "0", "--max_batch", "2"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=REPO,
    )
    out, err = proc.communicate(timeout=300)
    assert proc.returncode != 0
    assert "classic dlr" in err and "--eval" in err
