"""End-to-end serving latency: TCP round trips incl. JSON encode + tunnel RTT.

Usage: python serving_latency_harness.py <run_dir> <label> — run from the repo root
(paths are repo-relative). Produced the PARITY.md tier-vs-tier serving rows.
"""
import json, os, selectors, socket, subprocess, sys, time
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
READY_TIMEOUT_S = 1800  # first TPU compile through the tunnel can take many minutes

run_dir, tier = sys.argv[1], sys.argv[2]
proc = subprocess.Popen(
    [sys.executable, "-m", "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve",
     run_dir, "--device", "tpu", "--port", "0", "--max_batch", "32",
     "--compile_cache", os.path.join(REPO, ".xla_cache")],
    stdout=subprocess.PIPE, text=True, cwd=REPO)
t0 = time.time()
sel = selectors.DefaultSelector()
sel.register(proc.stdout, selectors.EVENT_READ)
if not sel.select(timeout=READY_TIMEOUT_S):
    proc.kill()
    sys.exit(f"server produced no readiness line within {READY_TIMEOUT_S}s")
line = proc.stdout.readline()
if not line:  # server died before readiness (bad run_dir, device unavailable)
    sys.exit(f"server exited before readiness (code {proc.wait()})")
ready = json.loads(line)
print(f"[{tier}] ready in {time.time()-t0:.1f}s: P={ready['P']} m={ready['m']} K={ready['K']}", file=sys.stderr)
s = socket.create_connection((ready["host"], ready["port"])); f = s.makefile("rw")
rng = np.random.default_rng(0)
P, m = ready["P"], ready["m"]
def fire(B, n_reqs):
    lats = []
    for i in range(n_reqs):
        b = rng.standard_normal((B, P, m)).tolist()
        t = time.perf_counter()
        f.write(json.dumps({"b": b}) + "\n"); f.flush()
        resp = json.loads(f.readline())
        lats.append((time.perf_counter() - t) * 1e3)
        assert "y_hat" in resp, resp
    return np.percentile(lats, [50, 99])
fire(1, 3); fire(32, 3)  # warmup (jit already cached at max_batch, but pad paths)
for B in (1, 32):
    p50, p99 = fire(B, 30)
    thr = B / (p50 / 1e3)
    print(json.dumps({"tier": tier, "B": B, "p50_ms": round(p50, 1),
                      "p99_ms": round(p99, 1), "solves_per_s_at_p50": round(thr, 1)}))
f.write(json.dumps({"cmd": "shutdown"}) + "\n"); f.flush()
proc.wait(timeout=60)
