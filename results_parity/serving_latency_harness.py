"""End-to-end serving latency: TCP round trips incl. JSON encode + tunnel RTT."""
import json, socket, subprocess, sys, time, os
import numpy as np

run_dir, tier = sys.argv[1], sys.argv[2]
proc = subprocess.Popen(
    [sys.executable, "-m", "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve",
     run_dir, "--device", "tpu", "--port", "0", "--max_batch", "32",
     "--compile_cache", "/root/repo/.xla_cache"],
    stdout=subprocess.PIPE, text=True, cwd="/root/repo")
t0 = time.time()
ready = json.loads(proc.stdout.readline())
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
