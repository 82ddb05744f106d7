"""Concurrent-client serving burst: p50/p99 and aggregate throughput UNDER LOAD.

N client threads each hold their own TCP connection and fire requests
back-to-back for a fixed wall window against one dadmm-serve daemon
(ThreadingTCPServer: one handler thread per connection, solves serialized by
the solver lock — cli/serve.py). This measures what VERDICT round-1 item 8
asked for: tail latency when a second (…Nth) client does NOT queue behind the
first's socket, only behind the chip.

Usage: python serving_burst_harness.py <run_dir> <label> [n_clients] [B]
       [json|binary] [max_batch] [shed_ok]
Run from the repo root. Produced the PARITY.md concurrent-load rows (the binary
mode drives the DBF1 frame protocol — cli/serve.py module docstring).

B may be a single int ("8") or a per-client cycle ("mix=1,4,8,16" — client i
uses the i-th value mod the cycle, the mixed-size coalescing case). Passing
"shed_ok" as the 7th arg tolerates OverloadedError responses (the --max_pending
overload row): sheds are counted and reported, successful solves carry the
throughput.
"""
import json, os, selectors, socket, subprocess, sys, threading, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve import binary_solve  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
READY_TIMEOUT_S = 1800

run_dir, tier = sys.argv[1], sys.argv[2]
N_CLIENTS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
_b_arg = sys.argv[4] if len(sys.argv) > 4 else "8"
if _b_arg.startswith("mix="):
    B_CYCLE = [int(v) for v in _b_arg[4:].split(",")]
    B = max(B_CYCLE)          # warmup pads the largest request size
else:
    B_CYCLE = None
    B = int(_b_arg)
MODE = sys.argv[5] if len(sys.argv) > 5 else "json"
MAX_BATCH = int(sys.argv[6]) if len(sys.argv) > 6 else 32
SHED_OK = len(sys.argv) > 7 and sys.argv[7] == "shed_ok"
WINDOW_S = 20.0

# BURST_CONNECT="host:port": drive an ALREADY-RUNNING daemon instead of spawning
# one (server starts through the remote tunnel are minutes-slow and serialize on
# the device lease — one server, many load points is the efficient grid shape).
_connect = os.environ.get("BURST_CONNECT", "")
proc = None
if _connect:
    host, _, port = _connect.rpartition(":")
    s0 = socket.create_connection((host, int(port)), timeout=60)
    f0 = s0.makefile("rw")
    f0.write(json.dumps({"cmd": "ping"}) + "\n"); f0.flush()
    pong = json.loads(f0.readline())
    f0.close(); s0.close()
    ready = {"host": host, "port": int(port), **pong}
    # record the DAEMON's actual compiled batch, not the CLI default
    MAX_BATCH = int(ready.get("max_batch", MAX_BATCH))
else:
    proc = subprocess.Popen(
        [sys.executable, "-m", "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve",
         run_dir, "--device", "tpu", "--port", "0", "--max_batch", str(MAX_BATCH),
         "--compile_cache", os.path.join(REPO, ".xla_cache")],
        stdout=subprocess.PIPE, text=True, cwd=REPO)
    t0 = time.time()
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    if not sel.select(timeout=READY_TIMEOUT_S):
        proc.kill()
        sys.exit(f"server produced no readiness line within {READY_TIMEOUT_S}s")
    line = proc.stdout.readline()
    if not line:
        sys.exit(f"server exited before readiness (code {proc.wait()})")
    ready = json.loads(line)
    print(f"[{tier}] ready in {time.time()-t0:.1f}s: P={ready['P']} m={ready['m']} "
          f"K={ready['K']}", file=sys.stderr)
P, m = ready["P"], ready["m"]

# Warm every pad path once on a single connection before the burst.
s = socket.create_connection((ready["host"], ready["port"])); f = s.makefile("rw")
rng = np.random.default_rng(0)
for warm_b in (1, B, MAX_BATCH):
    f.write(json.dumps({"b": rng.standard_normal((warm_b, P, m)).tolist()}) + "\n")
    f.flush()
    _warm = json.loads(f.readline())
    if "y_hat" not in _warm:
        sys.exit(f"warmup B={warm_b} failed: {_warm.get('error', _warm)}")
f.close(); s.close()

# Clock discipline (r2 advisor): the window starts at barrier RELEASE (client 0
# records both start and deadline after the barrier — connect/thread-start cost is
# excluded), and the throughput denominator runs to the LAST completion, so the
# in-flight requests that finish past the deadline are in both numerator and
# denominator instead of biasing the rate up.
barrier = threading.Barrier(N_CLIENTS)
window = [0.0, 0.0]  # [start, stop_at], set by client 0 at barrier release
results = [None] * N_CLIENTS

def client(i):
    rng_i = np.random.default_rng(100 + i)
    b_i = B_CYCLE[i % len(B_CYCLE)] if B_CYCLE else B
    b_arr = rng_i.standard_normal((b_i, P, m)).astype(np.float32)
    si = socket.create_connection((ready["host"], ready["port"]))
    fi = si.makefile("rwb" if MODE == "binary" else "rw")
    payload = None if MODE == "binary" else json.dumps({"b": b_arr.tolist()}) + "\n"
    lats, n, shed = [], 0, 0
    barrier.wait()
    if i == 0:
        now = time.perf_counter()
        window[0], window[1] = now, now + WINDOW_S
    while window[1] == 0.0:
        time.sleep(0.001)
    while time.perf_counter() < window[1]:
        t = time.perf_counter()
        if MODE == "binary":
            try:
                y_hat = binary_solve(fi, fi, b_arr)
                assert y_hat.shape[0] == b_i
            except RuntimeError as e:
                if SHED_OK and "OverloadedError" in str(e):
                    shed += 1
                    continue   # shed: immediate refusal, no latency sample
                raise
        else:
            fi.write(payload); fi.flush()
            resp = json.loads(fi.readline())
            if SHED_OK and "OverloadedError" in resp.get("error", ""):
                shed += 1
                continue
            assert "y_hat" in resp, resp
        lats.append((time.perf_counter() - t) * 1e3)
        n += 1
    results[i] = (n, lats, time.perf_counter(), b_i, shed)
    fi.close(); si.close()

threads = [threading.Thread(target=client, args=(i,)) for i in range(N_CLIENTS)]
for t in threads: t.start()
for t in threads: t.join()
wall = max(r[2] for r in results) - window[0]

all_lats = np.concatenate([np.asarray(r[1]) for r in results])
total_reqs = sum(r[0] for r in results)
total_solves = sum(r[0] * r[3] for r in results)
total_shed = sum(r[4] for r in results)
p50, p99 = np.percentile(all_lats, [50, 99])
row = {
    "tier": tier, "mode": MODE, "n_clients": N_CLIENTS,
    "B": (f"mix={','.join(map(str, B_CYCLE))}" if B_CYCLE else B),
    "max_batch": MAX_BATCH, "total_requests": int(total_reqs),
    "p50_ms": round(float(p50), 1), "p99_ms": round(float(p99), 1),
    "aggregate_solves_per_s": round(total_solves / wall, 1),
    "window_s": WINDOW_S, "wall_s": round(wall, 2),
}
if SHED_OK:
    row["shed_requests"] = int(total_shed)
    row["shed_rate"] = round(total_shed / max(total_shed + total_reqs, 1), 3)
print(json.dumps(row))

if proc is not None:  # leave a BURST_CONNECT server running for the next load point
    s2 = socket.create_connection((ready["host"], ready["port"])); f2 = s2.makefile("rw")
    f2.write(json.dumps({"cmd": "shutdown"}) + "\n"); f2.flush()
    proc.wait(timeout=60)
