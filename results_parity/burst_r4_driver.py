"""Round-4 serving burst grid: the SCALE shapes under load (VERDICT r3 item 3).

Round 3 measured the serving ceiling only at the trivially small P=5 shape,
where the daemon is dispatch/RTT-bound and the dtype/gram levers are invisible.
This grid load-tests the shapes where they matter, on the real chip:

  (a) the P=64 / n=512 / K=15 TABLE-TIER checkpoint (scaled_P64_table),
  (b) the P=64 GHyp1c checkpoint (scaled_P64_ghyp1c),

each served f32 AND with the production knobs (--dtype bfloat16
--gram_mode factored for the table tier; --dtype bfloat16 for GHyp1c), driven
through a single-client binary B-ladder (8/32/64/128) to locate the knee, plus
one 4-client point at the largest B. One daemon per config (compile cache
shared); every load point reuses it via BURST_CONNECT. Appends JSON rows to
results_parity/serving_burst/burst_r4.jsonl.

Run from the repo root:  python results_parity/burst_r4_driver.py
"""

import json
import os
import selectors
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HARNESS = os.path.join(REPO, "results_parity", "serving_burst_harness.py")
OUT = os.path.join(REPO, "results_parity", "serving_burst", "burst_r4.jsonl")
READY_TIMEOUT_S = 2400
MAX_BATCH = 128

CONFIGS = [
    ("table_P64_f32",
     "results_parity/scaled_P64_table/20260821_063633_unfolded_new", []),
    ("table_P64_bf16_factored",
     "results_parity/scaled_P64_table/20260821_063633_unfolded_new",
     ["--dtype", "bfloat16", "--gram_mode", "factored"]),
    ("ghyp1c_P64_f32",
     "results_parity/scaled_P64_ghyp1c/20260821_064147_progressive", []),
    ("ghyp1c_P64_bf16",
     "results_parity/scaled_P64_ghyp1c/20260821_064147_progressive",
     ["--dtype", "bfloat16"]),
]
B_LADDER = [8, 32, 64, 128]


def start_daemon(run_dir, extra):
    proc = subprocess.Popen(
        [sys.executable, "-m",
         "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve",
         run_dir, "--device", "tpu", "--port", "0",
         "--max_batch", str(MAX_BATCH), "--ckpt", "best",
         "--compile_cache", os.path.join(REPO, ".xla_cache"), *extra],
        stdout=subprocess.PIPE, text=True, cwd=REPO)
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    if not sel.select(timeout=READY_TIMEOUT_S):
        proc.kill()
        raise RuntimeError("daemon produced no readiness line in time")
    line = proc.stdout.readline()
    if not line:
        raise RuntimeError(f"daemon exited early (code {proc.wait()})")
    return proc, json.loads(line)


def shutdown(ready, proc):
    try:
        s = socket.create_connection((ready["host"], ready["port"]), timeout=60)
        f = s.makefile("rw")
        f.write(json.dumps({"cmd": "shutdown"}) + "\n")
        f.flush()
        f.readline()
        f.close()
        s.close()
    except OSError:
        pass
    try:
        proc.wait(timeout=120)
    except subprocess.TimeoutExpired:
        proc.kill()   # exact PID of the daemon this script started


def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    only = set(sys.argv[1:])   # optional config-label filter (rerun/continue)
    for label, run_dir, extra in CONFIGS:
        if only and label not in only:
            continue
        t0 = time.time()
        print(f"=== {label}: starting daemon ({run_dir})", file=sys.stderr)
        proc, ready = start_daemon(run_dir, extra)
        print(f"=== {label}: ready in {time.time() - t0:.0f}s on port "
              f"{ready['port']}", file=sys.stderr)
        try:
            points = [(1, b) for b in B_LADDER] + [(4, B_LADDER[-1])]
            for n_clients, B in points:
                env = dict(os.environ,
                           BURST_CONNECT=f"{ready['host']}:{ready['port']}")
                r = subprocess.run(
                    [sys.executable, HARNESS, run_dir, label,
                     str(n_clients), str(B), "binary", str(MAX_BATCH)],
                    capture_output=True, text=True, cwd=REPO, env=env,
                    timeout=1200)
                line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
                if r.returncode or not line:
                    print(f"point {label} c{n_clients} B{B} FAILED:\n"
                          f"{r.stderr[-800:]}", file=sys.stderr)
                    continue
                with open(OUT, "a") as f:
                    f.write(line + "\n")
                print(line)
        finally:
            shutdown(ready, proc)
    print(f"grid done -> {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
