"""Round-5 serving burst grid (VERDICT r4 items 6 & 7 + converged flagship).

Extends the round-4 grid with the measurements the r4 verdict demanded:

  (a) coalescing ladder TO SATURATION: 16/32/64 clients x B=8 plus mixed-size
      windows (mix=1,4,8,16) against the P=64 table-tier bf16+factored daemon
      with --coalesce_ms 5 / max_batch 128 — locate the knee past the r4
      record (922.7 solves/s at 16 clients);
  (b) OVERLOAD behavior: offered load >> ceiling against a --max_pending-bounded
      daemon (uncoalesced, the r4 pathologic config that measured p50 1004 ms of
      pure queueing) — latency of the SERVED requests + shed rate, and the
      composed coalesce+bounded point;
  (c) the CONVERGED P=256 flagship checkpoint
      (results_parity/scaled_P256_flagship_converged) under the same load points
      as the r4 16-epoch checkpoint, for the before/after serving row.

One daemon per config (shared compile cache); every load point reuses it via
BURST_CONNECT. Appends JSON rows to results_parity/serving_burst/burst_r5.jsonl.

Run from the repo root:  python results_parity/burst_r5_driver.py [labels...]
"""

import glob
import json
import os
import selectors
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HARNESS = os.path.join(REPO, "results_parity", "serving_burst_harness.py")
OUT = os.path.join(REPO, "results_parity", "serving_burst", "burst_r5.jsonl")
READY_TIMEOUT_S = 2400

TABLE_RUN = "results_parity/scaled_P64_table/20260821_063633_unfolded_new"


def _converged_flagship(suffix=""):
    # newest phase dir that actually carries a best/ checkpoint (a resumed
    # plateau-confirmation phase that never improves saves no best/)
    hits = [h for h in sorted(glob.glob(
        f"results_parity/scaled_P256_flagship_converged{suffix}/*_progressive"))
        if os.path.exists(os.path.join(h, "best", "state.msgpack"))]
    return hits[-1] if hits else None


# label -> (run_dir, server_extra_args, max_batch, [(n_clients, B_spec, shed_ok)])
def configs():
    cfgs = [
        ("table_P64_bf16fac_coalesce5ms", TABLE_RUN,
         ["--dtype", "bfloat16", "--gram_mode", "factored",
          "--coalesce_ms", "5"], 128,
         [(16, "8", False), (32, "8", False), (64, "8", False),
          (16, "mix=1,4,8,16", False), (32, "mix=1,4,8,16", False)]),
        ("table_P64_bf16fac_maxpend4", TABLE_RUN,
         ["--dtype", "bfloat16", "--gram_mode", "factored",
          "--max_pending", "4"], 128,
         [(16, "8", True)]),
        ("table_P64_bf16fac_coalesce5ms_maxpend8", TABLE_RUN,
         ["--dtype", "bfloat16", "--gram_mode", "factored",
          "--coalesce_ms", "5", "--max_pending", "8"], 128,
         [(64, "8", True)]),
    ]
    # converged-at-scale checkpoints (r4 item 3): h16 is the exact r4 recipe —
    # the apples-to-apples replacement for the 0.686 checkpoint's serving rows
    # (92 solves/s at B=32) — h100 is the default-width converged flagship
    for label, suffix in (("flagship_P256_converged_h16_f32", "_h16"),
                          ("flagship_P256_converged_h100_f32", "")):
        conv = _converged_flagship(suffix)
        if conv:
            cfgs.append((label, conv, [], 32,
                         [(1, "8", False), (1, "32", False)]))
        else:
            print(f"note: {label} run not found; skipping its rows",
                  file=sys.stderr)
    # the plateau-trained P=1024 nodewise flagship (round-5 extension of the
    # r4 12-epoch run): the largest-agent-count served checkpoint
    p1024 = [h for h in sorted(glob.glob(
        "results_parity/scaled_P1024_nodewise_converged/*_progressive"))
        if os.path.exists(os.path.join(h, "best", "state.msgpack"))]
    if p1024:
        # JSON warmup at B=32 is ~32*1024*100 floats (~70 MB of text) — raise
        # the request cap; the measured burst itself rides compact binary frames
        cfgs.append(("flagship_P1024_converged_f32", p1024[-1],
                     ["--max_request_mb", "256"], 32,
                     [(1, "8", False), (1, "32", False)]))
    else:
        print("note: flagship_P1024_converged_f32 run not found; skipping",
              file=sys.stderr)
    return cfgs


def start_daemon(run_dir, extra, max_batch):
    proc = subprocess.Popen(
        [sys.executable, "-m",
         "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.serve",
         run_dir, "--device", "tpu", "--port", "0",
         "--max_batch", str(max_batch), "--ckpt", "best",
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
    for label, run_dir, extra, max_batch, points in configs():
        if only and label not in only:
            continue
        t0 = time.time()
        print(f"=== {label}: starting daemon ({run_dir})", file=sys.stderr)
        proc, ready = start_daemon(run_dir, extra, max_batch)
        print(f"=== {label}: ready in {time.time() - t0:.0f}s on port "
              f"{ready['port']}", file=sys.stderr)
        try:
            for n_clients, b_spec, shed_ok in points:
                env = dict(os.environ,
                           BURST_CONNECT=f"{ready['host']}:{ready['port']}")
                args = [sys.executable, HARNESS, run_dir,
                        f"{label}_{n_clients}c", str(n_clients), b_spec,
                        "binary", str(max_batch)]
                if shed_ok:
                    args.append("shed_ok")
                r = subprocess.run(args, capture_output=True, text=True,
                                   cwd=REPO, env=env, timeout=1200)
                line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
                if r.returncode or not line:
                    print(f"point {label} c{n_clients} B{b_spec} FAILED:\n"
                          f"{r.stderr[-800:]}", file=sys.stderr)
                    continue
                # append the daemon's shed/stats counters for the overload rows
                if shed_ok:
                    try:
                        s = socket.create_connection(
                            (ready["host"], ready["port"]), timeout=30)
                        f = s.makefile("rw")
                        f.write(json.dumps({"cmd": "stats"}) + "\n")
                        f.flush()
                        stats = json.loads(f.readline())
                        f.close(); s.close()
                        row = json.loads(line)
                        row["server_stats"] = {
                            k: stats.get(k) for k in
                            ("requests", "shed", "errors", "latency_ms")}
                        line = json.dumps(row)
                    except OSError:
                        pass
                with open(OUT, "a") as f:
                    f.write(line + "\n")
                print(line)
        finally:
            shutdown(ready, proc)
    print(f"grid done -> {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
