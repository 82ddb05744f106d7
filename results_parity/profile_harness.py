"""Capture + parse a jax.profiler trace of the headline serving unroll and the
bf16-carry train step (VERDICT r3 item 6: corroborate the roofline narrative —
"VPU-elementwise-bound forward / HBM-bound training" — with a MEASURED per-op
breakdown instead of analytic models alone).

Runs each workload under `jax.profiler.trace`, parses the xplane protobuf with
the baked-in tensorflow profiler schema, and writes a compact summary JSON:
per-workload top ops by self-time, time fraction by op category, and total
device time. Run from the repo root on the real chip:

    python results_parity/profile_harness.py [out_json] [--device cpu]

(--device cpu smoke-tests the capture+parse path; the committed artifact
results_parity/profile_summary_r4.json is from the TPU run.)
"""

import glob
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _parse_xspace(trace_dir):
    """Aggregate device-plane op events from the newest xplane.pb under
    trace_dir: returns {plane_name: {op_name: {"time_ps": int, "count": int,
    "category": str}}}."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.xplane.pb")))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    out = {}
    for plane in xspace.planes:
        # device planes: "/device:TPU:0" (real chip) / "/device:CPU:0" (smoke)
        if not plane.name.startswith("/device:"):
            continue
        meta = {m_id: m for m_id, m in plane.event_metadata.items()}
        stat_meta = {m_id: m.name for m_id, m in plane.stat_metadata.items()}
        ops = {}
        for line in plane.lines:
            # Count ONLY the leaf op line: 'Steps' / 'XLA Modules' / 'TC
            # Overlay' are envelopes of the same wall time, and 'Async XLA Ops'
            # (DMA copies) overlap compute — folding any of them in would
            # double-count. Device planes without the named lines (CPU smoke
            # runs) fall back to counting everything.
            named = {l.name for l in plane.lines}
            if "XLA Ops" in named and line.name != "XLA Ops":
                continue
            for ev in line.events:
                m = meta.get(ev.metadata_id)
                name = m.name if m else str(ev.metadata_id)
                low = name.lower()
                # control-flow envelopes nest their body ops on the same line
                if low.startswith(("jit", "%while", "%conditional", "%call")):
                    continue
                cat = ""
                for st in ev.stats:
                    sname = stat_meta.get(st.metadata_id, "")
                    if sname in ("category", "equation", "tf_op"):
                        if st.str_metadata_id:
                            cat = stat_meta.get(st.str_metadata_id, "")
                        elif st.str_value:
                            cat = st.str_value
                        if sname == "category":
                            break
                rec = ops.setdefault(name, {"time_ps": 0, "count": 0,
                                            "category": cat})
                rec["time_ps"] += ev.duration_ps
                rec["count"] += 1
                if cat and not rec["category"]:
                    rec["category"] = cat
        if ops:
            out[plane.name] = ops
    return out


def _categorize(name, category):
    """Fold op names into the roofline narrative's buckets."""
    n = name.lower()
    c = (category or "").lower()
    if "fusion" in n or "fusion" in c:
        return "fusion (fused elementwise/reduce)"
    if any(k in n for k in ("dot", "conv", "einsum")) or "convolution" in c:
        return "matmul (MXU)"
    if any(k in n for k in ("copy", "transpose", "reshape", "bitcast")):
        return "copy/layout"
    if any(k in n for k in ("all-reduce", "all-gather", "collective",
                            "permute", "reduce-scatter")):
        return "collective"
    if "infeed" in n or "outfeed" in n or "send" in n or "recv" in n:
        return "host transfer"
    return "other"


def _summarize(planes, top_k=8):
    out = {}
    for plane, ops in planes.items():
        total = sum(o["time_ps"] for o in ops.values())
        if not total:
            continue
        top = sorted(ops.items(), key=lambda kv: -kv[1]["time_ps"])[:top_k]
        buckets = {}
        for name, o in ops.items():
            b = _categorize(name, o["category"])
            buckets[b] = buckets.get(b, 0) + o["time_ps"]
        out[plane] = {
            "total_device_time_ms": round(total / 1e9, 3),
            "top_ops": [{
                "op": name[:120],
                "category": o["category"][:60],
                "time_ms": round(o["time_ps"] / 1e9, 3),
                "pct": round(100.0 * o["time_ps"] / total, 1),
                "count": o["count"],
            } for name, o in top],
            "pct_by_bucket": {b: round(100.0 * v / total, 1)
                              for b, v in sorted(buckets.items(),
                                                 key=lambda kv: -kv[1])},
        }
    return out


def main():
    argv = sys.argv[1:]
    device = "cpu" if "--device" in argv and "cpu" in argv else "tpu"
    out_json = argv[0] if argv and not argv[0].startswith("--") else os.path.join(
        REPO, "results_parity", "profile_summary_r4.json")

    from hyperparameter_gnn_unfolded_d_admm_main_tpu.utils.platform import (
        enable_compile_cache, select_device)

    select_device(device)
    enable_compile_cache(os.path.join(REPO, ".xla_cache"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hyperparameter_gnn_unfolded_d_admm_main_tpu.models import (
        dadmm_core, seq_hyperparam)
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import graphs, sensing
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.train import losses as loss_lib

    P, B, M, N, K = 64, 256, 100, 512, 15
    key = jax.random.key(0)
    A = jax.random.normal(key, (P, M, N), jnp.float32) / np.sqrt(M)
    b = jax.random.normal(jax.random.key(1), (B, P, M), jnp.float32)
    Atb = sensing.At_apply(A, b)
    adj = jnp.asarray(graphs.fast_sample_connected_er(0, B, P, 0.5))
    state = dadmm_core.init_state(jax.random.key(2), B, P, N)
    table = seq_hyperparam.hyp_table(
        0.05 * jnp.ones((K, P, 4), jnp.float32),
        jnp.asarray([0.1, 0.99, 0.99, 0.99]))
    label = jax.random.normal(jax.random.key(11), (B, N), jnp.float32)

    # (a) the headline serving unroll: final-iterate, bf16 state, factored
    fwd = jax.jit(lambda st, tb: dadmm_core.unroll_table_final(
        st, tb, None, Atb, adj, nan_guard=False, A=A,
        gram_mode="factored", solver_dtype="bfloat16"))

    # (b) the production training step: bf16 carry, factored, remat, in-scan loss
    def train_loss(tb):
        per_kp = dadmm_core.unroll_table_losses(
            state, tb, None, Atb, adj, label, nan_guard=False, A=A,
            gram_mode="factored", solver_dtype="bfloat16", remat=True)
        return jnp.mean(per_kp[-1])

    bwd = jax.jit(jax.value_and_grad(train_loss))

    summaries = {}
    for tag, fn, args in (("headline_fwd_bf16_factored_final", fwd, (state, table)),
                          ("train_fwd_bwd_bf16_state", bwd, (table,))):
        jax.block_until_ready(fn(*args))                       # compile + warm
        tdir = tempfile.mkdtemp(prefix=f"trace_{tag}_")
        with jax.profiler.trace(tdir):
            for _ in range(10):
                out = fn(*args)
            jax.block_until_ready(out)
        time.sleep(1.0)  # trace writer flush
        planes = _parse_xspace(tdir)
        summaries[tag] = _summarize(planes)
        print(f"[{tag}] planes: {list(summaries[tag])}", file=sys.stderr)

    payload = {
        "config": {"P": P, "B": B, "m": M, "n": N, "K": K, "device": device,
                   "iters_profiled": 10},
        "note": ("per-op device-plane self-times from the xplane trace; "
                 "'fusion' ops are XLA-fused elementwise/reduce chains (the "
                 "VPU-bound portion of the roofline narrative), 'matmul (MXU)' "
                 "the dot/conv kernels. Fractions are of total device op time "
                 "over 10 profiled executions."),
        "workloads": summaries,
    }
    with open(out_json, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {out_json}")
    for tag, planes in summaries.items():
        for plane, s in planes.items():
            print(f"{tag} @ {plane}: {s['total_device_time_ms']} ms, "
                  f"buckets {s['pct_by_bucket']}")


if __name__ == "__main__":
    main()
