"""Benchmark: D-ADMM iterations/sec/chip on the real TPU.

The LAST stdout line is ONE COMPACT JSON line (< 1500 chars — the driver's tail
capture window must contain the whole line, see build_records):
    {"metric": "dadmm_iter_per_sec_per_chip", "value": N, "unit": "iter/s",
     "vs_baseline": N / baseline, "variants_iter_per_sec": {...},
     "baseline_source": "measured_this_run" | "fallback_round1_constant", ...}
Full detail (rooflines, per-variant step times, hw peaks, notes) is written to
results_parity/bench_detail.json.

Workload: the scaled single-host config from BASELINE.json — P=64 agents, batch 256
scenarios, m=100, n=512, K=15 unfolded D-ADMM iterations (Gram matvec + soft-threshold
+ consensus + dual ascent per iteration), forward pass, float32.

`vs_baseline` compares against the reference implementation style measured here on CPU
with torch: per-agent Python-loop matvecs and the per-edge consensus triple loop
(`unfolded_DLASSO.py:69-99,111-140` semantics), same shapes, one timed iteration
(extrapolated). The reference repo publishes no throughput numbers (BASELINE.md), so
its own algorithmic style at the same shapes is the baseline.

Variant ordering is budget-aware (remote-compile latency through the tunnel is highly
variable): the persistent compile cache (`utils/platform.enable_compile_cache`,
`.xla_cache/` — warmed by in-session runs) is enabled first, then the headline forward
variants, then the TRAINING variants (the production fwd+bwd path — these must land in
the recorded artifact), then the GNN-hypernetwork training tiers (gnn_train_P64 /
ghyp1c_train_P64), then the reference-shape P=8 grid and the classic color-sweep
row, and only then the informational forward ablations.
"""

import json
import os
import time

import numpy as np

# Benchmark config (BASELINE.json "scaled single-host" scenario)
P, B, M, N, K = 64, 256, 100, 512, 15
GRAPH_PROB = 0.5
REPEATS = 30

# v5e per-chip peaks (public spec; the hardware-relative denominators VERDICT r1
# asked for — "fast" is judged against the chip, not against interpreted Python).
HBM_PEAK_GBS = 819.0
MXU_PEAK_BF16_TFLOPS = 197.0
MXU_PEAK_F32_TFLOPS = 49.0   # fp32 operands run the MXU at ~1/4 of bf16


def variant_roofline(tag: str) -> dict:
    """Analytic per-iteration HBM bytes + MXU FLOPs for a bench variant. The model
    (validated against the measured phase ablation in BASELINE.md): every iteration
    reads y/U/delta/Atb and writes y/U/delta + the Y snapshot (8 state-tensor
    transfers), re-streams the matvec operand (XLA does not keep it resident across
    scan steps), and reads the adjacency; FLOPs are the matvec + consensus matmuls
    (elementwise is <2% and omitted). `ref_shape_*` variants use P=8; everything
    else the headline P."""
    p = 8 if tag.startswith("ref_shape") else P
    sd = 2 if "bf16_state" in tag else 4               # solver-state dtype bytes
    # operand/MXU dtype: bf16 only when the MATMUL dtype is bf16 (xla_bf16 /
    # *_bf16mm variants); bf16_state keeps the operand f32 (state-only cast)
    md = 2 if ("bf16mm" in tag or tag == "xla_bf16") else 4
    units = 7 if "final" in tag or "losses" in tag or "train" in tag else 8
    state = units * B * p * N * sd                     # in-scan loss drops the Y write
    # train variants and the VMEM-resident Pallas kernels all run the FACTORED
    # operand (A^T(A y)); only the explicit gram-streaming variants read AtA
    if "factored" in tag or "train" in tag or "resident" in tag:
        operand = 2 * p * M * N * md
        mv_flops = 2 * 2 * B * p * M * N
    else:
        operand = p * N * N * md
        mv_flops = 2 * B * p * N * N
    adj_bytes = B * p * p * 4
    cons_flops = 2 * B * p * p * N
    bytes_it = state + operand + adj_bytes
    flops_it = mv_flops + cons_flops
    if tag.startswith("train"):
        # remat'd value_and_grad: forward + recomputed forward + backward ~ 3x the
        # forward FLOPs; state traffic ~3x (fwd write + recompute + grad read/write).
        factor = 2.0 if "noremat" in tag else 3.0
        bytes_it *= factor
        flops_it *= factor
    return {"bytes_per_iter": int(bytes_it), "flops_per_iter": int(flops_it),
            "mxu_peak_tflops": MXU_PEAK_BF16_TFLOPS if md == 2 else MXU_PEAK_F32_TFLOPS}


def attach_rooflines(variants: dict) -> dict:
    """iter/s -> %-of-peak for every unfolded-family variant (headline shape and
    ref_shape P=8; classic_* is a different algorithm — Gauss-Seidel color sweeps
    over a row-partitioned global A — and the gnn_/ghyp1c_ training tiers run
    hypernetwork evals the state/operand model doesn't cover, so both are skipped)."""
    out = {}
    for tag, v in variants.items():
        if v is None or tag.startswith(("classic", "gnn_", "ghyp")):
            continue
        ips = v[0]
        r = variant_roofline(tag)
        out[tag] = {
            "bytes_per_iter": r["bytes_per_iter"],
            "flops_per_iter": r["flops_per_iter"],
            "pct_hbm_peak": round(100.0 * ips * r["bytes_per_iter"] / (HBM_PEAK_GBS * 1e9), 1),
            "pct_mxu_peak": round(100.0 * ips * r["flops_per_iter"] / (r["mxu_peak_tflops"] * 1e12), 1),
        }
    return out


def bench_tpu():
    import jax
    import jax.numpy as jnp
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.models import dadmm_core, seq_hyperparam
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import graphs, sensing
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.train import losses as loss_lib
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.utils.platform import enable_compile_cache

    # Persistent XLA compile cache: the tunnel's remote compiles cost 30s..15min per
    # program and were the reason BENCH_r02's late variants never ran — with a warm
    # cache every program loads in seconds and the whole grid fits the budget.
    enable_compile_cache(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_cache"))

    key = jax.random.key(0)
    # Gaussian A (skip the SVD conditioning: benchmark targets the iteration loop)
    A = jax.random.normal(key, (P, M, N), jnp.float32) / np.sqrt(M)
    AtA = sensing.gram(A)
    b = jax.random.normal(jax.random.key(1), (B, P, M), jnp.float32)
    Atb = sensing.At_apply(A, b)
    adj = jnp.asarray(graphs.fast_sample_connected_er(0, B, P, GRAPH_PROB))
    state = dadmm_core.init_state(jax.random.key(2), B, P, N)
    table = seq_hyperparam.hyp_table(
        0.05 * jnp.ones((K, P, 4), jnp.float32), jnp.asarray([0.1, 0.99, 0.99, 0.99])
    )

    import sys

    def time_loop(fn, args, out_bytes, tag, min_s_per_unroll=0.0, k_iters=K):
        """Timing window with a physical-plausibility guard: one unroll can never be
        faster than writing its own output through HBM (~819 GB/s on v5e; bound at
        2 TB/s for slack), nor faster than `min_s_per_unroll` when the caller knows a
        tighter floor (e.g. fwd+bwd can't beat the measured forward-only unroll). The
        remote-execution tunnel occasionally returns from block_until_ready early,
        producing absurd readings (observed: 492k iter/s, 330x the honest value) —
        re-measure and keep the slowest window."""
        sol_s = max(out_bytes / 2e12, min_s_per_unroll)
        best_dt = None
        for attempt in range(3):
            t0 = time.perf_counter()
            for _ in range(REPEATS):
                Y = fn(*args)
            jax.block_until_ready(Y)
            dt = time.perf_counter() - t0
            best_dt = dt if best_dt is None else max(best_dt, dt)
            if dt / REPEATS >= sol_s:
                return REPEATS * k_iters / dt, dt / REPEATS
            print(f"{tag}: implausible window ({dt / REPEATS * 1e6:.0f}us/unroll < "
                  f"HBM bound {sol_s * 1e6:.0f}us), re-measuring", file=sys.stderr, flush=True)
        # Every window beat the HBM write bound -> the reading is not a measurement.
        # Drop the variant rather than publish a number the code just proved impossible.
        print(f"{tag}: all windows implausible, DROPPING variant", file=sys.stderr, flush=True)
        return None

    Y_BYTES = 4 * K * B * P * N  # the [K,B,P,n] f32 output one unroll must write

    def timed(tag, **kw):
        unroll = jax.jit(
            lambda st, tb: dadmm_core.unroll_table(st, tb, AtA, Atb, adj, remat=False, A=A, **kw)
        )
        print(f"compiling {tag}...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        Y = unroll(state, table)
        jax.block_until_ready(Y)  # compile + warm
        print(f"compiled {tag} in {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
        out_bytes = Y_BYTES // (2 if kw.get("solver_dtype") == "bfloat16" else 1)
        return time_loop(unroll, (state, table), out_bytes, tag)

    # Headline variants first — everything after them is best-effort under a deadline.
    # The driver must always get its one JSON line. Default budget 1500s: the full
    # 18-variant grid measured ~840s with a warm cache, and tunnel-compile variance
    # can double any single variant — 900s was one bad compile away from dropping
    # the informational tail.
    deadline = time.monotonic() + float(os.environ.get("BENCH_BUDGET_S", "1500"))
    variants = {
        "xla_fp32_factored_noguard": timed(
            "xla_fp32_factored_noguard", nan_guard=False, gram_mode="factored"
        ),
    }
    # Serving fast path: final-iterate-only unroll (no per-iteration Y snapshot
    # write) — what cli/serve.py actually runs; trajectory-identical to the
    # stacked unroll (tests/test_core.py).
    try:
        fin = jax.jit(lambda st, tb: dadmm_core.unroll_table_final(
            st, tb, None, Atb, adj, nan_guard=False, A=A,
            gram_mode="factored", solver_dtype="bfloat16"))
        print("compiling xla_bf16_state_factored_final...", file=sys.stderr, flush=True)
        y_fin = fin(state, table)
        jax.block_until_ready(y_fin)
        variants["xla_bf16_state_factored_final"] = time_loop(
            fin, (state, table), 2 * B * P * N, "xla_bf16_state_factored_final")
    except Exception as e:  # noqa: BLE001
        print(f"variant final failed: {e}", file=sys.stderr, flush=True)

    # Round-3 headline candidate: bf16 MATMUL operands on top of the bf16-state
    # final unroll (+3% measured). Quality-gated like the state cast: NMSE delta
    # vs f32 on the golden imported checkpoint is 0.002%
    # (tests/test_core.py::test_bf16_full_serving_quality_gate).
    try:
        fin2 = jax.jit(lambda st, tb: dadmm_core.unroll_table_final(
            st, tb, None, Atb, adj, nan_guard=False, A=A,
            gram_mode="factored", solver_dtype="bfloat16",
            matmul_dtype="bfloat16"))
        print("compiling xla_bf16_state_factored_final_bf16mm...",
              file=sys.stderr, flush=True)
        y_fin2 = fin2(state, table)
        jax.block_until_ready(y_fin2)
        variants["xla_bf16_state_factored_final_bf16mm"] = time_loop(
            fin2, (state, table), 2 * B * P * N,
            "xla_bf16_state_factored_final_bf16mm")
    except Exception as e:  # noqa: BLE001
        print(f"variant final_bf16mm failed: {e}", file=sys.stderr, flush=True)

    # Training step (value+grad through the K-scan with in-scan loss reduction) at
    # the headline shape — the production training path, not just the forward unroll.
    # Runs IMMEDIATELY after the headline so a budget overrun can only cost the
    # informational ablations (VERDICT r2 item 1). Variants: the default remat'd
    # fp32 path; bf16 solver state through BOTH passes (quality gate:
    # tests/test_train.py::test_bf16_state_training_quality_gate); the full
    # production combo bf16 state + factored + in-scan loss + masked-K (one max-K
    # program serving every K of the progressive schedule); no-remat; bf16-fed MXU.
    label = jax.random.normal(jax.random.key(11), (B, N), jnp.float32)

    def timed_train(tag, masked_k=False, **tkw):
        def train_loss(tb, k_act):
            per_kp = dadmm_core.unroll_table_losses(
                state, tb, None, Atb, adj, label,
                nan_guard=False, A=A, gram_mode="factored", **tkw)
            if masked_k:
                _, lf = loss_lib.masked_losses_from_per_kp(per_kp, k_act)
                return lf
            return jnp.mean(per_kp[-1])

        gstep = jax.jit(jax.value_and_grad(train_loss))
        k_act = jnp.int32(K)
        print(f"compiling {tag}...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        v, g = gstep(table, k_act)
        jax.block_until_ready(v)
        print(f"compiled {tag} in {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
        # fwd+bwd contains a full forward pass, so it can never run faster than
        # the fastest forward-only variant measured above — a much tighter floor
        # than HBM bytes (a 72k iter/s tunnel anomaly once cleared the byte bound).
        fwd_spu = [vv[1] for kk, vv in variants.items()
                   if vv is not None and not kk.startswith("train")]
        return time_loop(
            lambda tb, _g=gstep: _g(tb, k_act)[0], (table,), Y_BYTES // 2, tag,
            min_s_per_unroll=min(fwd_spu) if fwd_spu else 0.0)

    for tag, mk, tkw in (
        ("train_fwd_bwd_factored", False, {"remat": True}),
        # bf16 solver state through BOTH passes: the gradient flows through the
        # bf16-stored carry; final val loss within 5% of f32 (gated test above).
        ("train_fwd_bwd_bf16_state", False, {"remat": True, "solver_dtype": "bfloat16"}),
        # The production P=64/B=256 progressive-training config, all optimizations
        # on: bf16 carry + factored operand + in-scan loss + traced-K masking.
        ("train_fwd_bwd_bf16_state_maskedk", True,
         {"remat": True, "solver_dtype": "bfloat16"}),
        ("train_fwd_bwd_noremat", False, {"remat": False}),
        ("train_fwd_bwd_bf16mm", False, {"remat": True, "matmul_dtype": "bfloat16"}),
    ):
        if time.monotonic() > deadline:
            print(f"skipping {tag}: bench budget exhausted", file=sys.stderr, flush=True)
            continue
        try:
            variants[tag] = timed_train(tag, masked_k=mk, **tkw)
        except Exception as e:  # noqa: BLE001 - extras must never kill the bench
            print(f"variant {tag} failed: {e}", file=sys.stderr, flush=True)

    # GNN-hypernetwork training tiers at P=64/B=64/K=15 (VERDICT r4 item 4: the
    # hypernetwork family — the repo's namesake — belongs on the driver-recorded
    # scoreboard, not just in in-session scripts). One full production train step:
    # value_and_grad through model.apply_losses (K hypernetwork evals inside the
    # scan for the flagship; one eval + corrector for GHyp1c) + AdamW update.
    # iter/s counts D-ADMM iterations (steps/s = iter/s / K; detail file has
    # sec_per_unroll). Matches results_parity/{gnn,ghyp1c}_scale_bench_script.py.
    if time.monotonic() < deadline:
        try:
            import optax

            from hyperparameter_gnn_unfolded_d_admm_main_tpu.config import Config
            from hyperparameter_gnn_unfolded_d_admm_main_tpu.models.gnn_hypernet import (
                DLASSOGNNHyp, DLASSOGNNHypOneShotCorrected)
            from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import data as data_ops
            from hyperparameter_gnn_unfolded_d_admm_main_tpu.train import optim

            gcfg = Config(P=P, m=M, n=N, GHyp_hidden=100, GHN_iter_num=K,
                          batch_size=64, gram_mode="factored", data_noise=True)
            Ag = sensing.set_A(jax.random.key(30), gcfg.P, gcfg.m, gcfg.n)
            bg, yg = data_ops.make_dataset(jax.random.key(31), Ag, gcfg.batch_size,
                                           noise=True)
            adjg = jnp.asarray(graphs.fast_sample_connected_er(
                2, gcfg.batch_size, gcfg.P, 0.3))
            gkey = jax.random.key(32)

            for tag, model_cls in (("gnn_train_P64", DLASSOGNNHyp),
                                   ("ghyp1c_train_P64", DLASSOGNNHypOneShotCorrected)):
                if time.monotonic() > deadline:
                    print(f"skipping {tag}: bench budget exhausted",
                          file=sys.stderr, flush=True)
                    continue
                model = model_cls(Ag, gcfg)
                gparams, gnorm = model.init(jax.random.key(33))
                gtx = optim.make_optimizer("adamw", 9e-4, weight_decay=1e-5,
                                           clip_norm=100.0)
                gopt = gtx.init(gparams)

                def gstep(p0, ns0, os0, kk, _model=model, _tx=gtx):
                    def loss_fn(p):
                        per_kp, _hyp, ns2 = _model.apply_losses(
                            p, ns0, kk, bg, adjg, yg,
                            training_iterations=K, training=True)
                        _lm, lf = loss_lib.losses_from_per_kp(per_kp)
                        return lf, ns2
                    (lf, ns2), g = jax.value_and_grad(loss_fn, has_aux=True)(p0)
                    upd, os2 = _tx.update(g, os0, p0)
                    return optax.apply_updates(p0, upd), ns2, os2, lf

                gjit = jax.jit(gstep)
                print(f"compiling {tag}...", file=sys.stderr, flush=True)
                t0 = time.perf_counter()
                out = gjit(gparams, gnorm, gopt, gkey)
                jax.block_until_ready(out[3])
                print(f"compiled {tag} in {time.perf_counter() - t0:.1f}s",
                      file=sys.stderr, flush=True)
                # Plausibility floor: one step must at least rewrite params +
                # 2x Adam moments through HBM.
                pbytes = sum(int(np.prod(x.shape)) * x.dtype.itemsize
                             for x in jax.tree.leaves(gparams))
                variants[tag] = time_loop(
                    lambda *a, _g=gjit: _g(*a)[3], (gparams, gnorm, gopt, gkey),
                    3 * pbytes, tag)
        except Exception as e:  # noqa: BLE001
            print(f"gnn-tier variants failed: {e}", file=sys.stderr, flush=True)

    # Reference-shape config (small agent count, like the paper benchmarks): P=8.
    # Also times the VMEM-resident factored Pallas kernel here — the shape where its
    # whole working set fits on-chip (see kernels/full_unroll.py roofline note).
    if time.monotonic() < deadline:
        try:
            P8 = 8
            A8 = jax.random.normal(jax.random.key(7), (P8, M, N), jnp.float32) / np.sqrt(M)
            AtA8 = sensing.gram(A8)
            b8 = jax.random.normal(jax.random.key(8), (B, P8, M), jnp.float32)
            Atb8 = sensing.At_apply(A8, b8)
            adj8 = jnp.asarray(graphs.fast_sample_connected_er(1, B, P8, GRAPH_PROB))
            st8 = dadmm_core.init_state(jax.random.key(9), B, P8, N)
            tb8 = seq_hyperparam.hyp_table(
                0.05 * jnp.ones((K, P8, 4), jnp.float32), jnp.asarray([0.1, 0.99, 0.99, 0.99])
            )
            un8 = jax.jit(lambda s, t: dadmm_core.unroll_table(
                s, t, AtA8, Atb8, adj8, remat=False, nan_guard=False))
            Y = un8(st8, tb8)
            jax.block_until_ready(Y)
            y8_bytes = 4 * K * B * P8 * N
            variants["ref_shape_P8_noguard"] = time_loop(
                un8, (st8, tb8), y8_bytes, "ref_shape_P8")

            from hyperparameter_gnn_unfolded_d_admm_main_tpu.kernels import full_unroll

            deg8 = jnp.sum(adj8, axis=-1)
            clip8 = full_unroll.unfolded_clip_table(K)
            fused8 = jax.jit(lambda s, t: full_unroll.fused_unroll_factored(
                A8, s.y, s.U, s.delta, Atb8, deg8, adj8, t, clip8))
            Y = fused8(st8, tb8)
            jax.block_until_ready(Y)
            # On-hardware K=1 parity gate (silent-miscompile history: never time
            # unchecked kernel output).
            Y1 = jax.jit(lambda: full_unroll.fused_unroll_factored(
                A8, st8.y, st8.U, st8.delta, Atb8, deg8, adj8, tb8[:1], clip8[:1]))()
            Y1r = jax.jit(full_unroll._jnp_unroll_factored)(
                A8, st8.y, st8.U, st8.delta, Atb8, deg8, adj8, tb8[:1], clip8[:1])
            err = float(jnp.max(jnp.abs(Y1 - Y1r)) / (jnp.max(jnp.abs(Y1r)) + 1e-9))
            print(f"resident kernel K=1 parity rel err: {err:.2e}", file=sys.stderr, flush=True)
            if err < 1e-3:
                variants["ref_shape_P8_pallas_resident"] = time_loop(
                    fused8, (st8, tb8), y8_bytes, "ref_shape_P8_pallas")
        except Exception as e:  # noqa: BLE001
            print(f"variant ref_shape_P8 failed: {e}", file=sys.stderr, flush=True)

    # Classic color-sweep D-ADMM at the reference's own P=5 shape (m=500, n=2000
    # global A row-partitioned across agents, `models.py:376-414` semantics) — the
    # "every component fast" row. iter/s counts outer D-ADMM iterations (each is a
    # full C-color Gauss-Seidel sweep + dual ascent).
    if time.monotonic() < deadline:
        try:
            from hyperparameter_gnn_unfolded_d_admm_main_tpu.models import classic
            from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import classic_data

            P5, KC, BC = 5, 24, 24
            Ag = classic_data.global_sensing_matrix(jax.random.key(20), 500, 2000)
            solver = classic.DADMMLASSOClassic(Ag, P5)
            adj5 = graphs.sample_connected_er(np.random.default_rng(21), 1, P5, 0.5)[0]
            sched = classic.make_color_schedule(adj5, np.random.default_rng(22))
            bC = jax.random.normal(jax.random.key(23), (BC, 500), jnp.float32)
            hyp5 = jnp.tile(jnp.asarray([0.2603, 0.3013, 0.1142, 0.0867]), (KC, P5, 1))
            run5 = jax.jit(lambda h, bb: solver.run(h, bb, sched)[0])
            X = run5(hyp5, bC)
            jax.block_until_ready(X)
            # Same implausible-window guard as every other variant (the tunnel's
            # early-return anomaly must not record an absurd classic iter/s):
            # one run can never be faster than writing X [BC, 2000] f32 to HBM.
            variants["classic_P5_color_sweep"] = time_loop(
                run5, (hyp5, bC), BC * 2000 * 4, "classic_P5_color_sweep",
                k_iters=KC)
        except Exception as e:  # noqa: BLE001
            print(f"variant classic_P5 failed: {e}", file=sys.stderr, flush=True)

    # Informational forward ablations (the full dtype/operand grid from r1/r2).
    for tag, kw in (
        ("xla_fp32_noguard", {"nan_guard": False}),
        ("xla_fp32", {}),
        ("xla_fp32_factored", {"gram_mode": "factored"}),
        # bf16 solver state: quality-gated serving mode — NMSE within a 0.5% gate of
        # f32 (0.08% measured) on the trained flagship checkpoint (PARITY.md,
        # tests/test_core.py).
        ("xla_bf16_state_factored",
         {"nan_guard": False, "gram_mode": "factored", "solver_dtype": "bfloat16"}),
        ("xla_bf16", {"matmul_dtype": "bfloat16"}),
        ("pallas_fp32", {"use_pallas": True}),
    ):
        if time.monotonic() > deadline:
            print(f"skipping {tag}: bench budget exhausted", file=sys.stderr, flush=True)
            continue
        try:
            variants[tag] = timed(tag, **kw)
        except Exception as e:  # noqa: BLE001 - extras must never kill the bench
            print(f"variant {tag} failed: {e}", file=sys.stderr, flush=True)

    # bf16 VMEM-resident full-unroll kernel at the headline shape (round 2):
    # exact on hardware (K=2 gate) but measured SLOWER than XLA — kept in the bench
    # as the recorded refutation (DESIGN.md section 3 has the phase ablation).
    if time.monotonic() < deadline:
        try:
            from hyperparameter_gnn_unfolded_d_admm_main_tpu.kernels import full_unroll

            deg = jnp.sum(adj, axis=-1)
            clipt = full_unroll.unfolded_clip_table(K)
            res_fn = jax.jit(lambda st, tb: full_unroll.fused_unroll_resident(
                A, st.y, st.U, st.delta, Atb, deg, adj, tb, clipt))
            print("compiling pallas_resident_bf16...", file=sys.stderr, flush=True)
            Yr = res_fn(state, table)
            jax.block_until_ready(Yr)
            g2 = jax.jit(lambda: full_unroll.fused_unroll_resident(
                A, state.y, state.U, state.delta, Atb, deg, adj, table[:2], clipt[:2]))()
            w2 = jax.jit(lambda: full_unroll._jnp_unroll_resident(
                A, state.y, state.U, state.delta, Atb, deg, adj, table[:2], clipt[:2]))()
            err = float(jnp.max(jnp.abs(g2.astype(jnp.float32) - w2.astype(jnp.float32)))
                        / (jnp.max(jnp.abs(w2.astype(jnp.float32))) + 1e-9))
            print(f"resident bf16 kernel K=2 parity rel err: {err:.2e}",
                  file=sys.stderr, flush=True)
            if err < 2e-2:
                variants["pallas_resident_bf16"] = time_loop(
                    res_fn, (state, table), Y_BYTES // 2, "pallas_resident_bf16")
        except Exception as e:  # noqa: BLE001
            print(f"variant pallas_resident_bf16 failed: {e}", file=sys.stderr, flush=True)

    variants = {k: v for k, v in variants.items() if v is not None}

    # (The Gram-streaming full-unroll kernel is deliberately NOT timed at P=64: its
    # per-batch-tile AtA re-stream makes it uncompetitive there by construction —
    # see kernels/full_unroll.py. The resident factored kernel above covers the
    # kernel story at the shape where residency applies.)
    return variants


def bench_torch_reference_style():
    """One D-ADMM iteration in the reference's implementation style (torch CPU,
    per-agent loop + per-edge consensus loop), same shapes; extrapolated to iter/s."""
    import torch

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops.graphs import sample_connected_er

    adj = sample_connected_er(rng, 1, P, GRAPH_PROB)[0]
    neighbors = [np.nonzero(adj[p])[0] for p in range(P)]
    AtA = torch.randn(P, N, N)
    Atb = torch.randn(B, P, N, 1)
    y = torch.randn(B, P, N, 1) * 1e-2
    U = torch.randn(B, P, N, 1) * 1e-2
    delta = torch.randn(B, P, N, 1) * 1e-2
    deg = torch.tensor(adj.sum(-1), dtype=torch.float32).view(1, P, 1, 1)
    alpha = tau = rho = eta = 0.05

    t0 = time.perf_counter()
    AtAy = torch.zeros((B, P, N, 1))
    for p in range(P):
        AtAy[:, p] = torch.matmul(AtA[p], y[:, p])
    grad = AtAy - Atb + y.sign() * tau + U * deg + delta * rho
    grad = torch.clamp(grad, -30.0, 30.0)
    y = torch.clamp(y - alpha * grad, -200.0, 200.0)
    new_delta = torch.zeros_like(y)
    for bb in range(B):
        for p in range(P):
            y_p = y[bb, p]
            for j in neighbors[p]:
                diff = y_p - y[bb, j]
                new_delta[bb, p] += diff
                new_delta[bb, j] -= diff
    U = torch.clamp(U + eta * new_delta, -200.0, 200.0)
    dt = time.perf_counter() - t0
    return 1.0 / dt, dt


# Hard cap on the final stdout line. The driver records only a ~2000-char tail of
# stdout and parses the LAST line; rounds 2 AND 3 lost the headline because the
# roofline dict embedded in that line pushed the front of the JSON out of the tail
# window (BENCH_r02/r03 `parsed: null`). Detail now goes to a file; the compact
# line must stay comfortably inside the window.
COMPACT_LINE_MAX = 1500


def build_records(variants, base_ips, baseline_source):
    """Split results into (compact_scoreboard_record, detail_record).

    The compact record is what main() prints as the LAST stdout line — guaranteed
    (tests/test_bench_format.py) to serialize under COMPACT_LINE_MAX chars even
    with the full 18-variant grid. The detail record (rooflines, notes, per-variant
    step times) is written to results_parity/bench_detail.json.
    """
    headline = {k: v for k, v in variants.items()
                if not k.startswith(("ref_shape", "train_", "classic", "gnn_", "ghyp"))}
    if not headline:  # every variant dropped (all-implausible timing): report honestly
        rec = {"metric": "dadmm_iter_per_sec_per_chip", "value": 0.0,
               "unit": "iter/s", "vs_baseline": 0.0,
               "error": "all timing windows violated the HBM plausibility bound"}
        return rec, {"variants_iter_per_sec": {}}
    best_name, (best_ips, _best_step) = max(headline.items(), key=lambda kv: kv[1][0])
    vips = {k: round(v[0], 2) for k, v in variants.items()}
    detail = {
        "rooflines": attach_rooflines(variants),
        "roofline_note": "bytes_per_iter is the analytic NO-FUSION upper bound "
                         "(8 state-tensor transfers + operand + adj); pct_hbm_peak "
                         ">100 means XLA elided a modeled transfer (e.g. aliasing "
                         "the carry write with the stacked-Y row), i.e. the "
                         "program beat the naive traffic model — not a timing "
                         "artifact (those are guarded separately)",
        "hw_peaks": {"hbm_gb_s": HBM_PEAK_GBS, "mxu_bf16_tflops": MXU_PEAK_BF16_TFLOPS,
                     "mxu_f32_tflops": MXU_PEAK_F32_TFLOPS},
        "sec_per_unroll": {k: round(v[1], 6) for k, v in variants.items()},
        "baseline": "reference-style torch CPU (per-agent loops + edge-loop consensus)",
        "baseline_source": baseline_source,
        "variants_iter_per_sec": vips,
        "headline": {"value": round(best_ips, 2), "variant": best_name,
                     "config": f"P={P} B={B} m={M} n={N} K={K} forward"},
    }
    record = {
        "metric": "dadmm_iter_per_sec_per_chip",
        "value": round(best_ips, 2),
        "unit": "iter/s",
        "vs_baseline": round(best_ips / base_ips, 2),
        "config": f"P={P} B={B} m={M} n={N} K={K} fwd best={best_name}",
        "variants_iter_per_sec": vips,
        "baseline_iter_per_sec": round(base_ips, 4),
        "baseline_source": baseline_source,
        "detail_file": "results_parity/bench_detail.json",
    }
    if len(json.dumps(record)) > COMPACT_LINE_MAX:
        # Last-resort trim: drop the slowest variants one at a time until the
        # serialized record actually fits (full set is in the detail file either
        # way). With current tag lengths this path is never taken —
        # tests/test_bench_format.py asserts the full grid fits.
        ranked = sorted(vips.items(), key=lambda kv: -kv[1])
        record["variants_trimmed"] = True
        while len(ranked) > 1:
            ranked.pop()
            record["variants_iter_per_sec"] = dict(ranked)
            if len(json.dumps(record)) <= COMPACT_LINE_MAX:
                break
    return record, detail


def main():
    import sys

    variants = bench_tpu()
    try:
        base_ips, _base_step = bench_torch_reference_style()
        baseline_source = "measured_this_run"
    except Exception as e:  # noqa: BLE001 - fall back to the recorded round-1 measurement
        print(f"CPU baseline measurement failed ({e}); using recorded round-1 "
              f"constant 0.0522", file=sys.stderr, flush=True)
        base_ips = 0.0522
        baseline_source = "fallback_round1_constant"
    record, detail = build_records(variants, base_ips, baseline_source)
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "results_parity", "bench_detail.json")
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
        print(f"detail written to {detail_path}", file=sys.stderr, flush=True)
    except OSError as e:
        print(f"could not write bench detail: {e}", file=sys.stderr, flush=True)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
