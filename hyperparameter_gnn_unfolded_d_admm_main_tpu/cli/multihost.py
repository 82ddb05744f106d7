"""Multi-host (multi-process) training demo — including DCN-crossing consensus.

The multi-chip tests exercise a single-process mesh; this driver demonstrates the real
multi-controller path the framework uses across TPU hosts: every process calls
`jax.distributed.initialize`, builds the SAME global (data, agents) mesh, and runs
three phases (gloo CPU collectives here; DCN/ICI on real pods):

1. `dp` — data-parallel GSPMD flagship training: per-process local batch shards
   assembled into global arrays (`make_array_from_process_local_data`), gradients
   reduce across processes, loss identical on every process.
2. `packed` — THE north-star path (BASELINE.md "P=1024 agents sharded across >=2
   hosts, collective consensus exchange"): the mesh is built TRANSPOSED so the
   `agents` axis spans the process boundary (verified via `device.process_index`),
   and the packed ppermute ring unroll (`parallel/unfolded_sharded.py
   make_sharded_unroll_packed`) carries every consensus edge between processes.
   Output is checked shard-by-shard against a locally computed dense single-device
   unroll (reference semantics: `unfolded_DLASSO.py:127-140` neighbor exchange).
3. `flagship` — the GSPMD GNN-hypernetwork train step on the same agents-across-
   processes mesh; the pre-update loss is checked against a locally computed dense
   forward on identical params/batch/key.
4. `dlr` — the second problem family: the sharded dlr unroll's collective
   neighbor sums cross the same process boundary, checked against the local
   dense unroll.
5. `halo` — the round-5 edge-cut halo schedule (`parallel/halo.py`): agents are
   partitioned to minimize cross-shard edges and only boundary rows cross the
   process boundary (offset-t ppermutes), checked against the local dense unroll;
   then repeated with the int8 wire format (`halo_int8` — per-row max-abs
   quantized boundary rows, checked within quantization tolerance).

Run as a self-launcher (spawns N local worker processes, CPU backend):

    python -m hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.multihost --num_processes 2

or as a worker on real hosts (one invocation per host):

    python -m ...cli.multihost --worker --process_id 0 --num_processes 4 \
        --coordinator host0:9911
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def _make_global(np_arr, sharding):
    """Global array from an identical-on-every-process numpy array."""
    import jax

    return jax.make_array_from_callback(np_arr.shape, sharding, lambda idx: np_arr[idx])


def worker(process_id: int, num_processes: int, coordinator: str,
           local_devices: int = 2, steps: int = 3) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

    from ..config import Config
    from ..models import dadmm_core, seq_hyperparam
    from ..models.gnn_hypernet import DLASSOGNNHyp
    from ..ops import data as data_ops, graphs, sensing, topology as topo_lib
    from ..parallel import mesh as mesh_lib, shard_step, unfolded_sharded
    from ..train import losses as loss_lib, optim

    n_global = jax.device_count()
    tag = f"[proc {process_id}/{num_processes}]"

    # Up-front shape validation (phases 2-3 hard-code Pa=8 agents): failing here
    # gives an explanatory error instead of an opaque shard_map mismatch deep in
    # the transposed-mesh phases (e.g. --num_processes 3).
    _PA_DEMO = 8
    if _PA_DEMO % num_processes or n_global % num_processes:
        raise RuntimeError(
            f"multihost demo needs num_processes to divide both the demo agent "
            f"count ({_PA_DEMO}) and the global device count ({n_global} = "
            f"num_processes * local_devices): num_processes in (1, 2, 4, 8) with "
            f"the default --local_devices 2; got num_processes={num_processes}")

    # ---------------- phase 1: data-parallel training (agents=1) ----------------
    mesh = mesh_lib.make_mesh(data=n_global, agents=1)
    cfg = Config(P=5, m=8, n=16, GHyp_hidden=4, GHN_iter_num=2,
                 batch_size=2 * n_global, lr=1e-3)

    # Identical seeds everywhere -> identical params; replicate across the mesh.
    A = sensing.set_A(jax.random.key(0), cfg.P, cfg.m, cfg.n)
    model = DLASSOGNNHyp(A, cfg)
    params, norm_state = model.init(jax.random.key(1))
    tx = optim.make_optimizer("adamw", cfg.lr, weight_decay=1e-5, clip_norm=100.0)
    opt_state = tx.init(params)

    repl = mesh_lib.sharding(mesh)
    replicate = lambda tree: jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)), tree
    )
    r_params, r_norm, r_opt = replicate((params, norm_state, opt_state))
    key = jax.make_array_from_process_local_data(
        repl, np.asarray(jax.random.key_data(jax.random.key(3)))
    )
    key = jax.random.wrap_key_data(key)

    # Per-process local batch shard -> global arrays sharded over 'data'.
    local_B = cfg.batch_size // num_processes
    b_loc, y_loc = data_ops.make_dataset(jax.random.key(100 + process_id), A, local_B,
                                         snr=cfg.snr)
    adj_loc = graphs.sample_connected_er(
        np.random.default_rng(200 + process_id), local_B, cfg.P, cfg.graph_prob
    )
    s_bpa = mesh_lib.sharding(mesh, mesh_lib.DATA_AXIS, mesh_lib.AGENT_AXIS)
    s_b = mesh_lib.sharding(mesh, mesh_lib.DATA_AXIS)
    b = jax.make_array_from_process_local_data(s_bpa, np.asarray(b_loc))
    y = jax.make_array_from_process_local_data(s_b, np.asarray(y_loc))
    adj = jax.make_array_from_process_local_data(s_bpa, np.asarray(adj_loc))

    train_step = shard_step.make_gnn_train_step(mesh, model, tx)
    lf = None
    for step in range(steps):
        r_params, r_norm, r_opt, lm, lf = train_step(
            r_params, r_norm, r_opt, key, (b, y, adj), cfg.GHN_iter_num
        )
    print(f"{tag} phase=dp global_devices={n_global} steps={steps} "
          f"loss_final={float(lf):.6f}", flush=True)

    # ------- phases 2+3: agents axis ACROSS the process boundary -------
    # Transposed mesh: jax.devices() orders by process, so reshape(agents, data).T
    # puts consecutive processes along the AGENTS axis — every consensus collective
    # (the packed ppermute ring, the GSPMD all-gathers) crosses processes.
    dev = np.asarray(jax.devices()).reshape(num_processes, n_global // num_processes).T
    xmesh = Mesh(dev, (mesh_lib.DATA_AXIS, mesh_lib.AGENT_AXIS))
    agent_procs = sorted({d.process_index for d in dev[0, :]})
    if len(agent_procs) != num_processes:
        raise RuntimeError(f"agents axis does not span processes: {agent_procs}")

    # -- phase 2: packed ppermute table-tier unroll, checked vs local dense --
    Pa, na, ma, Ba, Ka = 8, 32, 16, 4, 3
    s_agents = num_processes
    rng = np.random.default_rng(7)
    A_np = (rng.standard_normal((Pa, ma, na)) / np.sqrt(ma)).astype(np.float32)
    Atb_np = rng.standard_normal((Ba, Pa, na)).astype(np.float32)
    st_np = dadmm_core.SolverState(
        y=(1e-2 * rng.standard_normal((Ba, Pa, na))).astype(np.float32),
        U=(1e-2 * rng.standard_normal((Ba, Pa, na))).astype(np.float32),
        delta=(1e-2 * rng.standard_normal((Ba, Pa, na))).astype(np.float32),
    )
    adj_np = graphs.sample_connected_er(np.random.default_rng(8), Ba, Pa, 0.5)
    table_np = np.asarray(seq_hyperparam.hyp_table(
        0.05 * jnp.ones((Ka, Pa, 4), jnp.float32), jnp.asarray([0.1, 0.99, 0.99, 0.99])
    ))
    packed_np = jax.tree_util.tree_map(
        np.asarray, topo_lib.pack_adjacency_sharded(adj_np, s_agents)
    )

    sh_bpa = NamedSharding(xmesh, PS(mesh_lib.DATA_AXIS, mesh_lib.AGENT_AXIS))
    sh_ka = NamedSharding(xmesh, PS(None, mesh_lib.AGENT_AXIS))
    sh_a = NamedSharding(xmesh, PS(mesh_lib.AGENT_AXIS))
    g_state = dadmm_core.SolverState(*(_make_global(x, sh_bpa) for x in st_np))
    g_table = _make_global(table_np, sh_ka)
    g_A = _make_global(A_np, sh_a)
    g_Atb = _make_global(Atb_np, sh_bpa)
    g_packed = topo_lib.ShardedPackedTopology(
        nbr_shard=_make_global(packed_np.nbr_shard, sh_bpa),
        nbr_local=_make_global(packed_np.nbr_local, sh_bpa),
        mask=_make_global(packed_np.mask, sh_bpa),
        deg=_make_global(packed_np.deg, sh_bpa),
    )
    unroll = unfolded_sharded.make_sharded_unroll_packed(
        xmesh, schedule="ppermute", gram_mode="factored", remat=False
    )
    Y = unroll(g_state, g_table, g_A, g_Atb, g_packed)

    # Local dense reference (every process has the full numpy inputs).
    Y_ref = np.asarray(dadmm_core.unroll_table(
        dadmm_core.SolverState(*(jnp.asarray(x) for x in st_np)),
        jnp.asarray(table_np), None, jnp.asarray(Atb_np), jnp.asarray(adj_np),
        A=jnp.asarray(A_np), gram_mode="factored", remat=False,
    ))
    scale = np.max(np.abs(Y_ref)) + 1e-9
    max_err = max(
        float(np.max(np.abs(np.asarray(sh.data) - Y_ref[sh.index]))) / scale
        for sh in Y.addressable_shards
    )
    if max_err > 1e-4:
        raise RuntimeError(f"packed cross-process consensus mismatch: {max_err:.2e}")
    print(f"{tag} phase=packed agents_procs={agent_procs} P={Pa} shards={s_agents} "
          f"max_rel_err={max_err:.2e}", flush=True)

    # -- phase 3: GSPMD flagship train step with agents spanning processes --
    cfg8 = Config(P=8, m=8, n=16, GHyp_hidden=4, GHN_iter_num=2, batch_size=4, lr=1e-3)
    A8 = sensing.set_A(jax.random.key(50), cfg8.P, cfg8.m, cfg8.n)
    model8 = DLASSOGNNHyp(A8, cfg8)
    params8, norm8 = model8.init(jax.random.key(51))
    tx8 = optim.make_optimizer("adamw", cfg8.lr, weight_decay=1e-5, clip_norm=100.0)
    opt8 = tx8.init(params8)
    b8_l, y8_l = data_ops.make_dataset(jax.random.key(52), A8, cfg8.batch_size,
                                       snr=cfg8.snr)
    adj8_np = graphs.sample_connected_er(
        np.random.default_rng(53), cfg8.batch_size, cfg8.P, cfg8.graph_prob
    )
    key8 = jax.random.key(54)

    xrepl = NamedSharding(xmesh, PS())
    xreplicate = lambda tree: jax.tree_util.tree_map(
        lambda x: _make_global(np.asarray(x), xrepl), tree
    )
    x_params, x_norm, x_opt = xreplicate((params8, norm8, opt8))
    x_key = jax.random.wrap_key_data(
        _make_global(np.asarray(jax.random.key_data(key8)), xrepl)
    )
    xb = _make_global(np.asarray(b8_l), sh_bpa)
    xy = _make_global(np.asarray(y8_l), NamedSharding(xmesh, PS(mesh_lib.DATA_AXIS)))
    xadj = _make_global(adj8_np.astype(np.float32), sh_bpa)
    xstep = shard_step.make_gnn_train_step(xmesh, model8, tx8)
    _, _, _, lm8, lf8 = xstep(x_params, x_norm, x_opt, x_key, (xb, xy, xadj),
                              cfg8.GHN_iter_num)
    lf8 = float(lf8)

    # Local dense forward on identical params/batch/key (partitionable threefry
    # makes the dropout draw sharding-invariant, so values must agree).
    out_l = model8.apply(params8, norm8, key8, b8_l, jnp.asarray(adj8_np),
                         training_iterations=cfg8.GHN_iter_num, training=True)
    _, lf_ref = loss_lib.compute_loss(out_l.Y, y8_l)
    rel = abs(lf8 - float(lf_ref)) / (abs(float(lf_ref)) + 1e-12)
    if rel > 1e-3:
        raise RuntimeError(
            f"flagship cross-process loss mismatch: {lf8} vs {float(lf_ref)}")
    print(f"{tag} phase=flagship agents_procs={agent_procs} loss_final={lf8:.6f} "
          f"local_dense={float(lf_ref):.6f} rel_err={rel:.2e}", flush=True)

    # -- phase 4: dlr family (beyond-reference) with agents across processes --
    # The collective neighbor sums of the sharded dlr unroll ride the same
    # transposed mesh, so every sum_N(a)/sum_N(w) exchange crosses a process
    # boundary; checked against the local dense unroll.
    from ..models import unfolded_dlr

    d_feat, Bd, Kd = 4, 4, 3
    rng_d = np.random.default_rng(60)
    x_np = rng_d.standard_normal((Bd, Pa, d_feat)).astype(np.float32)
    yd_np = rng_d.standard_normal((Bd, Pa, 1)).astype(np.float32)
    adjd_np = graphs.sample_connected_er(np.random.default_rng(61), Bd, Pa, 0.5)
    hyp6_np = 0.05 * np.ones((Kd, Pa, 6), np.float32)
    std_np = unfolded_dlr.init_state(jax.random.key(62), Bd, Pa, d_feat)
    _, per_ref = unfolded_dlr.unroll_table(
        unfolded_dlr.DLRState(*(jnp.asarray(np.asarray(v)) for v in std_np)),
        jnp.asarray(hyp6_np), jnp.asarray(x_np), jnp.asarray(yd_np),
        jnp.asarray(adjd_np))
    per_ref = np.asarray(per_ref)

    sh_bpaN = NamedSharding(xmesh, PS(mesh_lib.DATA_AXIS, mesh_lib.AGENT_AXIS, None))
    g_std = unfolded_dlr.DLRState(
        *(_make_global(np.asarray(v), sh_bpa) for v in std_np))
    unroll_dlr = unfolded_sharded.make_sharded_dlr_unroll(xmesh, schedule="ppermute")
    _, per_sh = unroll_dlr(g_std, _make_global(hyp6_np, sh_ka),
                           _make_global(x_np, sh_bpa),
                           _make_global(yd_np, sh_bpa),
                           _make_global(adjd_np.astype(np.float32), sh_bpaN))
    per_sh = np.asarray(jax.device_get(per_sh))
    rel_d = float(np.max(np.abs(per_sh - per_ref)) / (np.max(np.abs(per_ref)) + 1e-9))
    if rel_d > 1e-4:
        raise RuntimeError(f"dlr cross-process neighbor-sum mismatch: {rel_d:.2e}")
    print(f"{tag} phase=dlr agents_procs={agent_procs} max_rel_err={rel_d:.2e}",
          flush=True)

    # -- phase 5: edge-cut HALO exchange across the process boundary (round 5,
    # parallel/halo.py): partition the phase-2 problem's agents, ship only
    # boundary rows between processes, un-permute, check vs the local dense
    # unroll. The offset-t ppermutes here cross REAL process boundaries.
    from ..parallel import halo as halo_lib

    perm = halo_lib.greedy_equal_partition(adj_np, s_agents)
    adj_p, = halo_lib.permute_agents(perm, adj_np)
    halo_topo_np = jax.tree_util.tree_map(
        np.asarray, halo_lib.build_halo(adj_p, s_agents))
    g_halo = halo_lib.HaloTopology(
        send_idx=tuple(_make_global(x, sh_bpaN) for x in halo_topo_np.send_idx),
        nbr_buf=_make_global(halo_topo_np.nbr_buf, sh_bpaN),
        mask=_make_global(halo_topo_np.mask, sh_bpaN),
        deg=_make_global(halo_topo_np.deg, sh_bpa),
    )
    g_state_p = dadmm_core.SolverState(
        *(_make_global(np.asarray(x)[:, perm], sh_bpa) for x in st_np))
    unroll_halo = unfolded_sharded.make_sharded_unroll_halo(
        xmesh, halo_topo_np, gram_mode="factored", remat=False)
    Yh = unroll_halo(g_state_p, _make_global(table_np[:, perm], sh_ka),
                     _make_global(A_np[perm], sh_a),
                     _make_global(Atb_np[:, perm], sh_bpa), g_halo)
    Y_ref_p = Y_ref[:, :, perm]          # reference in partition order
    max_err_h = max(
        float(np.max(np.abs(np.asarray(sh.data) - Y_ref_p[sh.index]))) / scale
        for sh in Yh.addressable_shards
    )
    if max_err_h > 1e-4:
        raise RuntimeError(f"halo cross-process consensus mismatch: {max_err_h:.2e}")
    print(f"{tag} phase=halo agents_procs={agent_procs} "
          f"halo_rows={sum(halo_topo_np.halo_sizes())} "
          f"ring_rows={(s_agents - 1) * (Pa // s_agents)} "
          f"max_rel_err={max_err_h:.2e}", flush=True)

    # int8 wire format on the same halo exchange (round 5, inexact consensus:
    # per-row max-abs quantized boundary rows; tolerance is quantization-scale,
    # not float-rounding-scale).
    unroll_halo8 = unfolded_sharded.make_sharded_unroll_halo(
        xmesh, halo_topo_np, gram_mode="factored", remat=False,
        comm_dtype="int8")
    Yh8 = unroll_halo8(g_state_p, _make_global(table_np[:, perm], sh_ka),
                       _make_global(A_np[perm], sh_a),
                       _make_global(Atb_np[:, perm], sh_bpa), g_halo)
    max_err_h8 = max(
        float(np.max(np.abs(np.asarray(sh.data) - Y_ref_p[sh.index]))) / scale
        for sh in Yh8.addressable_shards
    )
    if max_err_h8 > 6e-2:
        raise RuntimeError(f"int8 halo wire mismatch: {max_err_h8:.2e}")
    print(f"{tag} phase=halo_int8 agents_procs={agent_procs} "
          f"max_rel_err={max_err_h8:.2e}", flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--process_id", type=int, default=0)
    ap.add_argument("--num_processes", type=int, default=2)
    ap.add_argument("--coordinator", type=str, default="127.0.0.1:9911")
    ap.add_argument("--local_devices", type=int, default=2)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args(argv)

    if 8 % args.num_processes:
        # Same validation as worker(), but before spawning N subprocesses.
        print(f"--num_processes must divide the demo agent count 8 "
              f"(1, 2, 4 or 8); got {args.num_processes}", file=sys.stderr)
        return 2

    if args.worker:
        worker(args.process_id, args.num_processes, args.coordinator,
               args.local_devices, args.steps)
        return 0

    procs = [
        subprocess.Popen(
            [sys.executable, "-m",
             "hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.multihost",
             "--worker", "--process_id", str(i),
             "--num_processes", str(args.num_processes),
             "--coordinator", args.coordinator,
             "--local_devices", str(args.local_devices),
             "--steps", str(args.steps)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(args.num_processes)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    ok = all(p.returncode == 0 for p in procs)
    phases = {"dp": [], "packed": [], "flagship": [], "dlr": [], "halo": [],
              "halo_int8": []}
    for i, o in enumerate(outs):
        lines = [l for l in o.splitlines() if l.startswith("[proc")]
        for l in lines:
            print(l)
        if not lines:
            print(f"[proc {i}] FAILED:\n{o[-1200:]}")
        for l in lines:
            for ph in phases:
                if f" phase={ph} " in l:
                    phases[ph].append(l.split("loss_final=")[-1].split()[0]
                                      if "loss_final=" in l else l.split()[-1])
    complete = all(len(v) == args.num_processes for v in phases.values())
    agree = all(len(set(v)) == 1 for ph, v in phases.items()
                if ph not in ("packed", "dlr", "halo",
                              "halo_int8"))  # per-proc error phases
    if ok and complete and agree:
        print(f"multihost demo OK: {args.num_processes} processes, agents axis "
              f"across the process boundary (packed ppermute + GSPMD flagship "
              f"+ dlr neighbor sums + edge-cut halo exchange), losses agree")
        return 0
    print("multihost demo FAILED")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
