"""Multi-host (multi-process) data-parallel training demo.

The multi-chip tests exercise a single-process mesh; this driver demonstrates the real
multi-controller path the framework uses across TPU hosts: every process calls
`jax.distributed.initialize`, builds the SAME global (data, agents) mesh, assembles its
process-local batch shard into global arrays (`make_array_from_process_local_data`),
and runs the GSPMD training step — gradients reduce across processes (DCN on real pods,
gloo on the CPU demo). Loss comes back identical on every process.

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
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..config import Config
    from ..models.gnn_hypernet import DLASSOGNNHyp
    from ..ops import data as data_ops, graphs, sensing
    from ..parallel import mesh as mesh_lib, shard_step
    from ..train import optim

    n_global = jax.device_count()
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
    params, norm_state, opt_state = replicate((params, norm_state, opt_state))
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
        params, norm_state, opt_state, lm, lf = train_step(
            params, norm_state, opt_state, key, (b, y, adj), cfg.GHN_iter_num
        )
    print(f"[proc {process_id}/{num_processes}] global devices={n_global} "
          f"steps={steps} loss_final={float(lf):.6f}", flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--process_id", type=int, default=0)
    ap.add_argument("--num_processes", type=int, default=2)
    ap.add_argument("--coordinator", type=str, default="127.0.0.1:9911")
    ap.add_argument("--local_devices", type=int, default=2)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args(argv)

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
    losses = []
    for i, o in enumerate(outs):
        line = [l for l in o.splitlines() if l.startswith("[proc")]
        print(line[-1] if line else f"[proc {i}] FAILED:\n{o[-800:]}")
        if line:
            losses.append(line[-1].rsplit("=", 1)[-1])
    if ok and len(set(losses)) == 1:
        print(f"multihost demo OK: {args.num_processes} processes agree on loss {losses[0]}")
        return 0
    print("multihost demo FAILED")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
