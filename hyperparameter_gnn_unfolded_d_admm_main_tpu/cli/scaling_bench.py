"""Scaling benchmark: D-ADMM iterations/sec across mesh shapes.

Measures the sharded unfolded solver (shard_map + collective consensus) at a ladder of
(data, agents) mesh shapes on the available devices and reports iterations/sec and
scaling efficiency vs the single-device run — the BASELINE.md north-star harness
(">=80% iterations/s scaling efficiency"). On a single real chip this degenerates to
the 1-device row; run with `--device cpu` to exercise the 8-way virtual mesh, or on a
pod slice for real numbers.

    python -m hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.scaling_bench \
        --device cpu --P 64 --batch_size 32 --n 512 --GHN_iter_num 15
"""

import time

import numpy as np

from ..config import args_parser
from ..utils.platform import select_device


def main(argv=None):
    cfg = args_parser(argv)
    select_device(cfg.device, host_device_count=8 if cfg.device == "cpu" else None)

    import jax
    import jax.numpy as jnp
    from ..models import dadmm_core, seq_hyperparam
    from ..ops import graphs, sensing
    from ..parallel import mesh as mesh_lib, unfolded_sharded

    devices = jax.devices()
    P, B, n, K = cfg.P, cfg.batch_size, cfg.n, cfg.GHN_iter_num
    A = jax.random.normal(jax.random.key(0), (P, cfg.m, n), jnp.float32) / np.sqrt(cfg.m)
    AtA = sensing.gram(A)
    b = jax.random.normal(jax.random.key(1), (B, P, cfg.m), jnp.float32)
    Atb = sensing.At_apply(A, b)
    adj = jnp.asarray(graphs.fast_sample_connected_er(0, B, P, cfg.graph_prob))
    state = dadmm_core.init_state(jax.random.key(2), B, P, n)
    table = seq_hyperparam.hyp_table(
        0.05 * jnp.ones((K, P, 4), jnp.float32), jnp.asarray([0.1, 0.99, 0.99, 0.99])
    )

    shapes = []
    n_dev = len(devices)
    d = 1
    while d <= n_dev:
        for agents in (d, 1):
            data = d // agents
            if data * agents == d and P % agents == 0 and B % data == 0:
                shapes.append((data, agents))
        d *= 2
    shapes = sorted(set(shapes))

    results = []
    for data, agents in shapes:
        mesh = mesh_lib.make_mesh(data=data, agents=agents)
        for schedule in ("allgather", "ppermute"):
            unroll = unfolded_sharded.make_sharded_unroll(mesh, schedule=schedule, remat=False)
            Y = unroll(state, table, AtA, Atb, adj)
            jax.block_until_ready(Y)
            reps = 20
            t0 = time.perf_counter()
            for _ in range(reps):
                Y = unroll(state, table, AtA, Atb, adj)
            jax.block_until_ready(Y)
            ips = reps * K / (time.perf_counter() - t0)
            results.append(((data, agents), schedule, ips))
            print(f"mesh data={data} agents={agents} [{schedule:9s}]  {ips:10.1f} iter/s")

    if results:
        base = results[0][2]
        best = max(results, key=lambda r: r[2])
        n_best = best[0][0] * best[0][1]
        eff = best[2] / (base * n_best) if n_best else 0.0
        print(f"\nbest: mesh={best[0]} [{best[1]}] {best[2]:.1f} iter/s | "
              f"scaling efficiency vs 1 device: {100 * eff:.1f}%")
    return results


if __name__ == "__main__":
    main()
