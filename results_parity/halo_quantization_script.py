"""Measured accuracy impact of the compressed halo wire formats (round 5).

The int8/bf16 `comm_dtype` levers in `parallel/halo.py:halo_neighbor_sum` trade
consensus exactness for wire bytes (the scaling projection's ER-expander rows:
bf16 38% -> int8 55% agent-axis efficiency at 2 ICI shards). This script measures
what that trade actually costs in solution quality: the K=25 table-tier unfolded
D-ADMM solve (hand-tuned classic hyperparameters, `configurations.py:73-86` of
the reference) at P=64 / degree ~12 on the 8-device virtual mesh, per wire
format, against ground truth (NMSE) and against the exact-wire sharded solve
(final-iterate deviation). Writes results_parity/halo_quantization.json.

Run: python results_parity/halo_quantization_script.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hyperparameter_gnn_unfolded_d_admm_main_tpu.models import dadmm_core  # noqa: E402
from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import (  # noqa: E402
    data as data_ops, graphs, sensing)
from hyperparameter_gnn_unfolded_d_admm_main_tpu.parallel import (  # noqa: E402
    halo, mesh as mesh_lib, unfolded_sharded)
from hyperparameter_gnn_unfolded_d_admm_main_tpu.train import losses  # noqa: E402

P_, m, n, K, B, S = 64, 100, 256, 25, 8, 4
# Constants hand-tuned (reference-style grid, `configurations.py:73-86` discipline)
# FOR THIS P=64 / degree~12 config — the published P=5 constants diverge here
# (dense NMSE ~18). This grid point solves to NMSE ~0.022 at K=25, so the wire
# comparison below measures quantization against a CONVERGING solver.
# [K, P, 4] layout is (alpha, tau, rho, eta).
TABLE = jnp.broadcast_to(
    jnp.asarray([0.01, 0.1, 0.26, 0.0867], jnp.float32), (K, P_, 4))


def run_family(kind: str) -> dict:
    A = sensing.set_A(jax.random.key(0), P_, m, n)
    AtA = sensing.gram(A)
    b, ytrue = data_ops.make_dataset(jax.random.key(2), A, B, noise=True)
    Atb = sensing.At_apply(A, b)
    rng = np.random.default_rng(7)
    if kind == "er":
        adj_np = graphs.sample_connected_er(rng, B, P_, 12 / (P_ - 1))
    else:
        adj_np = np.stack([graphs.sample_geometric(rng, P_, 0.26)
                           for _ in range(B)])
    state = dadmm_core.init_state(jax.random.key(1), B, P_, n)

    dense = dadmm_core.unroll_table(state, TABLE, AtA, Atb, jnp.asarray(adj_np))
    nmse_dense = float(losses.nmse(dense[-1], ytrue))

    perm = halo.greedy_equal_partition(adj_np, S)
    adj_p, = halo.permute_agents(perm, adj_np)
    topo = halo.build_halo(adj_p, S)
    pj = jnp.asarray(perm)
    state_p = dadmm_core.SolverState(
        y=state.y[:, pj], U=state.U[:, pj], delta=state.delta[:, pj])
    mesh = mesh_lib.make_mesh(2, S)
    inv = jnp.asarray(halo.inverse_perm(perm))

    out = {
        "graph": kind,
        "edge_cut": halo.edge_cut(adj_np, halo.inverse_perm(perm) // (P_ // S), S),
        "halo_rows": int(sum(topo.halo_sizes())),
        "ring_rows": (S - 1) * (P_ // S),
        "nmse_dense_f32": nmse_dense,
        "wire": {},
    }
    exact_final = None
    for comm_dtype, tag in ((None, "f32"), ("bfloat16", "bf16"), ("int8", "int8")):
        unroll = unfolded_sharded.make_sharded_unroll_halo(
            mesh, topo, gram_mode="gram", comm_dtype=comm_dtype)
        Y = unroll(state_p, TABLE, AtA[pj], Atb[:, pj], topo)
        final = np.asarray(Y[-1][:, inv])
        if exact_final is None:
            exact_final = final
        dtype_bytes, scale_b = {"f32": (4, 0), "bf16": (2, 0), "int8": (1, 4)}[tag]
        out["wire"][tag] = {
            "nmse": float(losses.nmse(jnp.asarray(final), ytrue)),
            "max_rel_dev_vs_exact_wire":
                float(np.abs(final - exact_final).max()
                      / max(np.abs(exact_final).max(), 1e-12)),
            "bytes_per_device_per_iter": halo.halo_bytes_per_device_per_iter(
                topo.halo_sizes(), B // 2, n, dtype_bytes, scale_b),
        }
    return out


def main():
    results = {"config": {"P": P_, "m": m, "n": n, "K": K, "B": B,
                          "agent_shards": S,
                          "table": "hand-tuned classic constants"},
               "families": [run_family(k) for k in ("er", "geometric")]}
    for fam in results["families"]:
        f32, i8 = fam["wire"]["f32"], fam["wire"]["int8"]
        fam["nmse_rel_change_int8_vs_f32"] = (
            (i8["nmse"] - f32["nmse"]) / max(abs(f32["nmse"]), 1e-12))
        fam["bytes_ratio_int8_vs_f32"] = (
            i8["bytes_per_device_per_iter"] / f32["bytes_per_device_per_iter"])
    out = os.path.join(os.path.dirname(__file__), "halo_quantization.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
