"""Driver: inference/evaluation from a saved checkpoint.

The reference's "serving" path is `dlasso.py --eval` — load learned hyperparameters,
run the solver on a test batch, save the per-iteration loss curve (`dlasso.py:41-50`).
This driver generalizes that to both trained model families: point it at a run
directory produced by `unfolded_train_new` or `gnn_progressive`, and it reloads the
checkpoint (`best/` by default), regenerates eval data from the run's config + saved A,
and reports the loss-vs-iteration convergence curve, final loss, and NMSE.

    python -m hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.evaluate \
        results/20260817_..._unfolded_new [--ckpt last] [--device cpu] [--dtype bfloat16] \
        [--gram_mode factored] [--mesh_data D --mesh_agents A]

`--dtype bfloat16` serves the solver with a bf16 state (half the HBM state traffic;
NMSE within a 0.5% gate of f32 on the trained flagship, 0.08% measured — PARITY.md). `--mesh_data/--mesh_agents`
(unfolded family) shard batch serving over a device mesh with collective consensus;
the GNN family (GHyp/GHyp1/GHyp1c runs) shards the data axis (`--mesh_data N`).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("usage: evaluate <run_dir> [--ckpt best|last] [--device cpu] "
              "[--test_size N] [--dtype bfloat16] [--compile_cache DIR]")
        return {}
    run_dir = argv[0]
    opts = dict(zip(argv[1::2], argv[2::2]))
    ckpt_name = opts.get("--ckpt", "best")

    with open(os.path.join(run_dir, "args.json")) as f:
        cfg_dict = json.load(f)

    from ..config import Config
    from ..utils.platform import enable_compile_cache, select_device

    if "--compile_cache" in opts:
        enable_compile_cache(opts["--compile_cache"])

    cfg = Config.from_json(json.dumps(cfg_dict))
    if "--dtype" in opts:
        cfg = cfg.replace(dtype=opts["--dtype"])
    if "--gram_mode" in opts:
        cfg = cfg.replace(gram_mode=opts["--gram_mode"])
    if "--mesh_data" in opts or "--mesh_agents" in opts:
        cfg = cfg.replace(
            mesh_data=int(opts.get("--mesh_data", cfg.mesh_data)),
            mesh_agents=int(opts.get("--mesh_agents", cfg.mesh_agents)),
        )
    n_mesh = cfg.mesh_data * cfg.mesh_agents
    select_device(opts.get("--device", cfg.device),
                  host_device_count=n_mesh if n_mesh > 1 else None)
    test_size = int(opts.get("--test_size", cfg.test_size))

    import jax
    import jax.numpy as jnp
    from ..models.gnn_hypernet import (DLASSOGNNHyp, DLASSOGNNHypOneShot,
                                       DLASSOGNNHypOneShotCorrected)
    from ..models.unfolded import UnfoldedDLASSO
    from ..ops import data as data_ops, graphs
    from ..train import losses
    from ..utils import checkpoint as ckpt

    # Family dispatch: args.json's `case` (recorded by the dlr loop); directory-name
    # suffix kept as a fallback for run dirs saved before `case` was recorded.
    if cfg.case == "dlr" or os.path.basename(os.path.normpath(run_dir)).endswith("unfolded_dlr"):
        # dlr family: no sensing matrix; regenerate regression data from the config.
        if cfg.mesh_data * cfg.mesh_agents > 1 or cfg.dtype != "float32":
            print("note: dlr evaluation currently serves dense float32 — "
                  "--mesh_data/--mesh_agents/--dtype are ignored for this family",
                  file=sys.stderr)
        from ..models.unfolded_dlr import (DLRGNNHyp, DLRGNNHypOneShot,
                                           DLRGNNHypOneShotCorrected, UnfoldedDLR)

        key = jax.random.key(int(cfg.seed) + 12345)
        k_data, k_state = jax.random.split(key)
        x, yt = data_ops.make_dlr_dataset(k_data, cfg.P, test_size, cfg.n,
                                          cfg.snr, noise=cfg.data_noise)
        rng_g = np.random.default_rng(int(cfg.seed))
        one = graphs.sample_er_adjacency(rng_g, cfg.P, cfg.graph_prob)
        adj = jnp.broadcast_to(jnp.asarray(one), (test_size, cfg.P, cfg.P))
        if cfg.hyp_mode == "GHyp":
            model = DLRGNNHyp(cfg.P, cfg.n, cfg)
            params, norm_state = model.init(jax.random.key(0))
            tree, meta = ckpt.restore_partial(
                os.path.join(run_dir, ckpt_name),
                {"params": params, "norm_state": norm_state})
            per_kp, _ = model.apply_losses(tree["params"], tree["norm_state"],
                                           k_state, x, yt, adj, training=False)
        else:
            model_cls = {"GHyp1": DLRGNNHypOneShot,
                         "GHyp1c": DLRGNNHypOneShotCorrected}.get(cfg.hyp_mode,
                                                                  UnfoldedDLR)
            model = model_cls(cfg.P, cfg.n, cfg)
            params = model.init()
            tree, meta = ckpt.restore_partial(
                os.path.join(run_dir, ckpt_name), {"params": params})
            per_kp, _ = model.apply_losses(tree["params"], k_state, x, yt, adj,
                                           training=True)
        curve = np.asarray(jnp.mean(per_kp, axis=1))
        np.save(os.path.join(run_dir, f"eval_loss_curve_{ckpt_name}.npy"), curve)
        print("per-iteration loss curve (dlr):")
        for k, v in enumerate(curve):
            print(f"  k={k + 1:3d}  loss={v:.6f}")
        print(f"final-layer loss: {curve[-1]:.6f} (ckpt: {ckpt_name}, "
              f"epoch {meta.get('epoch') if meta else '?'})")
        return {"loss_curve": curve, "final_loss": float(curve[-1])}

    A = jnp.asarray(np.load(os.path.join(run_dir, "A.npy")))
    key = jax.random.key(int(cfg.seed) + 12345)
    k_data, k_state = jax.random.split(key)
    b, y = data_ops.make_dataset(k_data, A, test_size, cfg.snr, noise=cfg.data_noise)

    # GNN-family detection: the progressive loop records its tier in args.json
    # (hyp_mode 'GHyp' = state-conditioned flagship, 'GHyp1' = one-shot table);
    # directory-name suffix kept as a fallback for runs saved before that.
    is_gnn = cfg.hyp_mode in ("GHyp", "GHyp1", "GHyp1c") or os.path.basename(
        os.path.normpath(run_dir)).endswith("progressive")
    if is_gnn or getattr(cfg, "graph_mode", "fixed") == "fresh":
        # GNN runs — and scalar-table runs trained with --graph_mode fresh — train on
        # fresh per-sample connected graphs; evaluate likewise.
        adj = jnp.asarray(
            graphs.fast_sample_connected_er(int(cfg.seed) + 7, test_size, cfg.P,
                                            max(cfg.graph_prob, getattr(cfg, 'graph_prob_floor', 0.3)))
        )
    elif os.path.exists(os.path.join(run_dir, "graph.npy")):
        # Explicit topology saved with the run — written by `cli.import_torch
        # --recover_graph` for runs migrated from the reference framework (which never
        # saves its unseeded training graph, `unfolded_train_new.py:56`).
        one = np.load(os.path.join(run_dir, "graph.npy"))
        adj = jnp.broadcast_to(jnp.asarray(one), (test_size, cfg.P, cfg.P))
    else:
        # Scalar-table runs train against ONE fixed graph (train/loop.py
        # _fixed_graph_batch); the learned table is specific to that Laplacian, so
        # evaluation must reconstruct the same topology from the run's seed.
        rng_g = np.random.default_rng(int(cfg.seed))
        one = graphs.sample_er_adjacency(rng_g, cfg.P, cfg.graph_prob)
        adj = jnp.broadcast_to(jnp.asarray(one), (test_size, cfg.P, cfg.P))
    ckpt_dir = os.path.join(run_dir, ckpt_name)
    if is_gnn:
        model_cls = {"GHyp1": DLASSOGNNHypOneShot,
                     "GHyp1c": DLASSOGNNHypOneShotCorrected}.get(cfg.hyp_mode, DLASSOGNNHyp)
        model = model_cls(A, cfg)
        params, norm_state = model.init(jax.random.key(0))
        tree, meta = ckpt.restore_partial(
            ckpt_dir, {"params": params, "norm_state": norm_state}
        )
        apply = lambda p, s, k, b_, adj_: model.apply(p, s, k, b_, adj_,
                                                      training=False).Y
        if n_mesh > 1:
            # Multi-chip GNN-family serving: in eval mode the hypernetwork forward is
            # purely per-sample (norm layers read running stats, no cross-sample op),
            # so batch inference shards cleanly over a data mesh — GSPMD propagates
            # the input sharding through encoder, decoder, and the D-ADMM scan.
            # Agent-axis sharding would put collectives inside the GCN layers and is
            # an unfolded-family-only feature for now.
            from jax.sharding import NamedSharding, PartitionSpec
            from ..parallel import mesh as mesh_lib

            if cfg.mesh_agents > 1:
                # Agent-axis GNN-family serving (round 2): possible for the
                # flagship with the two agent-local choices — gcn encoder +
                # nodewise head — via the explicit packed-ring schedule.
                if (cfg.hyp_mode != "GHyp" or cfg.encoder_type != "gcn"
                        or cfg.decoder_type != "nodewise"):
                    raise SystemExit(
                        "--mesh_agents > 1 for the GNN family needs the flagship "
                        "tier with --encoder_type gcn --decoder_type nodewise "
                        "(parallel/gnn_sharded.py); other tiers/heads consume "
                        "global tensors — use --mesh_data N --mesh_agents 1")
                if test_size % cfg.mesh_data or cfg.P % cfg.mesh_agents:
                    raise SystemExit(
                        f"sharded serving needs test_size ({test_size}) divisible "
                        f"by mesh_data ({cfg.mesh_data}) and P ({cfg.P}) by "
                        f"mesh_agents ({cfg.mesh_agents})")
                from ..models import dadmm_core
                from ..parallel import gnn_sharded

                mesh = mesh_lib.make_mesh(cfg.mesh_data, cfg.mesh_agents)
                topo = gnn_sharded.ShardedGNNTopology(
                    np.asarray(adj), num_shards=cfg.mesh_agents)
                fwd = gnn_sharded.make_sharded_gnn_forward(mesh, model)
                k_init, _ = jax.random.split(k_state)
                st0 = dadmm_core.init_state(k_init, test_size, cfg.P, cfg.n,
                                            dtype=b.dtype)
                apply = lambda p, s, k, b_, _adj: fwd(  # noqa: E731
                    p, s, st0, k, b_, topo.tree())[0]
            else:
                if test_size % cfg.mesh_data:
                    raise SystemExit(f"sharded serving needs test_size ({test_size}) "
                                     f"divisible by mesh_data ({cfg.mesh_data})")
                mesh = mesh_lib.make_mesh(cfg.mesh_data, 1)
                dp = NamedSharding(mesh, PartitionSpec("data"))
                b = jax.device_put(b, dp)
                adj = jax.device_put(adj, dp)
                apply = jax.jit(apply)
        Y = apply(tree["params"], tree["norm_state"], k_state, b, adj)
    elif cfg.mesh_data * cfg.mesh_agents > 1:
        # Multi-chip batch serving: shard_map the unroll over a (data, agents) mesh
        # with collective consensus — the sharded analogue of `model.apply`.
        from ..models import dadmm_core, seq_hyperparam
        from ..ops import sensing
        from ..parallel import mesh as mesh_lib, unfolded_sharded

        if test_size % cfg.mesh_data or cfg.P % cfg.mesh_agents:
            raise SystemExit(
                f"sharded serving needs test_size ({test_size}) divisible by "
                f"mesh_data ({cfg.mesh_data}) and P ({cfg.P}) divisible by "
                f"mesh_agents ({cfg.mesh_agents})"
            )
        model = UnfoldedDLASSO(A, cfg)
        params = model.init()
        tree, meta = ckpt.restore_partial(ckpt_dir, {"params": params})
        mesh = mesh_lib.make_mesh(cfg.mesh_data, cfg.mesh_agents)
        table = seq_hyperparam.hyp_table(
            tree["params"]["seq_hyp"], model.max_param, training=False
        )
        table = jnp.broadcast_to(table, (table.shape[0], cfg.P, 4))
        state = dadmm_core.init_state(k_state, test_size, cfg.P, cfg.n, dtype=b.dtype)
        # 'auto' resolves by make_gram_fn's rule (factored profitable iff 2m < n)
        # so dense and sharded serving of the same checkpoint pick the same operator.
        factored = cfg.gram_mode == "factored" or (
            cfg.gram_mode == "auto" and 2 * cfg.m < cfg.n
        )
        unroll = unfolded_sharded.make_sharded_unroll(
            mesh,
            gram_mode="factored" if factored else "gram",
            nan_guard=cfg.nan_guard,
            remat=cfg.remat,
            solver_dtype=cfg.dtype if cfg.dtype != "float32" else None,
            matmul_dtype=cfg.matmul_dtype if cfg.matmul_dtype != "float32" else None,
        )
        op = A if factored else model.AtA
        Y = unroll(state, table, op, sensing.At_apply(A, b), adj)
    else:
        model = UnfoldedDLASSO(A, cfg)
        params = model.init()
        tree, meta = ckpt.restore_partial(ckpt_dir, {"params": params})
        Y, _ = model.apply(tree["params"], k_state, b, adj, training=False)

    curve = np.asarray(losses.per_iteration_losses(Y, y))
    lm, lf = losses.compute_loss(Y, y)
    nm = float(losses.nmse(Y[-1], y))
    np.save(os.path.join(run_dir, f"eval_loss_curve_{ckpt_name}.npy"), curve)
    print("per-iteration loss curve:")
    for k, v in enumerate(curve):
        print(f"  k={k + 1:3d}  loss={v:.6f}")
    print(f"final-layer loss: {float(lf):.6f} | mean-layer loss: {float(lm):.6f} | "
          f"NMSE: {nm:.6f} (ckpt: {ckpt_name}, epoch {meta.get('epoch') if meta else '?'})")
    return {"loss_curve": curve, "final_loss": float(lf), "nmse": nm}


if __name__ == "__main__":
    main()
