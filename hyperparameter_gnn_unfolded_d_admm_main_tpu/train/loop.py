"""Training loops for the unfolded (scalar-table) and GNN-hypernetwork models.

TPU-native re-design of the reference drivers:
- `train_unfolded` ~ `unfolded_train_new.py:18-184`: one fixed ER graph for every batch,
  Adam, ReduceLROnPlateau(0.8, patience 3), early stop patience 70, loss = final-layer.
- `train_gnn_progressive` ~ `gnn_dlasso_progressive.py:20-362`: fresh connected ER
  graphs per sample per batch (p >= 0.3), AdamW(wd 1e-5) + grad clip 100,
  ReduceLROnPlateau(0.7, patience 15), early stop patience 20, progressive K schedule
  with manual LR damping at max K.

Differences by design: data + graphs live on device, the step is one jitted function
(per distinct K for the progressive schedule — compile cache handles the ladder), and
checkpoints carry full state for exact resume (the reference has no resume).

Deliberate LR deviation: the reference overwrites `param_group['lr']` to
`base_lr * damping_factor` at the top of EVERY epoch
(`gnn_dlasso_progressive.py:87-118,164`), which renders its configured
ReduceLROnPlateau inert. Here plateau reductions compound with the damping factor
(`plateau.lr * lr_factor`) — the plateau scheduler actually works, and the combination
trains past the reference's best (PARITY.md: 0.2135 vs 0.2361).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..models.gnn_hypernet import (DLASSOGNNHyp, DLASSOGNNHypOneShot,
                                    DLASSOGNNHypOneShotCorrected)
from ..models.unfolded import UnfoldedDLASSO
from ..ops import data as data_ops
from ..ops import graphs, sensing
from ..utils import checkpoint as ckpt
from ..utils import plots
from ..utils.logging import CSVLogger, IOStream, StepTimer, TensorBoardWriter, save_json
from . import losses, optim, schedule


def _problem_data(cfg: Config, k_A, k_tr, k_va):
    """Problem data source shared by the LASSO trainers: seeded on-device generation
    by default; `--data_path pool.npz` loads a saved pool with the reference's
    head/tail split semantics (`ops/datastore.py`, `LoadData.py:16-24`). The pool's
    saved sensing matrix A (when present) OVERRIDES the seeded one — observations
    are only consistent with the A that generated them."""
    A = sensing.set_A(k_A, cfg.P, cfg.m, cfg.n)
    if not cfg.data_path:
        b_tr, y_tr = data_ops.make_dataset(k_tr, A, cfg.train_size, cfg.snr,
                                           noise=cfg.data_noise)
        b_va, y_va = data_ops.make_dataset(k_va, A, cfg.test_size, cfg.snr,
                                           noise=cfg.data_noise)
        return A, b_tr, y_tr, b_va, y_va
    from ..ops import datastore

    (b_tr, y_tr), (b_va, y_va), A_saved, _meta = datastore.load_simulated_split(
        cfg.data_path, cfg.train_size, cfg.test_size,
        expect_meta={"P": cfg.P, "m": cfg.m, "n": cfg.n},
    )
    if A_saved is not None:
        A = jnp.asarray(A_saved)
    return (A, jnp.asarray(b_tr), jnp.asarray(y_tr),
            jnp.asarray(b_va), jnp.asarray(y_va))


def _fixed_graph_batch(seed: int, batch: int, P: int, prob: float) -> jnp.ndarray:
    """ONE ER graph reused for every batch (reference `unfolded_train_new.py:56,67`).
    Not connectivity-repaired there; isolated nodes simply have degree 0."""
    rng = np.random.default_rng(seed)
    adj = graphs.sample_er_adjacency(rng, P, prob)
    return jnp.broadcast_to(jnp.asarray(adj), (batch, P, P))


def _fresh_graph_batch(seed: int, batch: int, P: int, prob: float,
                       graph_type: str = "erods_renyi",
                       prob_floor: float = 0.3) -> jnp.ndarray:
    """Fresh connected per-sample graphs, p >= prob_floor (reference hard-codes
    the floor at 0.3, `gnn_dlasso_progressive.py:181-191`; --graph_prob_floor
    relaxes it for pod-scale P where 0.3 means degree ~0.3*P)."""
    return jnp.asarray(
        graphs.sample_graph_batch(seed, batch, P, graph_type, max(prob, prob_floor)))

def _make_graph_source(cfg: Config, batch: int):
    """Per-step fresh-topology source for the progressive trainer: `(get, close)`.

    When the native pipeline is built and the topology family is Erdos-Renyi,
    `get(seed)` pops batches prefetched by C++ worker threads (sampling for the next
    steps overlaps the TPU executing this one); output is bitwise-identical to the
    synchronous native path for the same seed (`ops/native_pipeline.py`). Otherwise
    falls back to synchronous `_fresh_graph_batch`.
    """
    if cfg.native_prefetch and cfg.graph_type in ("erods_renyi", "erdos_renyi"):
        from ..ops import native_pipeline

        if native_pipeline.available():
            pf = native_pipeline.SequentialGraphPrefetcher(
                batch, cfg.P, max(cfg.graph_prob, cfg.graph_prob_floor), depth=4
            )
            return (lambda seed: jnp.asarray(pf.get(seed))), pf.close
    return (
        lambda seed: _fresh_graph_batch(seed, batch, cfg.P, cfg.graph_prob,
                                        cfg.graph_type, cfg.graph_prob_floor),
        lambda: None,
    )


def _restore_scheduler_state(meta: dict, plateau, stopper) -> int:
    """Shared resume plumbing: restore LR-scheduler and early-stop state from a
    checkpoint's metadata; returns the epoch to resume from."""
    plateau.lr = float(meta["lr"])
    plateau.best = float(meta["plateau_best"])
    plateau.num_bad = int(meta.get("plateau_num_bad", 0))
    stopper.best = float(meta["stop_best"])
    stopper.num_bad = int(meta.get("stop_num_bad", 0))
    return int(meta["epoch"]) + 1


def _ckpt_meta(epoch: int, valid_loss: float, plateau, stopper, **extra) -> dict:
    """Shared checkpoint metadata (scheduler + early-stop state for exact resume)."""
    return {"epoch": epoch, "valid_loss": valid_loss, "lr": plateau.lr,
            "plateau_best": plateau.best, "plateau_num_bad": plateau.num_bad,
            "stop_best": stopper.best, "stop_num_bad": stopper.num_bad, **extra}


def _rng_meta(key, rng: np.random.Generator, graph_seed: int) -> dict:
    """RNG-stream state for EXACT resume: the jax PRNG key, the numpy batch-shuffle
    generator, and the per-step graph seed. Without these, a resumed run restarts
    every stream from the config seed and diverges from the uninterrupted
    trajectory at the first post-resume batch."""
    return {
        "key_data": np.asarray(jax.random.key_data(key)).tolist(),
        "rng_state": rng.bit_generator.state,   # JSON-clean dict of (big) ints
        "graph_seed": int(graph_seed),
    }


def _restore_rng_state(meta: dict, key, rng: np.random.Generator, graph_seed: int):
    """Inverse of `_rng_meta`; falls back to the fresh streams for old checkpoints."""
    if "key_data" in meta:
        key = jax.random.wrap_key_data(
            jnp.asarray(meta["key_data"], dtype=jnp.uint32))
    if "rng_state" in meta:
        state = dict(meta["rng_state"])
        if isinstance(state.get("state"), dict):  # JSON round-trips ints fine
            rng.bit_generator.state = state
    return key, int(meta.get("graph_seed", graph_seed))


# --------------------------------------------------------------------------- unfolded


def train_unfolded(cfg: Config, out_dir: str, resume: Optional[str] = None) -> Dict:
    log = IOStream(os.path.join(out_dir, "run.log"))
    key = jax.random.key(int(cfg.seed))
    k_A, k_data_tr, k_data_va, key = jax.random.split(key, 4)

    A, b_tr, y_tr, b_va, y_va = _problem_data(cfg, k_A, k_data_tr, k_data_va)

    model = UnfoldedDLASSO(A, cfg)
    params = model.init()
    tx = optim.make_optimizer("adam", cfg.lr)
    opt_state = tx.init(params)

    # Topology regime: ONE fixed graph for every batch (reference
    # `unfolded_train_new.py:56`), or fresh connected per-sample graphs each step
    # (--graph_mode fresh — the regime of the reference's csv_folder2 baseline).
    # The graph batch is a plain [B,P,P] input to the jitted step either way: same
    # compiled program, no retrace per topology.
    fresh_graphs = cfg.graph_mode == "fresh"
    fixed_adj = _fixed_graph_batch(int(cfg.seed), cfg.batch_size, cfg.P, cfg.graph_prob)
    if fresh_graphs:
        get_graphs, close_graphs = _make_graph_source(cfg, cfg.batch_size)
    else:
        get_graphs, close_graphs = (lambda seed: fixed_adj), (lambda: None)
    graph_seed = int(cfg.seed) * 100_003 + 17

    # Optional multi-chip path (mirrors train_gnn_progressive): --mesh_data /
    # --mesh_agents > 1 runs the GSPMD-partitioned table-tier step — END-TO-END
    # sharded training of the reference unfolded workload, trajectory-matched to
    # the dense run (tests/test_sharded_training_e2e.py).
    if cfg.mesh_data * cfg.mesh_agents > 1:
        from ..parallel import mesh as mesh_lib
        from ..parallel import shard_step

        mesh = mesh_lib.make_mesh(data=cfg.mesh_data, agents=cfg.mesh_agents)
        if cfg.P % cfg.mesh_agents or cfg.batch_size % cfg.mesh_data:
            raise ValueError("P must divide by mesh_agents and batch_size by mesh_data")
        params, opt_state = mesh_lib.replicate(mesh, (params, opt_state))
        _sharded_train = shard_step.make_unfolded_train_step(mesh, model, tx)
        _sharded_eval = shard_step.make_unfolded_eval_step(mesh, model)

        def _place(key, b, adj, y):
            b, y, adj = mesh_lib.shard_batch(mesh, b, y, adj)
            return jax.device_put(key, mesh_lib.sharding(mesh)), b, adj, y

        def train_step(params, opt_state, key, b, adj, y):
            key, b, adj, y = _place(key, b, adj, y)
            return _sharded_train(params, opt_state, key, b, adj, y)

        def eval_step(params, key, b, adj, y):
            key, b, adj, y = _place(key, b, adj, y)
            return _sharded_eval(params, key, b, adj, y)
    else:
        @jax.jit
        def train_step(params, opt_state, key, b, adj, y):
            def loss_fn(p):
                # In-scan loss reduction — no stacked-Y materialization on the train path.
                per_kp, hyp = model.apply_losses(p, key, b, adj, y, training=True)
                lm, lf = losses.losses_from_per_kp(per_kp)
                return lf, (lm, hyp)

            (lf, (lm, hyp)), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(g, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, lm, lf, hyp

        @jax.jit
        def eval_step(params, key, b, adj, y):
            # Reference validation never calls model.eval() (`unfolded_train_new.py:102-125`),
            # so the table penalty stays active: training=True here is parity, not a bug.
            Y, hyp = model.apply(params, key, b, adj, training=True)
            lm, lf = losses.compute_loss(Y, y)
            nm = losses.nmse(Y[-1], y)
            return lm, lf, nm

    plateau = schedule.ReduceLROnPlateau(lr=cfg.lr, factor=0.8, patience=3, min_lr=1e-6)
    stopper = schedule.EarlyStopping(patience=70)
    csv = CSVLogger(["epoch", "train_loss", "valid_loss"])
    tb = TensorBoardWriter(os.path.join(out_dir, "tb"), enabled=cfg.tensorboard)
    rng = np.random.default_rng(int(cfg.seed))
    timer = StepTimer()
    start_epoch = 0

    if resume and ckpt.exists(resume):
        tree = {"params": params, "opt_state": opt_state}
        tree, meta = ckpt.restore(resume, tree)
        params, opt_state = tree["params"], tree["opt_state"]
        start_epoch = _restore_scheduler_state(meta, plateau, stopper)
        key, graph_seed = _restore_rng_state(meta, key, rng, graph_seed)
        log.cprint(f"resumed from {resume} at epoch {start_epoch}")

    # AFTER the resume restore: a resumed run that never improves on the
    # restored stopper.best must return the restored params, not the fresh init
    # (train_unfolded_dlr already ordered it this way).
    best_params = params
    final_nmse = float("nan")
    for epoch in range(start_epoch, cfg.num_epochs):
        if cfg.profile and epoch == start_epoch + 1:
            # first post-compile epoch: steady-state kernels, no compile noise
            jax.profiler.start_trace(os.path.join(out_dir, "trace"))
        opt_state.hyperparams["learning_rate"] = jnp.float32(
            plateau.lr * schedule.warmup_factor(epoch, cfg.warmup_epochs)
        )
        tr_loss, nb = 0.0, 0
        for b, y in data_ops.batch_iterator(rng, b_tr, y_tr, cfg.batch_size):
            key, kstep = jax.random.split(key)
            graph_seed += 1
            adj = get_graphs(graph_seed)
            with timer:
                params, opt_state, lm, lf, hyp = train_step(params, opt_state, kstep,
                                                            b, adj, y)
                jax.block_until_ready(lf)   # async dispatch: block so the timer sees
                                            # device time, not host dispatch time
            tr_loss += float(lf)
            nb += 1
        tr_loss /= max(nb, 1)

        va_loss, va_nmse, nb = 0.0, 0.0, 0
        for b, y in data_ops.batch_iterator(rng, b_va, y_va, cfg.batch_size):
            key, kstep = jax.random.split(key)
            graph_seed += 1
            adj = get_graphs(graph_seed)
            lm, lf, nm = eval_step(params, kstep, b, adj, y)
            va_loss += float(lf)
            va_nmse += float(nm)
            nb += 1
        va_loss /= max(nb, 1)
        final_nmse = va_nmse / max(nb, 1)

        if cfg.profile and epoch == start_epoch + 1:
            jax.profiler.stop_trace()
            log.cprint(f"profiler trace written to {os.path.join(out_dir, 'trace')}")
        plateau.step(va_loss)
        csv.append(epoch=epoch + 1, train_loss=tr_loss, valid_loss=va_loss)
        tb.scalar("train loss", tr_loss, epoch)
        tb.scalar("validation loss", va_loss, epoch)
        log.cprint(
            f"epoch {epoch + 1}/{cfg.num_epochs} | train {tr_loss:.5f} | "
            f"valid {va_loss:.5f} | nmse {final_nmse:.5f} | lr {plateau.lr:.2e}"
        )
        stop = stopper.step(va_loss)
        meta = _ckpt_meta(epoch, va_loss, plateau, stopper,
                          **_rng_meta(key, rng, graph_seed))
        if stopper.improved:
            best_params = params
            ckpt.save(os.path.join(out_dir, "best"),
                      {"params": params, "opt_state": opt_state}, meta)
        ckpt.save(os.path.join(out_dir, "last"),
                  {"params": params, "opt_state": opt_state}, meta)
        if stop:
            log.cprint(f"early stopping at epoch {epoch + 1}")
            break
        if cfg.stop_after_epoch and epoch + 1 >= cfg.stop_after_epoch:
            log.cprint(f"pausing after epoch {epoch + 1} (stop_after_epoch); "
                       f"resume with --resume {os.path.join(out_dir, 'last')}")
            break

    close_graphs()
    csv.write(os.path.join(out_dir, "losses.csv"))
    plots.plot_losses(out_dir, csv.column("train_loss"), csv.column("valid_loss"),
                      epochs=csv.column("epoch"))
    tb.close()
    np.save(os.path.join(out_dir, "A.npy"), np.asarray(A))
    save_json(os.path.join(out_dir, "args.json"), cfg.__dict__)
    log.cprint(f"best valid loss: {stopper.best:.6f}")
    return {
        "best_valid_loss": stopper.best,
        "final_nmse": final_nmse,
        "params": best_params,
        "steps_per_sec": timer.steady_state_rate(),
        "out_dir": out_dir,
    }


# ------------------------------------------------------------------- GNN progressive


def train_gnn_progressive(cfg: Config, out_dir: str, resume: Optional[str] = None) -> Dict:
    log = IOStream(os.path.join(out_dir, "run.log"))
    key = jax.random.key(int(cfg.seed))
    k_A, k_data_tr, k_data_va, k_model, key = jax.random.split(key, 5)

    A, b_tr, y_tr, b_va, y_va = _problem_data(cfg, k_A, k_data_tr, k_data_va)

    # --hyp_mode GHyp1 selects the one-shot tier (table emitted by ONE GNN evaluation,
    # archive v1 design); GHyp1c adds the state-conditioned correction MLP; default
    # is the state-conditioned flagship.
    model_cls = {"GHyp1": DLASSOGNNHypOneShot,
                 "GHyp1c": DLASSOGNNHypOneShotCorrected}.get(cfg.hyp_mode, DLASSOGNNHyp)
    model = model_cls(A, cfg)
    params, norm_state = model.init(k_model)
    tx = optim.make_optimizer("adamw", cfg.lr, weight_decay=1e-5, clip_norm=100.0)
    opt_state = tx.init(params)

    # Optional multi-chip path: --mesh_data / --mesh_agents > 1 runs the GSPMD
    # -partitioned step (parallel/shard_step.py) with batch/agent sharding.
    mesh = None
    if cfg.mesh_data * cfg.mesh_agents > 1:
        from ..parallel import mesh as mesh_lib
        from ..parallel import shard_step

        mesh = mesh_lib.make_mesh(data=cfg.mesh_data, agents=cfg.mesh_agents)
        if cfg.P % cfg.mesh_agents or cfg.batch_size % cfg.mesh_data:
            raise ValueError("P must divide by mesh_agents and batch_size by mesh_data")
        params, norm_state, opt_state = mesh_lib.replicate(mesh, (params, norm_state, opt_state))
        _sharded_train = shard_step.make_gnn_train_step(mesh, model, tx, masked_k=cfg.masked_k)
        _sharded_eval = shard_step.make_gnn_eval_step(mesh, model, masked_k=cfg.masked_k)

        def _place(key, batch):
            b, y, adj = batch
            b, y, adj = mesh_lib.shard_batch(mesh, b, y, adj)
            return jax.device_put(key, mesh_lib.sharding(mesh)), (b, y, adj)

        def train_step(params, norm_state, opt_state, key, batch, K):
            key, batch = _place(key, batch)
            params, new_state, opt_state, lm, lf = _sharded_train(
                params, norm_state, opt_state, key, batch, K
            )
            return params, new_state, opt_state, lm, lf, None

        def eval_step(params, norm_state, key, batch, K):
            key, batch = _place(key, batch)
            return _sharded_eval(params, norm_state, key, batch, K)
    elif cfg.masked_k:
        # Masked max-K path: K arrives as a TRACED jnp.int32, so the whole progressive
        # schedule runs in ONE compiled program (iterations >= K are frozen inside the
        # scan — see models/gnn_hypernet.py:_freeze_inactive). Measured motivation in
        # PARITY.md: each distinct K otherwise costs an ~11s recompile (4s warm) while
        # a masked iteration's wasted compute is ~0 at the reference's P=5 shapes.
        @jax.jit
        def _masked_train(params, norm_state, opt_state, key, batch, k_arr):
            b, y, adj = batch

            def loss_fn(p):
                per_kp, hyp, new_state = model.apply_losses(
                    p, norm_state, key, b, adj, y, training=True, k_active=k_arr
                )
                lm, lf = losses.masked_losses_from_per_kp(per_kp, k_arr)
                return lf, (lm, new_state, hyp)

            (lf, (lm, new_state, hyp)), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(g, opt_state, params)
            return optax.apply_updates(params, updates), new_state, opt_state, lm, lf, hyp

        @jax.jit
        def _masked_eval(params, norm_state, key, batch, k_arr):
            b, y, adj = batch
            out = model.apply(params, norm_state, key, b, adj, training=False,
                              k_active=k_arr)
            lm, lf = losses.masked_compute_loss(out.Y, y, k_arr)
            nm = losses.nmse(out.Y[-1], y)   # freeze carries iterate K-1 to the end
            return lm, lf, nm

        def train_step(params, norm_state, opt_state, key, batch, K):
            return _masked_train(params, norm_state, opt_state, key, batch,
                                 jnp.int32(K))

        def eval_step(params, norm_state, key, batch, K):
            return _masked_eval(params, norm_state, key, batch, jnp.int32(K))
    else:
        @functools.partial(jax.jit, static_argnums=(5,))
        def train_step(params, norm_state, opt_state, key, batch, K):
            b, y, adj = batch

            def loss_fn(p):
                per_kp, hyp, new_state = model.apply_losses(
                    p, norm_state, key, b, adj, y, training_iterations=K, training=True
                )
                lm, lf = losses.losses_from_per_kp(per_kp)
                return lf, (lm, new_state, hyp)

            (lf, (lm, new_state, hyp)), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(g, opt_state, params)
            return optax.apply_updates(params, updates), new_state, opt_state, lm, lf, hyp

        @functools.partial(jax.jit, static_argnums=(4,))
        def eval_step(params, norm_state, key, batch, K):
            b, y, adj = batch
            out = model.apply(params, norm_state, key, b, adj, training_iterations=K, training=False)
            lm, lf = losses.compute_loss(out.Y, y)
            nm = losses.nmse(out.Y[-1], y)
            return lm, lf, nm

    plateau = schedule.ReduceLROnPlateau(lr=cfg.lr, factor=0.7, patience=15, min_lr=1e-6)
    stopper = schedule.EarlyStopping(patience=20)
    train_csv = CSVLogger(["mean", "final"])
    valid_csv = CSVLogger(["mean", "final"])
    # Separate file (not a new column: cli/compare.py and the reference tooling read
    # the rightmost losses-CSV column as the loss). Epoch wall-clock is what
    # quantifies the progressive schedule's early-training savings — the reference
    # README claims 60-80% but ships no measurement (README.md:141).
    times_csv = CSVLogger(["epoch", "K", "time_s"])
    tb = TensorBoardWriter(os.path.join(out_dir, "tb"), enabled=cfg.tensorboard)
    rng = np.random.default_rng(int(cfg.seed))
    timer = StepTimer()
    graph_seed = int(cfg.seed) * 1000
    start_epoch = 0
    max_iterations = cfg.GHN_iter_num

    if resume and ckpt.exists(resume):
        tree = {"params": params, "norm_state": norm_state, "opt_state": opt_state}
        tree, meta = ckpt.restore(resume, tree)
        params, norm_state, opt_state = tree["params"], tree["norm_state"], tree["opt_state"]
        start_epoch = _restore_scheduler_state(meta, plateau, stopper)
        key, graph_seed = _restore_rng_state(meta, key, rng, graph_seed)
        log.cprint(f"resumed from {resume} at epoch {start_epoch}")

    graph_get, graph_close = _make_graph_source(cfg, cfg.batch_size)
    final_nmse = float("nan")
    K = cfg.min_iterations
    iters_hist = []
    for epoch in range(start_epoch, cfg.num_epochs):
        K = schedule.get_iterations_for_epoch(
            epoch, cfg.num_epochs, cfg.min_iterations, max_iterations
        )
        iters_hist.append(K)
        lr_factor = schedule.lr_factor_for_iterations(K, epoch, cfg.num_epochs, max_iterations)
        lr_factor *= schedule.warmup_factor(epoch, cfg.warmup_epochs)
        opt_state.hyperparams["learning_rate"] = jnp.float32(plateau.lr * lr_factor)
        epoch_t0 = time.perf_counter()

        tr_mean, tr_final, nb = 0.0, 0.0, 0
        for b, y in data_ops.batch_iterator(rng, b_tr, y_tr, cfg.batch_size):
            graph_seed += 1
            adj = graph_get(graph_seed)
            key, kstep = jax.random.split(key)
            with timer:
                params, norm_state, opt_state, lm, lf, hyp = train_step(
                    params, norm_state, opt_state, kstep, (b, y, adj), K
                )
                jax.block_until_ready(lf)   # see train_unfolded: device, not dispatch
            if nb % 10 == 0 and hyp is not None:  # sharded step skips the hyp aux
                # Reference prints the emitted hyperparameters every 10 batches
                # (`gnn_dlasso_progressive.py:217-224`) — the live view of what the
                # hypernetwork is producing.
                a_, t_, r_, e_ = (float(jnp.mean(h)) for h in hyp)
                log.cprint(f"  batch {nb} | alpha {a_:.4f} | tau {t_:.4f} | "
                           f"rho {r_:.4f} | eta {e_:.4f}")
            tr_mean += float(lm)
            tr_final += float(lf)
            nb += 1
        tr_mean /= max(nb, 1)
        tr_final /= max(nb, 1)
        train_csv.append(mean=tr_mean, final=tr_final)
        times_csv.append(epoch=epoch, K=K, time_s=round(time.perf_counter() - epoch_t0, 4))

        va_mean, va_final, va_nmse, nb = 0.0, 0.0, 0.0, 0
        for b, y in data_ops.batch_iterator(rng, b_va, y_va, cfg.batch_size):
            graph_seed += 1
            adj = graph_get(graph_seed)
            key, kstep = jax.random.split(key)
            lm, lf, nm = eval_step(params, norm_state, kstep, (b, y, adj), K)
            va_mean += float(lm)
            va_final += float(lf)
            va_nmse += float(nm)
            nb += 1
        va_mean /= max(nb, 1)
        va_final /= max(nb, 1)
        final_nmse = va_nmse / max(nb, 1)
        valid_csv.append(mean=va_mean, final=va_final)
        tb.scalar("train loss", tr_final, epoch)
        tb.scalar("validation loss", va_final, epoch)
        tb.scalar("iterations", K, epoch)

        plateau.step(va_final)
        log.cprint(
            f"epoch {epoch + 1}/{cfg.num_epochs} | K={K} | train {tr_final:.5f} | "
            f"valid {va_final:.5f} | nmse {final_nmse:.5f} | "
            f"lr {plateau.lr * lr_factor:.2e}"
        )
        stop = stopper.step(va_final)
        meta = _ckpt_meta(epoch, va_final, plateau, stopper, current_iterations=K,
                          **_rng_meta(key, rng, graph_seed))
        tree = {"params": params, "norm_state": norm_state, "opt_state": opt_state}
        if stopper.improved:
            ckpt.save(os.path.join(out_dir, "best"), tree, meta)
        ckpt.save(os.path.join(out_dir, "last"), tree, meta)
        if stop:
            log.cprint(f"early stopping at epoch {epoch + 1}")
            break
        if cfg.stop_after_epoch and epoch + 1 >= cfg.stop_after_epoch:
            log.cprint(f"pausing after epoch {epoch + 1} (stop_after_epoch); "
                       f"resume with --resume {os.path.join(out_dir, 'last')}")
            break

    graph_close()  # joins the C++ prefetch workers (exception paths: __del__ backstop)
    train_csv.write(os.path.join(out_dir, "train_losses.csv"))
    valid_csv.write(os.path.join(out_dir, "valid_losses.csv"))
    times_csv.write(os.path.join(out_dir, "epoch_times.csv"))
    plots.plot_training_summary(
        out_dir, train_csv.column("final"), valid_csv.column("final"), iters_hist,
        epoch_offset=start_epoch,
    )
    plots.plot_iteration_progression(out_dir, iters_hist, epoch_offset=start_epoch)
    tb.close()
    np.save(os.path.join(out_dir, "A.npy"), np.asarray(A))
    # Normalize the recorded tier so evaluate dispatches on config, not on the run
    # directory name (reference semantics: hyp_mode 'GHyp' = GNN hypernetwork).
    fam = cfg.hyp_mode if cfg.hyp_mode in ("GHyp", "GHyp1", "GHyp1c") else "GHyp"
    save_json(os.path.join(out_dir, "args.json"), cfg.replace(hyp_mode=fam).__dict__)
    log.cprint(f"best valid loss: {stopper.best:.6f}")
    return {
        "best_valid_loss": stopper.best,
        "final_nmse": final_nmse,
        "params": params,
        "norm_state": norm_state,
        "steps_per_sec": timer.steady_state_rate(),
        "final_iterations": K,
        "out_dir": out_dir,
    }


# ----------------------------------------------------------------------- unfolded dlr


def train_unfolded_dlr(cfg: Config, out_dir: str, resume: Optional[str] = None) -> Dict:
    """Unfolded distributed-linear-regression training (beyond-reference extension —
    the reference unfolds only LASSO; see models/unfolded_dlr.py). Same harness shape
    as `train_unfolded`: fixed graph, Adam, plateau(0.8,3), early stop 70.
    Uses cfg.n as the regression feature dimension d. `cfg.hyp_mode` selects the
    hyperparameter tier — 'unfolded' = learned 6-param table, 'GHyp' = the
    state-conditioned GNN hypernetwork (reference flag `configurations.py:123`),
    'GHyp1' = the one-shot hypernetwork (full table from one GNN evaluation; shares
    the table tier's stateless harness path), 'GHyp1c' = one-shot table x a
    state-conditioned correction MLP (same harness path)."""
    from ..models.unfolded_dlr import (DLRGNNHyp, DLRGNNHypOneShot,
                                       DLRGNNHypOneShotCorrected, UnfoldedDLR)

    log = IOStream(os.path.join(out_dir, "run.log"))
    key = jax.random.key(int(cfg.seed))
    k_data_tr, k_data_va, k_model, key = jax.random.split(key, 4)
    d = cfg.n
    use_gnn = cfg.hyp_mode == "GHyp"

    x_tr, y_tr = data_ops.make_dlr_dataset(k_data_tr, cfg.P, cfg.train_size, d,
                                           cfg.snr, noise=cfg.data_noise)
    x_va, y_va = data_ops.make_dlr_dataset(k_data_va, cfg.P, cfg.test_size, d,
                                           cfg.snr, noise=cfg.data_noise)

    if use_gnn:
        model = DLRGNNHyp(cfg.P, d, cfg)
        params, norm_state = model.init(k_model)
    else:
        model_cls = {"GHyp1": DLRGNNHypOneShot,
                     "GHyp1c": DLRGNNHypOneShotCorrected}.get(cfg.hyp_mode, UnfoldedDLR)
        model = model_cls(cfg.P, d, cfg)
        params, norm_state = model.init(), {}
    tx = optim.make_optimizer("adam", cfg.lr)
    opt_state = tx.init(params)
    adj = _fixed_graph_batch(int(cfg.seed), cfg.batch_size, cfg.P, cfg.graph_prob)

    # Optional multi-chip path (mirrors train_unfolded / train_gnn_progressive):
    # GSPMD-partitioned dlr step over a (data, agents) mesh.
    if cfg.mesh_data * cfg.mesh_agents > 1:
        from ..parallel import mesh as mesh_lib
        from ..parallel import shard_step

        mesh = mesh_lib.make_mesh(data=cfg.mesh_data, agents=cfg.mesh_agents)
        if cfg.P % cfg.mesh_agents or cfg.batch_size % cfg.mesh_data:
            raise ValueError("P must divide by mesh_agents and batch_size by mesh_data")
        params, norm_state, opt_state = mesh_lib.replicate(
            mesh, (params, norm_state, opt_state))
        _sharded_train = shard_step.make_dlr_train_step(mesh, model, tx, use_gnn)
        _sharded_eval = shard_step.make_dlr_eval_step(mesh, model, use_gnn)
        s_bpa = mesh_lib.sharding(mesh, mesh_lib.DATA_AXIS, mesh_lib.AGENT_AXIS)

        def _place(key, x, y):
            key = jax.device_put(key, mesh_lib.sharding(mesh))
            x = jax.device_put(x, s_bpa)
            y = jax.device_put(y, s_bpa)
            adj_s = jax.device_put(adj, s_bpa)
            return key, x, y, adj_s

        def train_step(params, norm_state, opt_state, key, x, y):
            key, x, y, adj_s = _place(key, x, y)
            return _sharded_train(params, norm_state, opt_state, key, x, y, adj_s)

        def eval_step(params, norm_state, key, x, y):
            key, x, y, adj_s = _place(key, x, y)
            return _sharded_eval(params, norm_state, key, x, y, adj_s)
    else:
        @jax.jit
        def train_step(params, norm_state, opt_state, key, x, y):
            def loss_fn(p):
                if use_gnn:
                    per_kp, new_state = model.apply_losses(p, norm_state, key, x, y, adj,
                                                           training=True)
                else:
                    per_kp, new_state = model.apply_losses(p, key, x, y, adj,
                                                           training=True)[0], norm_state
                lm, lf = losses.losses_from_per_kp(per_kp)
                return lf, (lm, new_state)

            (lf, (lm, new_state)), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(g, opt_state, params)
            return optax.apply_updates(params, updates), new_state, opt_state, lm, lf

        @jax.jit
        def eval_step(params, norm_state, key, x, y):
            if use_gnn:
                per_kp, _ = model.apply_losses(params, norm_state, key, x, y, adj,
                                               training=False)
            else:
                per_kp, _ = model.apply_losses(params, key, x, y, adj, training=True)
            lm, lf = losses.losses_from_per_kp(per_kp)
            return lm, lf

    plateau = schedule.ReduceLROnPlateau(lr=cfg.lr, factor=0.8, patience=3, min_lr=1e-6)
    stopper = schedule.EarlyStopping(patience=70)
    csv = CSVLogger(["epoch", "train_loss", "valid_loss"])
    rng = np.random.default_rng(int(cfg.seed))
    timer = StepTimer()
    start_epoch = 0
    if resume and ckpt.exists(resume):
        tree = {"params": params, "norm_state": norm_state, "opt_state": opt_state}
        tree, meta = ckpt.restore(resume, tree)
        params, norm_state, opt_state = tree["params"], tree["norm_state"], tree["opt_state"]
        start_epoch = _restore_scheduler_state(meta, plateau, stopper)
        key, _ = _restore_rng_state(meta, key, rng, 0)
        log.cprint(f"resumed from {resume} at epoch {start_epoch}")

    best_params = params
    for epoch in range(start_epoch, cfg.num_epochs):
        opt_state.hyperparams["learning_rate"] = jnp.float32(
            plateau.lr * schedule.warmup_factor(epoch, cfg.warmup_epochs)
        )
        tr_loss, nb = 0.0, 0
        for x, y in data_ops.batch_iterator(rng, x_tr, y_tr, cfg.batch_size):
            key, kstep = jax.random.split(key)
            with timer:
                params, norm_state, opt_state, lm, lf = train_step(
                    params, norm_state, opt_state, kstep, x, y)
                jax.block_until_ready(lf)
            tr_loss += float(lf)
            nb += 1
        tr_loss /= max(nb, 1)

        va_loss, nb = 0.0, 0
        for x, y in data_ops.batch_iterator(rng, x_va, y_va, cfg.batch_size):
            key, kstep = jax.random.split(key)
            lm, lf = eval_step(params, norm_state, kstep, x, y)
            va_loss += float(lf)
            nb += 1
        va_loss /= max(nb, 1)

        plateau.step(va_loss)
        csv.append(epoch=epoch + 1, train_loss=tr_loss, valid_loss=va_loss)
        log.cprint(f"epoch {epoch + 1}/{cfg.num_epochs} | train {tr_loss:.5f} | "
                   f"valid {va_loss:.5f} | lr {plateau.lr:.2e}")
        stop = stopper.step(va_loss)
        meta = _ckpt_meta(epoch, va_loss, plateau, stopper,
                          **_rng_meta(key, rng, 0))
        tree = {"params": params, "norm_state": norm_state, "opt_state": opt_state}
        if stopper.improved:
            best_params = params
            ckpt.save(os.path.join(out_dir, "best"), tree, meta)
        ckpt.save(os.path.join(out_dir, "last"), tree, meta)
        if stop:
            log.cprint(f"early stopping at epoch {epoch + 1}")
            break
        if cfg.stop_after_epoch and epoch + 1 >= cfg.stop_after_epoch:
            log.cprint(f"pausing after epoch {epoch + 1} (stop_after_epoch); "
                       f"resume with --resume {os.path.join(out_dir, 'last')}")
            break

    csv.write(os.path.join(out_dir, "losses.csv"))
    plots.plot_losses(out_dir, csv.column("train_loss"), csv.column("valid_loss"),
                      epochs=csv.column("epoch"))
    # Record the problem family in the saved config so evaluate dispatches on data,
    # not on the run-directory name.
    save_json(os.path.join(out_dir, "args.json"), cfg.replace(case="dlr").__dict__)
    log.cprint(f"best valid loss: {stopper.best:.6f}")
    return {
        "best_valid_loss": stopper.best,
        "params": best_params,
        "steps_per_sec": timer.steady_state_rate(),
        "out_dir": out_dir,
    }
