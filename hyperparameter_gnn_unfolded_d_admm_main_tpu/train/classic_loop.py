"""Sequential-segment training for the classic solvers (dlasso / dlr cases).

Equivalent of reference `dlasso.py:52-105` / `dlr.py:60-130` + `utils.py:44-111`:
the K-iteration hyperparameter table is trained `max_iter_seg` iterations at a time;
each finished segment freezes (stop_gradient prefix) and the next segment appends. The
reference's per-epoch optimizer rebuild (`utils.py:45-49`, which resets Adam moments
every epoch) is reproduced when `faithful_optim=True` (default), since it shapes the
loss trajectories the baselines were recorded with.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..models import classic
from ..ops import classic_data, data as data_ops, graphs
from ..train import losses as loss_lib
from ..train import optim
from ..utils.logging import CSVLogger, IOStream, TensorBoardWriter, save_json


def graph_cache_path(cfg: Config) -> str:
    os.makedirs(os.path.join("graphs data", cfg.graph_type), exist_ok=True)
    return os.path.join(
        "graphs data", cfg.graph_type, f"graph_data_prob{cfg.graph_prob}_P={cfg.P}.npz"
    )


def load_or_create_graph(cfg: Config) -> classic.ColorSchedule:
    """Cached single topology shared by every classic run (`dlasso.py:25-35`).

    The color partition is cached WITH the adjacency (as in the reference, which saves
    neighbors + color_partition together): the coloring depends on RNG state that
    differs between create and load paths, and the Gauss-Seidel sweep order must be
    identical across train/eval/rerun for a learned table to be meaningful."""
    path = graph_cache_path(cfg)
    rng = np.random.default_rng(int(cfg.seed))
    if os.path.exists(path):
        data = np.load(path)
        adj = data["adj"]
        masks = data["masks"]
        return classic.ColorSchedule(
            masks=jnp.asarray(masks),
            adj=jnp.asarray(adj),
            deg=jnp.asarray(adj.sum(-1).astype(np.float32)),
        )
    adj = graphs.sample_connected_er(rng, 1, cfg.P, cfg.graph_prob)[0]
    sched = classic.make_color_schedule(adj, rng)
    np.savez(path, adj=adj, masks=np.asarray(sched.masks))
    return sched


def train_classic_dlasso(cfg: Config, out_dir: str) -> Dict:
    log = IOStream(os.path.join(out_dir, "run.log"))
    key = jax.random.key(int(cfg.seed))
    k_A, k_tr, k_te = jax.random.split(key, 3)

    A_global = classic_data.global_sensing_matrix(k_A)
    b_all, y_all = classic_data.make_classic_lasso_dataset(k_tr, A_global, cfg.train_size, cfg.snr)
    (b_tr, y_tr), (b_va, y_va) = classic_data.split_80_20(b_all, y_all, int(cfg.seed))
    sched = load_or_create_graph(cfg)
    solver = classic.DADMMLASSOClassic(A_global, cfg.P)

    # Init table from the scalar flags (`dlasso.py:38`): columns (rho, alpha, tau, eta).
    row = jnp.asarray([cfg.rho, cfg.alpha, cfg.tau, cfg.eta], jnp.float32)
    init_full = jnp.broadcast_to(row, (cfg.max_iter, cfg.P, 4))

    rng = np.random.default_rng(int(cfg.seed))
    csv = CSVLogger(["segment", "epoch", "train_loss", "valid_loss"])
    # Per-epoch scalars like the reference's SummaryWriter (`dlasso.py:71-72`).
    tb = TensorBoardWriter(os.path.join(out_dir, "tb"), enabled=cfg.tensorboard)
    global_epoch = 0
    frozen: Optional[jax.Array] = None
    best_val = np.inf

    def make_step(frozen):
        tx = optim.make_optimizer(cfg.optimizer, cfg.lr, weight_decay=cfg.weight_decay,
                                  momentum=cfg.momentum)

        @jax.jit
        def step(segment, opt_state, b, y):
            def loss_fn(seg):
                table = classic.frozen_prefix_table(frozen, seg)
                X, _, _ = solver.run(table, b, sched)
                return loss_lib.classic_error(y, X)

            loss, g = jax.value_and_grad(loss_fn)(segment)
            updates, opt_state = tx.update(g, opt_state, segment)
            return optax.apply_updates(segment, updates), opt_state, loss

        @jax.jit
        def evaluate(segment, b, y):
            table = classic.frozen_prefix_table(frozen, segment)
            X, _, _ = solver.run(table, b, sched)
            return loss_lib.classic_error(y, X)

        return tx, step, evaluate

    for ll in range(0, cfg.max_iter, cfg.max_iter_seg):
        segment = init_full[ll : ll + cfg.max_iter_seg]
        tx, step, evaluate = make_step(frozen)
        for epoch in range(cfg.num_epochs):
            opt_state = tx.init(segment)  # per-epoch rebuild quirk (`utils.py:45-49`)
            tr_losses = []
            for b, y in data_ops.batch_iterator(rng, b_tr, y_tr, cfg.batch_size):
                segment, opt_state, loss = step(segment, opt_state, b, y)
                tr_losses.append(float(loss))
            tr_loss = float(np.mean(tr_losses)) if tr_losses else float("nan")
            va_losses = [
                float(evaluate(segment, b, y))
                for b, y in data_ops.batch_iterator(
                    rng, b_va, y_va, cfg.batch_size, shuffle=False, drop_last=False
                )
            ]
            va_loss = float(np.mean(va_losses)) if va_losses else float("nan")
            csv.append(segment=ll, epoch=epoch, train_loss=tr_loss, valid_loss=va_loss)
            tb.scalar("train_loss", tr_loss, global_epoch)
            tb.scalar("valid_loss", va_loss, global_epoch)
            global_epoch += 1
            log.cprint(f"seg {ll} | epoch: {epoch} | train_loss: {tr_loss:.2f} | "
                       f"valid_loss: {va_loss:.3f}")
            best_val = min(best_val, va_loss)
        frozen = classic.frozen_prefix_table(frozen, segment)
        np.save(
            os.path.join(
                out_dir,
                f"params_P={cfg.P}_batch={frozen.shape[0]}_prob={cfg.graph_prob}"
                f"_size={ll + cfg.max_iter_seg}.npy",
            ),
            np.asarray(frozen),
        )

    csv.write(os.path.join(out_dir, "losses.csv"))
    tb.close()
    save_json(os.path.join(out_dir, "args.json"), cfg.__dict__)
    np.save(os.path.join(out_dir, f"params_P={cfg.P}_batch={cfg.max_iter}"
                                  f"_prob={cfg.graph_prob}.npy"), np.asarray(frozen))
    return {"hyp_table": frozen, "best_valid_loss": best_val, "out_dir": out_dir,
            "solver": solver, "sched": sched}


def eval_classic_dlasso(cfg: Config, hyp_table: jnp.ndarray, out_dir: str) -> np.ndarray:
    """Inference: per-iteration loss curve (`dlasso.py:41-50`, `utils.py:84-111` — the
    reference evaluates the first batch only; reproduced).

    The sensing matrix is regenerated with the SAME seed derivation as training
    (the reference always loads one fixed `GaussianData.mat`); only the test data key
    is fresh."""
    key = jax.random.key(int(cfg.seed))
    k_A, _, _ = jax.random.split(key, 3)
    k_te = jax.random.key(int(cfg.seed) + 1)
    A_global = classic_data.global_sensing_matrix(k_A)
    b_te, y_te = classic_data.make_classic_lasso_dataset(k_te, A_global, cfg.test_size, cfg.snr)
    sched = load_or_create_graph(cfg)
    solver = classic.DADMMLASSOClassic(A_global, cfg.P)
    b = b_te[: cfg.batch_size]
    y = y_te[: cfg.batch_size]
    _, _, loss_curve = solver.run(jnp.asarray(hyp_table), b, sched, labels=y)
    curve = np.asarray(loss_curve)
    np.save(os.path.join(out_dir, f"params_P={cfg.P}_prob={cfg.graph_prob}"
                                  f"_iteration_{cfg.max_iter}_{cfg.method}.npy"), curve)
    return curve


def eval_classic_dlr(cfg: Config, hyp_table: jnp.ndarray, out_dir: str):
    """Inference for the dlr case: per-iteration loss + rounding-accuracy curves
    (`dlr.py:44-57` semantics; first batch only like `utils.py:84-111`)."""
    key = jax.random.key(int(cfg.seed))
    k_data, _ = jax.random.split(key)
    d = int(cfg.lr_feature_dim)
    x_te, l_te = classic_data.make_lr_dataset_maybe_mnist(
        jax.random.key(int(cfg.seed) + 1), cfg.P, cfg.test_size, d,
        data_path=cfg.data_path, train=False)
    sched = load_or_create_graph(cfg)
    solver = classic.DADMMLRClassic(cfg.P, d)
    x = jnp.swapaxes(x_te[: cfg.batch_size], 0, 1)
    labels = jnp.swapaxes(l_te[: cfg.batch_size], 0, 1)
    out = solver.run(jnp.asarray(hyp_table), x, labels, sched, collect_metrics=True)
    loss_curve = np.asarray(out["loss_per_iter"])
    acc_curve = np.asarray(out["acc_per_iter"])
    np.save(os.path.join(out_dir, f"params_P={cfg.P}_prob={cfg.graph_prob}"
                                  f"_iteration_{cfg.max_iter}_{cfg.method}.npy"), loss_curve)
    np.save(os.path.join(out_dir, f"acc_P={cfg.P}_prob={cfg.graph_prob}"
                                  f"_iteration_{cfg.max_iter}_{cfg.method}.npy"), acc_curve)
    return loss_curve, acc_curve


def train_classic_dlr(cfg: Config, out_dir: str) -> Dict:
    log = IOStream(os.path.join(out_dir, "run.log"))
    key = jax.random.key(int(cfg.seed))
    k_data, _ = jax.random.split(key)
    d = int(cfg.lr_feature_dim)

    x_all, lab_all = classic_data.make_lr_dataset_maybe_mnist(
        k_data, cfg.P, cfg.train_size, d, data_path=cfg.data_path, train=True)
    (x_tr, l_tr), (x_va, l_va) = classic_data.split_80_20(x_all, lab_all, int(cfg.seed))
    sched = load_or_create_graph(cfg)
    solver = classic.DADMMLRClassic(cfg.P, d)

    Pp = cfg.P if cfg.model == "diff" else 1
    row = jnp.asarray([cfg.rho, cfg.alpha, cfg.delta, cfg.eta, cfg.gamma, cfg.beta], jnp.float32)
    init_full = jnp.broadcast_to(row, (cfg.max_iter, Pp, 6))

    rng = np.random.default_rng(int(cfg.seed))
    csv = CSVLogger(["segment", "epoch", "train_loss", "train_acc", "valid_loss", "valid_acc"])
    # Loss + accuracy scalars per epoch (reference `dlr.py:83-86`).
    tb = TensorBoardWriter(os.path.join(out_dir, "tb"), enabled=cfg.tensorboard)
    global_epoch = 0
    frozen: Optional[jax.Array] = None
    best_val = np.inf

    def make_step(frozen):
        tx = optim.make_optimizer(cfg.optimizer, cfg.lr, weight_decay=cfg.weight_decay,
                                  momentum=cfg.momentum)

        @jax.jit
        def step(segment, opt_state, x, labels):
            def loss_fn(seg):
                table = classic.frozen_prefix_table(frozen, seg)
                out = solver.run(table, x, labels, sched)
                y_hat = out["y_hat"]
                return jnp.mean((jnp.abs(y_hat) - labels) ** 2), y_hat

            (loss, y_hat), g = jax.value_and_grad(loss_fn, has_aux=True)(segment)
            updates, opt_state = tx.update(g, opt_state, segment)
            acc = loss_lib.classic_accuracy(labels, y_hat)
            return optax.apply_updates(segment, updates), opt_state, loss, acc

        @jax.jit
        def evaluate(segment, x, labels):
            table = classic.frozen_prefix_table(frozen, segment)
            out = solver.run(table, x, labels, sched)
            loss = jnp.mean((jnp.abs(out["y_hat"]) - labels) ** 2)
            return loss, loss_lib.classic_accuracy(labels, out["y_hat"])

        return tx, step, evaluate

    for ll in range(0, cfg.max_iter, cfg.max_iter_seg):
        segment = init_full[ll : ll + cfg.max_iter_seg]
        tx, step, evaluate = make_step(frozen)
        for epoch in range(cfg.num_epochs):
            opt_state = tx.init(segment)
            trs, tas = [], []
            for x, labels in data_ops.batch_iterator(rng, x_tr, l_tr, cfg.batch_size):
                xb = jnp.swapaxes(x, 0, 1)        # [B,P,d] -> [P,B,d]
                lb = jnp.swapaxes(labels, 0, 1)
                segment, opt_state, loss, acc = step(segment, opt_state, xb, lb)
                trs.append(float(loss))
                tas.append(float(acc))
            vls, vas = [], []
            for x, labels in data_ops.batch_iterator(rng, x_va, l_va, cfg.batch_size,
                                                     shuffle=False, drop_last=False):
                loss, acc = evaluate(segment, jnp.swapaxes(x, 0, 1), jnp.swapaxes(labels, 0, 1))
                vls.append(float(loss))
                vas.append(float(acc))
            tr_loss = float(np.mean(trs)) if trs else float("nan")
            va_loss = float(np.mean(vls)) if vls else float("nan")
            tr_acc = float(np.mean(tas)) if tas else 0.0
            va_acc = float(np.mean(vas)) if vas else 0.0
            csv.append(segment=ll, epoch=epoch, train_loss=tr_loss, train_acc=tr_acc,
                       valid_loss=va_loss, valid_acc=va_acc)
            tb.scalar("train_loss", tr_loss, global_epoch)
            tb.scalar("train_acc", tr_acc, global_epoch)
            tb.scalar("valid_loss", va_loss, global_epoch)
            tb.scalar("valid_acc", va_acc, global_epoch)
            global_epoch += 1
            log.cprint(f"seg {ll} | epoch: {epoch} | train_loss: {tr_loss:.4f} | "
                       f"valid_loss: {va_loss:.4f}")
            best_val = min(best_val, va_loss)
        frozen = classic.frozen_prefix_table(frozen, segment)
        np.save(os.path.join(out_dir, f"params_P={cfg.P}_batch={frozen.shape[0]}"
                                      f"_prob={cfg.graph_prob}_size={ll + cfg.max_iter_seg}.npy"),
                np.asarray(frozen))

    csv.write(os.path.join(out_dir, "losses.csv"))
    tb.close()
    save_json(os.path.join(out_dir, "args.json"), cfg.__dict__)
    return {"hyp_table": frozen, "best_valid_loss": best_val, "out_dir": out_dir}
