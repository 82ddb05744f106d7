"""Driver: layer-wise unfolded training (truncation curriculum).

Equivalent of reference `unfolded_train.py:16-129`: for each truncation depth
k = 1..GHN_iter_num-1, run a full epoch loop with the unroll truncated to K=k and loss
(mean + final)/2 (`unfolded_train.py:58`), saving per-layer CSVs. The reference script
is broken in its snapshot (dead import of `gnn_dlasso_models` and a tuple passed to
`compute_loss`, SURVEY.md section "known defects"); this implementation realizes its
intended semantics.

    python -m hyperparameter_gnn_unfolded_d_admm_main_tpu.cli.unfolded_train \
        --num_epochs 10 --GHN_iter_num 15
"""

import os

import jax
import numpy as np
import optax

from ..config import args_parser
from ..models.unfolded import UnfoldedDLASSO
from ..ops import data as data_ops, sensing
from ..train import losses, optim
from ..train.loop import _fixed_graph_batch
from ..utils.logging import CSVLogger, IOStream, save_json, timestamped_dir
from ..utils.platform import configure_platform


def main(argv=None):
    cfg = args_parser(argv)
    if cfg.resume:
        raise SystemExit("--resume is not supported by this driver (supported: "
                         "unfolded_train_new, gnn_progressive, unfolded_dlr)")
    configure_platform(cfg)
    out_dir = timestamped_dir(cfg.save_dir, "unfolded_layerwise")
    log = IOStream(os.path.join(out_dir, "run.log"))

    key = jax.random.key(int(cfg.seed))
    k_A, k_tr, k_va, key = jax.random.split(key, 4)
    A = sensing.set_A(k_A, cfg.P, cfg.m, cfg.n)
    b_tr, y_tr = data_ops.make_dataset(k_tr, A, cfg.train_size, cfg.snr, noise=cfg.data_noise)
    b_va, y_va = data_ops.make_dataset(k_va, A, cfg.test_size, cfg.snr, noise=cfg.data_noise)

    model = UnfoldedDLASSO(A, cfg)
    params = model.init()
    tx = optim.make_optimizer("adam", cfg.lr)
    opt_state = tx.init(params)
    adj = _fixed_graph_batch(int(cfg.seed), cfg.batch_size, cfg.P, cfg.graph_prob)
    rng = np.random.default_rng(int(cfg.seed))

    import functools

    @functools.partial(jax.jit, static_argnums=(3,))
    def train_step(params, opt_state, key_b, K, b, y):
        def loss_fn(p):
            Y, _ = model.apply(p, key_b, b, adj, K=K, training=True)
            lm, lf = losses.compute_loss(Y, y)
            return (lm + lf) / 2.0, lf  # (`unfolded_train.py:58`)

        (loss, lf), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, lf

    @functools.partial(jax.jit, static_argnums=(2,))
    def eval_step(params, key_b, K, b, y):
        Y, _ = model.apply(params, key_b, b, adj, K=K, training=True)
        lm, lf = losses.compute_loss(Y, y)
        return (lm + lf) / 2.0, lf

    csv = CSVLogger(["layer", "epoch", "train_loss", "valid_loss"])
    for k_depth in range(1, cfg.GHN_iter_num):
        for epoch in range(cfg.num_epochs):
            trs = []
            for b, y in data_ops.batch_iterator(rng, b_tr, y_tr, cfg.batch_size):
                key, kb = jax.random.split(key)
                params, opt_state, loss, lf = train_step(params, opt_state, kb, k_depth, b, y)
                trs.append(float(loss))
            vls = []
            for b, y in data_ops.batch_iterator(rng, b_va, y_va, cfg.batch_size):
                key, kb = jax.random.split(key)
                vl, _ = eval_step(params, kb, k_depth, b, y)
                vls.append(float(vl))
            tr = float(np.mean(trs)) if trs else float("nan")
            va = float(np.mean(vls)) if vls else float("nan")
            csv.append(layer=k_depth, epoch=epoch, train_loss=tr, valid_loss=va)
            log.cprint(f"layer {k_depth} | epoch {epoch + 1}/{cfg.num_epochs} | "
                       f"train {tr:.5f} | valid {va:.5f}")

    csv.write(os.path.join(out_dir, "losses_per_layer.csv"))
    np.save(os.path.join(out_dir, "A.npy"), np.asarray(A))
    np.save(os.path.join(out_dir, "seq_hyp.npy"), np.asarray(params["seq_hyp"]))
    save_json(os.path.join(out_dir, "args.json"), cfg.__dict__)
    print(f"\nAll results saved to '{out_dir}'")
    return {"params": params, "out_dir": out_dir}


if __name__ == "__main__":
    main()
