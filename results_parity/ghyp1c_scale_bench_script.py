import time, functools
import numpy as np, jax, jax.numpy as jnp, optax
from hyperparameter_gnn_unfolded_d_admm_main_tpu.config import Config
from hyperparameter_gnn_unfolded_d_admm_main_tpu.models.gnn_hypernet import (
    DLASSOGNNHyp, DLASSOGNNHypOneShotCorrected)
from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import data as data_ops, graphs, sensing
from hyperparameter_gnn_unfolded_d_admm_main_tpu.train import losses, optim

cfg = Config(P=64, m=100, n=512, GHyp_hidden=100, GHN_iter_num=15, batch_size=64,
             gram_mode="factored", data_noise=True)
A = sensing.set_A(jax.random.key(0), cfg.P, cfg.m, cfg.n)
b, y = data_ops.make_dataset(jax.random.key(2), A, cfg.batch_size, noise=True)
adj = jnp.asarray(graphs.fast_sample_connected_er(0, cfg.batch_size, cfg.P, 0.3))

for name, model_cls in (("GHyp1c", DLASSOGNNHypOneShotCorrected), ("GHyp", DLASSOGNNHyp)):
    model = model_cls(A, cfg)
    params, norm_state = model.init(jax.random.key(1))
    tx = optim.make_optimizer("adamw", 9e-4, weight_decay=1e-5, clip_norm=100.0)
    opt_state = tx.init(params)
    key = jax.random.key(3)
    K = 15

    @functools.partial(jax.jit, static_argnums=(4,))
    def step(params, norm_state, opt_state, key, K):
        def loss_fn(p):
            per_kp, hyp, new_state = model.apply_losses(p, norm_state, key, b, adj, y,
                                                        training_iterations=K, training=True)
            lm, lf = losses.losses_from_per_kp(per_kp)
            return lf, (lm, new_state)
        (lf, (lm, ns)), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt2 = tx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), ns, opt2, lf

    params, norm_state, opt_state, lf = step(params, norm_state, opt_state, key, K)
    jax.block_until_ready(lf)  # compile
    N = 30
    t0 = time.perf_counter()
    for i in range(N):
        key, k2 = jax.random.split(key)
        params, norm_state, opt_state, lf = step(params, norm_state, opt_state, k2, K)
    jax.block_until_ready(lf)
    dt = time.perf_counter() - t0
    print(f"{name} train step P=64 B=64 n=512 K=15: {N/dt:.1f} steps/s = "
          f"{N*K/dt:.0f} D-ADMM iter/s (fwd+bwd), loss {float(lf):.4f}")
