"""Optimizer construction (optax).

Reference optimizer configurations, reproduced:
- classic drivers: Adam(lr, betas=(0.9,0.999), weight_decay) or SGD+momentum, rebuilt
  every epoch (`utils.py:45-49` — rebuilding resets the moments; the classic trainer
  reproduces that quirk deliberately).
- unfolded driver: Adam(lr) (`unfolded_train_new.py:34`).
- progressive driver: AdamW(lr, wd=1e-5) + global-norm clip 100
  (`gnn_dlasso_progressive.py:39-47,203`).

All are wrapped in `optax.inject_hyperparams` so host-side schedulers (plateau /
progressive damping) can rewrite the learning rate between jitted steps without
recompilation.
"""

from __future__ import annotations

from typing import Optional

import optax


def make_optimizer(
    name: str = "adam",
    lr: float = 1e-4,
    weight_decay: float = 0.0,
    momentum: float = 0.0,
    clip_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    def build(learning_rate):
        if name == "adamw":
            tx = optax.adamw(learning_rate, b1=0.9, b2=0.999, weight_decay=weight_decay)
        elif name == "adam":
            if weight_decay:
                # torch Adam's weight_decay adds wd*p to the gradient (L2, not AdamW).
                tx = optax.chain(
                    optax.add_decayed_weights(weight_decay),
                    optax.adam(learning_rate, b1=0.9, b2=0.999),
                )
            else:
                tx = optax.adam(learning_rate, b1=0.9, b2=0.999)
        elif name == "sgd":
            tx = optax.sgd(learning_rate, momentum=momentum or None)
        else:
            raise ValueError(f"unknown optimizer {name!r}")
        if clip_norm is not None:
            tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
        return tx

    return optax.inject_hyperparams(build)(learning_rate=lr)


def set_learning_rate(opt_state, lr: float):
    """Rewrite the injected learning rate in-place (returns the updated state).

    The value is stored as a typed jnp scalar: a raw Python float changes the leaf's
    abstract type (weak-typed scalar vs f32[]) and forces a jit-cache miss — i.e. a
    full recompile of the train step every time the scheduler moves the LR."""
    import jax.numpy as jnp

    opt_state.hyperparams["learning_rate"] = jnp.float32(lr)
    return opt_state
