"""Learned per-iteration hyperparameter table with cumulative-sum parameterization.

TPU-native equivalent of reference `unfolded_DLASSO.py:148-168` (`seq_hyperparam`): the
raw parameter is a zero-initialized table `[K, Pp, 4]` (Pp=P for 'diff', 1 for 'same');
the effective hyperparameters at iteration k are

    hyp(k) = clamp(sigmoid(sum_{i<=k} param_i) * max_param, 1e-4, 0.99)

so later iterations are learned *offsets* from earlier ones. During training a soft
penalty rescales any iteration whose mean hyperparameter exceeds a threshold
(`unfolded_DLASSO.py:160-165`). Instead of evaluating per-k inside the unroll, the whole
`[K, Pp, 4]` table is materialized in one shot (cumsum + sigmoid are cheap) and fed to
`dadmm_core.unroll_table` as scan inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_table(K: int, P: int, mode: str = "diff", dtype=jnp.float32, width: int = 4) -> jax.Array:
    """Zero-initialized raw table (`unfolded_DLASSO.py:152`). mode 'same' shares one row
    across agents (`unfolded_DLASSO.py:21-24`). width=4 for dlasso (alpha,tau,rho,eta),
    6 for dlr (rho,alpha,delta,eta,gamma,beta)."""
    Pp = 1 if mode == "same" else P
    return jnp.zeros((K, Pp, width), dtype=dtype)


def hyp_table(
    raw: jax.Array,
    max_param: jax.Array,
    training: bool = True,
    max_penalty_threshold: float = 0.8,
    penalty_reduction_factor: float = 0.95,
) -> jax.Array:
    """Effective hyperparameters for every iteration at once: `[K, Pp, 4]`.

    max_param: `[4]` = (alpha_max, tau_max, rho_max, eta_max).
    """
    hyp = jax.nn.sigmoid(jnp.cumsum(raw, axis=0)) * max_param[None, None, :]
    if training:
        # Per-iteration mean over (agents x 4 params); rescale iterations whose mean is
        # too close to the caps (`unfolded_DLASSO.py:160-165`).
        means = jnp.mean(hyp, axis=(1, 2))
        scale = jnp.where(means > max_penalty_threshold, penalty_reduction_factor, 1.0)
        hyp = hyp * scale[:, None, None]
    return jnp.clip(hyp, 1e-4, 0.99)
