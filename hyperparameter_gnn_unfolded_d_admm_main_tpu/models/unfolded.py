"""Unfolded D-ADMM LASSO with a learned scalar hyperparameter table.

TPU-native re-design of reference `unfolded_DLASSO.py:9-146` (`DLASSO_unfolded`): the
per-agent Gram matvec is one einsum, neighbor consensus is `2 * L @ y`, the K loop is a
`lax.scan`, and the learned table is `models.seq_hyperparam`. Parameters are a plain
pytree; `apply` is a pure function suitable for jit/grad/pjit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops import sensing
from . import dadmm_core, seq_hyperparam


class UnfoldedDLASSO:
    """Holds static problem data (A, Gram, config); parameters live in a pytree."""

    def __init__(self, A: jax.Array, cfg: Config):
        self.A = A                       # [P, m, n]
        self.AtA = sensing.gram(A)       # [P, n, n]
        self.P, self.m, self.n = A.shape
        self.K = cfg.GHN_iter_num
        self.cfg = cfg
        self.max_param = jnp.asarray(
            [cfg.alpha_max, cfg.tau_max, cfg.rho_max, cfg.eta_max], dtype=A.dtype
        )

    def init(self, key: Optional[jax.Array] = None) -> dict:
        del key  # zero init (`unfolded_DLASSO.py:152`)
        return {
            "seq_hyp": seq_hyperparam.init_table(
                self.K, self.P, self.cfg.DADMM_mode, dtype=self.A.dtype
            )
        }

    def apply(
        self,
        params: dict,
        key: jax.Array,
        b: jax.Array,
        adj: jax.Array,
        K: Optional[int] = None,
        training: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """Run K unfolded iterations.

        b: observations [B, P, m]; adj: batched adjacency [B, P, P].
        Returns (Y [K, B, P, n], hyp at the final iteration [Pp, 4]) matching the
        reference forward contract (`unfolded_DLASSO.py:34-110`).
        """
        K = self.K if K is None else min(K, self.K)
        batch = b.shape[0]
        Atb = sensing.At_apply(self.A, b)
        state = dadmm_core.init_state(key, batch, self.P, self.n, dtype=b.dtype)
        table = seq_hyperparam.hyp_table(
            params["seq_hyp"],
            self.max_param,
            training=training,
            max_penalty_threshold=self.cfg.max_penalty_threshold,
            penalty_reduction_factor=self.cfg.penalty_reduction_factor,
        )[:K]
        Y = dadmm_core.unroll_table(
            state,
            table,
            self.AtA,
            Atb,
            adj,
            clamp_fn=dadmm_core.unfolded_clamps,
            nan_guard=self.cfg.nan_guard,
            remat=self.cfg.remat,
            use_pallas=self.cfg.use_pallas,
            matmul_dtype=self.cfg.matmul_dtype if self.cfg.matmul_dtype != "float32" else None,
            A=self.A,
            gram_mode=self.cfg.gram_mode,
            solver_dtype=self.cfg.dtype if self.cfg.dtype != "float32" else None,
        )
        return Y, table[K - 1]

    def apply_final(
        self,
        params: dict,
        key: jax.Array,
        b: jax.Array,
        adj: jax.Array,
        K: Optional[int] = None,
        training: bool = True,
    ) -> jax.Array:
        """Serving fast path: final iterate `y [B, P, n]` only — no stacked-Y
        materialization (measured +26% over `apply(...)[0][-1]` at the P=64
        headline shape; see `dadmm_core.unroll_table_final`). Same trajectory."""
        K = self.K if K is None else min(K, self.K)
        batch = b.shape[0]
        Atb = sensing.At_apply(self.A, b)
        state = dadmm_core.init_state(key, batch, self.P, self.n, dtype=b.dtype)
        table = seq_hyperparam.hyp_table(
            params["seq_hyp"],
            self.max_param,
            training=training,
            max_penalty_threshold=self.cfg.max_penalty_threshold,
            penalty_reduction_factor=self.cfg.penalty_reduction_factor,
        )[:K]
        return dadmm_core.unroll_table_final(
            state, table, self.AtA, Atb, adj,
            clamp_fn=dadmm_core.unfolded_clamps,
            nan_guard=self.cfg.nan_guard,
            matmul_dtype=self.cfg.matmul_dtype if self.cfg.matmul_dtype != "float32" else None,
            A=self.A,
            gram_mode=self.cfg.gram_mode,
            solver_dtype=self.cfg.dtype if self.cfg.dtype != "float32" else None,
        )

    def apply_losses(
        self,
        params: dict,
        key: jax.Array,
        b: jax.Array,
        adj: jax.Array,
        label: jax.Array,
        K: Optional[int] = None,
        training: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """Fast training path: per-iteration per-agent MSEs `[K, P]` computed inside
        the scan (no stacked-Y materialization); feed to
        `train.losses.losses_from_per_kp`. Returns (per_kp, hyp at final iteration)."""
        K = self.K if K is None else min(K, self.K)
        batch = b.shape[0]
        Atb = sensing.At_apply(self.A, b)
        state = dadmm_core.init_state(key, batch, self.P, self.n, dtype=b.dtype)
        table = seq_hyperparam.hyp_table(
            params["seq_hyp"],
            self.max_param,
            training=training,
            max_penalty_threshold=self.cfg.max_penalty_threshold,
            penalty_reduction_factor=self.cfg.penalty_reduction_factor,
        )[:K]
        per_kp = dadmm_core.unroll_table_losses(
            state, table, self.AtA, Atb, adj, label,
            clamp_fn=dadmm_core.unfolded_clamps,
            nan_guard=self.cfg.nan_guard,
            remat=self.cfg.remat,
            matmul_dtype=self.cfg.matmul_dtype if self.cfg.matmul_dtype != "float32" else None,
            A=self.A,
            gram_mode=self.cfg.gram_mode,
            solver_dtype=self.cfg.dtype if self.cfg.dtype != "float32" else None,
        )
        return per_kp, table[K - 1]
