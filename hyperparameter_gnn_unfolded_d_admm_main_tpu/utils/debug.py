"""Numerical-failure debugging: checkify-instrumented solver runs.

The reference's only failure handling is silent state resets on NaN/Inf
(`unfolded_DLASSO.py:55-61,84-87,102-104`) — reproduced flag-gated as `nan_guard`.
This module adds the debugging surface the reference lacks (SURVEY.md §5): run the
unroll under `jax.experimental.checkify` float checks to locate the FIRST operation
that produced a non-finite value, instead of watching a guard silently reset state.

Use when a run trips the guards (or diverges with them off):

    from hyperparameter_gnn_unfolded_d_admm_main_tpu.utils import debug
    debug.check_unroll(state, table, AtA, Atb, adj)   # raises with op location

Checkify instruments every op, so this path is for diagnosis, not production speed.
"""

from __future__ import annotations

import jax
from jax.experimental import checkify

from ..models import dadmm_core


def check_unroll(state, hyp_table, AtA, Atb, adj, **unroll_kw):
    """Run `dadmm_core.unroll_table` under checkify float checks.

    Returns Y on success; raises `checkify.JaxRuntimeError` naming the first
    NaN/Inf-producing operation otherwise. `nan_guard` defaults OFF here — the
    guards would mask exactly the event being hunted.
    """
    unroll_kw.setdefault("nan_guard", False)

    def run(state, hyp_table, AtA, Atb, adj):
        return dadmm_core.unroll_table(state, hyp_table, AtA, Atb, adj, **unroll_kw)

    checked = checkify.checkify(jax.jit(run), errors=checkify.float_checks)
    err, Y = checked(state, hyp_table, AtA, Atb, adj)
    err.throw()
    return Y
