"""Scaling-model byte accounting, verified against the ACTUAL traced collectives.

The projection artifact (results_parity/scaling_projection.json,
utils/scaling_model.py) rests on two structural claims:

1. the packed ppermute ring sends exactly (s-1) blocks of [B_local, P_local, n]
   per device per solver iteration;
2. the data-parallel iteration has NO cross-DATA-axis collectives (with the NaN
   guard off; the guard adds only a scalar psum).

Both are checked here by walking the traced jaxpr of the real collectives and
summing ppermute operand bytes / inspecting axis names — if the ring schedule
changes shape, the analytic model fails loudly instead of silently projecting
stale traffic numbers.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from hyperparameter_gnn_unfolded_d_admm_main_tpu.models import dadmm_core, seq_hyperparam
from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import graphs, sensing
from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import topology as topo_lib
from hyperparameter_gnn_unfolded_d_admm_main_tpu.parallel import (
    mesh as mesh_lib, unfolded_sharded)
from hyperparameter_gnn_unfolded_d_admm_main_tpu.utils import scaling_model

pytestmark = [pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
), pytest.mark.mesh]


def _walk_eqns(jaxpr):
    """Yield every eqn in a jaxpr, recursing into sub-jaxprs (scan/cond/pjit/
    shard_map bodies)."""
    for eqn in jaxpr.eqns:
        yield eqn
        for v in eqn.params.values():
            for sub in _as_jaxprs(v):
                yield from _walk_eqns(sub)


def _as_jaxprs(v):
    out = []
    vals = v if isinstance(v, (tuple, list)) else [v]
    for x in vals:
        if hasattr(x, "jaxpr"):       # ClosedJaxpr
            out.append(x.jaxpr)
        elif hasattr(x, "eqns"):      # Jaxpr
            out.append(x)
    return out


def _collective_eqns(jaxpr, names=("ppermute", "all_gather", "psum",
                                  "all_to_all", "reduce_scatter")):
    return [e for e in _walk_eqns(jaxpr) if any(e.primitive.name.startswith(n)
                                                for n in names)]


def test_ring_bytes_match_traced_ppermutes():
    """Model claim 1: per-iteration ring traffic == sum of traced ppermute
    operand bytes in ONE consensus call."""
    s, B, Pg, n = 4, 8, 16, 32
    Pl = Pg // s
    mesh = mesh_lib.make_mesh(data=2, agents=s)
    B_local = B // 2
    adj = graphs.sample_connected_er(np.random.default_rng(0), B, Pg, 0.5)
    packed = topo_lib.pack_adjacency_sharded(adj, s)
    y = jnp.asarray(np.random.default_rng(1).standard_normal(
        (B, Pg, n)).astype(np.float32))

    packed_spec = topo_lib.ShardedPackedTopology(
        nbr_shard=P(mesh_lib.DATA_AXIS, mesh_lib.AGENT_AXIS),
        nbr_local=P(mesh_lib.DATA_AXIS, mesh_lib.AGENT_AXIS),
        mask=P(mesh_lib.DATA_AXIS, mesh_lib.AGENT_AXIS),
        deg=P(mesh_lib.DATA_AXIS, mesh_lib.AGENT_AXIS),
    )
    fn = jax.shard_map(
        lambda pk, yy: topo_lib.consensus_ring_packed(
            pk.nbr_shard, pk.nbr_local, pk.mask, pk.deg, yy,
            num_shards=s, axis_name=mesh_lib.AGENT_AXIS),
        mesh=mesh,
        in_specs=(packed_spec, P(mesh_lib.DATA_AXIS, mesh_lib.AGENT_AXIS)),
        out_specs=P(mesh_lib.DATA_AXIS, mesh_lib.AGENT_AXIS),
        check_vma=False,
    )
    jaxpr = jax.make_jaxpr(fn)(packed, y)
    pps = [e for e in _collective_eqns(jaxpr.jaxpr) if e.primitive.name == "ppermute"]
    assert len(pps) == s - 1, f"expected {s - 1} ring steps, traced {len(pps)}"
    traced_bytes = sum(
        int(np.prod(v.aval.shape)) * v.aval.dtype.itemsize
        for e in pps for v in e.invars if hasattr(v.aval, "shape"))
    model_bytes = scaling_model.ring_bytes_per_device_per_iter(s, B_local, Pl, n)
    assert traced_bytes == model_bytes, (traced_bytes, model_bytes)


def test_data_axis_has_no_per_iteration_collectives():
    """Model claim 2: with the NaN guard off, the sharded unroll's traced
    collectives never name the DATA axis — batch parallelism is collective-free
    per iteration (the ring only rides the agents axis)."""
    s, B, Pg, m, n, K = 4, 8, 16, 6, 32, 3
    mesh = mesh_lib.make_mesh(data=2, agents=s)
    A = sensing.set_A(jax.random.key(0), Pg, m, n)
    adj = jnp.asarray(graphs.sample_connected_er(
        np.random.default_rng(0), B, Pg, 0.5))
    b = jnp.asarray(np.random.default_rng(1).standard_normal(
        (B, Pg, m)).astype(np.float32))
    Atb = sensing.At_apply(A, b)
    st = dadmm_core.init_state(jax.random.key(1), B, Pg, n)
    table = seq_hyperparam.hyp_table(
        0.05 * jnp.ones((K, Pg, 4), jnp.float32),
        jnp.asarray([0.1, 0.99, 0.99, 0.99]))
    packed = topo_lib.pack_adjacency_sharded(np.asarray(adj), s)

    unroll = unfolded_sharded.make_sharded_unroll_packed(
        mesh, schedule="ppermute", gram_mode="factored", nan_guard=False,
        remat=False)
    jaxpr = jax.make_jaxpr(
        lambda *a: unroll(*a))(st, table, A, Atb, packed)
    colls = _collective_eqns(jaxpr.jaxpr)
    assert colls, "expected the agent-axis ring collectives in the trace"
    for e in colls:
        axes = e.params.get("axes", e.params.get("axis_name", ()))
        axes = (axes,) if isinstance(axes, str) else tuple(axes)
        assert mesh_lib.DATA_AXIS not in axes, (
            f"{e.primitive.name} crosses the data axis: {e.params}")


def test_nan_guard_data_collective_is_scalar_only():
    """The one cross-data-axis collective the guarded path adds is the finite
    check's SCALAR psum — bytes stay negligible, as the artifact states."""
    s, B, Pg, m, n, K = 4, 8, 16, 6, 32, 2
    mesh = mesh_lib.make_mesh(data=2, agents=s)
    A = sensing.set_A(jax.random.key(0), Pg, m, n)
    adj = jnp.asarray(graphs.sample_connected_er(
        np.random.default_rng(0), B, Pg, 0.5))
    b = jnp.asarray(np.random.default_rng(1).standard_normal(
        (B, Pg, m)).astype(np.float32))
    Atb = sensing.At_apply(A, b)
    st = dadmm_core.init_state(jax.random.key(1), B, Pg, n)
    table = seq_hyperparam.hyp_table(
        0.05 * jnp.ones((K, Pg, 4), jnp.float32),
        jnp.asarray([0.1, 0.99, 0.99, 0.99]))

    unroll = unfolded_sharded.make_sharded_unroll(mesh, nan_guard=True)
    jaxpr = jax.make_jaxpr(lambda *a: unroll(*a))(st, table,
                                                  sensing.gram(A), Atb, adj)
    for e in _collective_eqns(jaxpr.jaxpr):
        axes = e.params.get("axes", e.params.get("axis_name", ()))
        axes = (axes,) if isinstance(axes, str) else tuple(axes)
        if mesh_lib.DATA_AXIS in axes:
            for v in e.invars:
                assert np.prod(v.aval.shape) <= 1, (
                    f"non-scalar data-axis collective: {e.primitive.name} "
                    f"{v.aval.shape}")


def test_grad_psum_bytes():
    K, Pg = 15, 1024
    assert scaling_model.grad_psum_bytes_per_step(K, Pg) == 15 * 1024 * 4 * 4


def test_projection_artifact_is_current():
    """The committed artifact must match what the model produces today (claims
    generated from code, not memory — VERDICT r3 item 8)."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results_parity", "scaling_projection.json")
    if not os.path.exists(path):
        pytest.skip("projection artifact not generated yet")
    with open(path) as f:
        committed = json.load(f)
    fresh = scaling_model.build_projection()
    assert committed["verdict"]["data_axis_meets_target"] is True
    assert committed["data_axis"] == fresh["data_axis"]
    assert committed["agent_axis"] == fresh["agent_axis"]
    assert committed["agent_axis_halo"] == fresh["agent_axis_halo"]
    assert committed["halo_geometry"] == fresh["halo_geometry"]
    # and the headline numbers the DESIGN.md section quotes
    assert committed["verdict"]["data_axis_eff_4_hosts"] > 0.99
    assert committed["verdict"]["agent_axis_eff_2_shards_ici"] < 0.3
    # round 5: the halo schedule's headline — geometric graphs CLEAR the 80%
    # agent-axis target at 2 ICI shards (bf16 and f32); ER expanders do not
    assert committed["verdict"]["halo_meets_target_geometric_2_shards_bf16"] is True
    assert committed["verdict"]["halo_eff_geometric_2_shards_f32"] >= 0.8
    assert committed["verdict"]["halo_eff_er_2_shards_bf16"] < 0.8


def test_agent_axis_breakeven_formula():
    """The closed-form break-even n reproduces the projection: at n_max the
    2-shard projection efficiency is exactly the target."""
    n_max = scaling_model.agent_axis_breakeven_n(0.8, 2)
    pr = scaling_model.project_agent_axis(2, 1024, 256, n=int(round(n_max)), K=15)
    assert abs(pr.efficiency_vs_1host - 0.8) < 0.02