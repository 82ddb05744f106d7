"""Edge-cut halo exchange (`parallel/halo.py`): partition validity, dense
equivalence on the 8-device virtual mesh, full-unroll parity, and the byte
accounting the scaling projection quotes — verified against the traced
collectives, mirroring tests/test_scaling_model.py's ring checks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from hyperparameter_gnn_unfolded_d_admm_main_tpu.models import dadmm_core, seq_hyperparam
from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import graphs, sensing
from hyperparameter_gnn_unfolded_d_admm_main_tpu.parallel import (
    halo, mesh as mesh_lib, unfolded_sharded)
from hyperparameter_gnn_unfolded_d_admm_main_tpu.utils import scaling_model

pytestmark = [pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
), pytest.mark.mesh]

DATA, AGENTS = mesh_lib.DATA_AXIS, mesh_lib.AGENT_AXIS


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _assign_of(perm, Pl):
    return halo.inverse_perm(perm) // Pl


def test_partition_is_valid_and_balanced(rng):
    for Pn, s in ((16, 4), (64, 8), (24, 2)):
        adj = graphs.sample_connected_er(rng, 2, Pn, 0.3)
        perm = halo.greedy_equal_partition(adj, s)
        assert sorted(perm.tolist()) == list(range(Pn))
        assign = _assign_of(perm, Pn // s)
        counts = np.bincount(assign, minlength=s)
        assert (counts == Pn // s).all()


def test_partition_finds_geometric_structure(rng):
    """On a spatial graph the greedy partition must beat the naive contiguous
    split decisively (this is the whole point of the schedule)."""
    Pn, s = 64, 4
    adj = graphs.sample_geometric(rng, Pn, 0.25)
    perm = halo.greedy_equal_partition(adj, s)
    cut_naive = halo.edge_cut(adj, np.arange(Pn) // (Pn // s), s)
    cut_greedy = halo.edge_cut(adj, _assign_of(perm, Pn // s), s)
    assert cut_greedy < 0.7 * cut_naive


def test_halo_neighbor_sum_matches_dense(rng):
    """Per-sample ER batch: halo exchange == dense masked matmul."""
    B, Pn, n, s = 4, 16, 8, 4
    adj = graphs.sample_connected_er(rng, B, Pn, 0.3)
    perm = halo.greedy_equal_partition(adj, s)
    adj_p, = halo.permute_agents(perm, adj)
    topo = halo.build_halo(adj_p, s)
    y = rng.standard_normal((B, Pn, n)).astype(np.float32)
    want = np.einsum("bpq,bqn->bpn", adj_p, y)

    mesh = mesh_lib.make_mesh(2, s)
    fn = jax.jit(jax.shard_map(
        lambda t, yl: halo.halo_neighbor_sum(t, yl, s),
        mesh=mesh, in_specs=(topo.spec(), P(DATA, AGENTS)),
        out_specs=P(DATA, AGENTS), check_vma=False))
    got = np.asarray(fn(topo, jnp.asarray(y)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_halo_consensus_delta_matches_dense(rng):
    B, Pn, n, s = 4, 24, 6, 8
    adj = graphs.sample_connected_er(rng, B, Pn, 0.4)
    perm = halo.greedy_equal_partition(adj, s)
    adj_p, = halo.permute_agents(perm, adj)
    topo = halo.build_halo(adj_p, s)
    y = rng.standard_normal((B, Pn, n)).astype(np.float32)
    want = np.asarray(graphs.consensus_delta(jnp.asarray(adj_p), jnp.asarray(y)))

    mesh = mesh_lib.make_mesh(1, s)
    fn = jax.jit(jax.shard_map(
        lambda t, yl: halo.halo_consensus_delta(t, yl, s),
        mesh=mesh, in_specs=(topo.spec(), P(DATA, AGENTS)),
        out_specs=P(DATA, AGENTS), check_vma=False))
    got = np.asarray(fn(topo, jnp.asarray(y)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_halo_weights_matches_weighted_dense(rng):
    """`weights=` path (the GCN-style aggregation hook): arbitrary per-edge
    coefficients in packed [B, P, D] order."""
    B, Pn, n, s = 2, 16, 5, 4
    adj = graphs.sample_connected_er(rng, B, Pn, 0.4)
    perm = halo.greedy_equal_partition(adj, s)
    adj_p, = halo.permute_agents(perm, adj)
    topo = halo.build_halo(adj_p, s)
    # random weights on the packed slots; dense equivalent via scatter
    w = (rng.standard_normal(topo.mask.shape).astype(np.float32)
         * np.asarray(topo.mask))
    dense_w = np.zeros((B, Pn, Pn), np.float32)
    nbr = np.asarray(topo.nbr_buf)  # NOTE: buffer-indexed; rebuild from adj instead
    for b in range(B):
        for p in range(Pn):
            qs = np.nonzero(adj_p[b, p])[0]
            for d, q in enumerate(qs):
                dense_w[b, p, q] = w[b, p, d]
    del nbr
    y = rng.standard_normal((B, Pn, n)).astype(np.float32)
    want = np.einsum("bpq,bqn->bpn", dense_w, y)

    mesh = mesh_lib.make_mesh(2, s)
    fn = jax.jit(jax.shard_map(
        lambda t, ww, yl: halo.halo_neighbor_sum(t, yl, s, weights=ww),
        mesh=mesh,
        in_specs=(topo.spec(), P(DATA, AGENTS, None), P(DATA, AGENTS)),
        out_specs=P(DATA, AGENTS), check_vma=False))
    got = np.asarray(fn(topo, jnp.asarray(w), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("gram_mode", ["gram", "factored"])
def test_sharded_unroll_halo_matches_dense(rng, gram_mode):
    """Full K-iteration unroll through the halo schedule == the dense
    single-device trajectory (permute the problem in, un-permute the result)."""
    mesh = mesh_lib.make_mesh(2, 4)
    s = 4
    B, Pn, m, n, K = 4, 8, 6, 16, 4
    A = sensing.set_A(jax.random.key(0), Pn, m, n)
    AtA = sensing.gram(A)
    adj_np = graphs.sample_connected_er(rng, B, Pn, 0.5)
    b = jnp.asarray(rng.standard_normal((B, Pn, m)).astype(np.float32))
    Atb = sensing.At_apply(A, b)
    state = dadmm_core.init_state(jax.random.key(1), B, Pn, n)
    table = seq_hyperparam.hyp_table(
        jnp.asarray(rng.standard_normal((K, Pn, 4)).astype(np.float32)),
        jnp.asarray([0.1, 0.99, 0.99, 0.99]),
    )
    dense = dadmm_core.unroll_table(state, table, AtA, Atb, jnp.asarray(adj_np))

    perm = halo.greedy_equal_partition(adj_np, s)
    adj_p, = halo.permute_agents(perm, adj_np)
    topo = halo.build_halo(adj_p, s)
    pj = jnp.asarray(perm)
    state_p = dadmm_core.SolverState(
        y=state.y[:, pj], U=state.U[:, pj], delta=state.delta[:, pj])
    op = (AtA if gram_mode == "gram" else A)[pj]
    unroll = unfolded_sharded.make_sharded_unroll_halo(
        mesh, topo, gram_mode=gram_mode)
    got = unroll(state_p, table[:, pj], op, Atb[:, pj], topo)
    inv = jnp.asarray(halo.inverse_perm(perm))
    np.testing.assert_allclose(
        np.asarray(got[:, :, inv]), np.asarray(dense), rtol=2e-5, atol=2e-5)


def _walk_eqns(jaxpr):
    for eqn in jaxpr.eqns:
        yield eqn
        for v in eqn.params.values():
            vals = v if isinstance(v, (tuple, list)) else [v]
            for x in vals:
                sub = getattr(x, "jaxpr", x if hasattr(x, "eqns") else None)
                if sub is not None:
                    yield from _walk_eqns(sub)


def test_halo_bytes_match_traced_ppermutes(rng):
    """The scaling model's halo byte accounting == the traced ppermute operand
    bytes of one halo neighbor-sum call (the same verification discipline as the
    ring model — utils/scaling_model.py round-4 rows)."""
    B, Pn, n, s = 8, 32, 16, 4
    adj = graphs.sample_connected_er(rng, B, Pn, 0.2)
    perm = halo.greedy_equal_partition(adj, s)
    adj_p, = halo.permute_agents(perm, adj)
    topo = halo.build_halo(adj_p, s)
    mesh = mesh_lib.make_mesh(2, s)
    B_local = B // 2
    y = jnp.asarray(rng.standard_normal((B, Pn, n)).astype(np.float32))
    fn = jax.shard_map(
        lambda t, yl: halo.halo_neighbor_sum(t, yl, s),
        mesh=mesh, in_specs=(topo.spec(), P(DATA, AGENTS)),
        out_specs=P(DATA, AGENTS), check_vma=False)
    jaxpr = jax.make_jaxpr(fn)(topo, y)
    pps = [e for e in _walk_eqns(jaxpr.jaxpr) if e.primitive.name == "ppermute"]
    n_nonempty = sum(1 for h in topo.halo_sizes() if h > 0)
    assert len(pps) == n_nonempty
    traced = sum(int(np.prod(v.aval.shape)) * v.aval.dtype.itemsize
                 for e in pps for v in e.invars if hasattr(v.aval, "shape"))
    model = halo.halo_bytes_per_device_per_iter(topo.halo_sizes(), B_local, n)
    assert traced == model, (traced, model)


def test_empty_halo_offsets_emit_no_collective():
    """Two disconnected cliques partitioned 2-ways: zero cross edges, so the
    exchange is statically absent (the partitioned-geometric selling point)."""
    Pn, s = 8, 2
    adj = np.zeros((1, Pn, Pn), np.float32)
    adj[0, :4, :4] = 1 - np.eye(4)
    adj[0, 4:, 4:] = 1 - np.eye(4)
    perm = halo.greedy_equal_partition(adj, s)
    adj_p, = halo.permute_agents(perm, adj)
    topo = halo.build_halo(adj_p, s)
    assert topo.halo_sizes() == (0,)
    mesh = mesh_lib.make_mesh(1, s)
    y = jnp.zeros((1, Pn, 3), jnp.float32)
    fn = jax.shard_map(
        lambda t, yl: halo.halo_neighbor_sum(t, yl, s),
        mesh=mesh, in_specs=(topo.spec(), P(DATA, AGENTS)),
        out_specs=P(DATA, AGENTS), check_vma=False)
    jaxpr = jax.make_jaxpr(fn)(topo, y)
    pps = [e for e in _walk_eqns(jaxpr.jaxpr) if e.primitive.name == "ppermute"]
    assert not pps


def test_halo_projection_functions():
    """Projection plumbing: measured_halo is deterministic; the halo projection
    beats the ring projection wherever the halo is smaller; break-even rows
    formula round-trips through the projection."""
    g1 = scaling_model.measured_halo(64, 4, kind="geometric", seed=7)
    g2 = scaling_model.measured_halo(64, 4, kind="geometric", seed=7)
    assert g1 == g2
    assert g1["halo_rows"] <= g1["ring_rows"]

    ring = scaling_model.project_agent_axis(2, 1024, 256, 512, 15)
    hal = scaling_model.project_agent_axis_halo(
        2, 1024, 256, 512, 15, halo_rows=64)
    assert hal.efficiency_vs_1host > ring.efficiency_vs_1host

    rows = scaling_model.halo_breakeven_rows(0.8, 2, 512, dtype_bytes=2)
    pr = scaling_model.project_agent_axis_halo(
        2, 1024, 256, 512, 15, halo_rows=int(round(rows)), dtype_bytes=2)
    assert abs(pr.efficiency_vs_1host - 0.8) < 0.02


# ------------------------------------------------- quantized wire format (round 5)

def _halo_sum_fn(topo, s, mesh, comm_dtype):
    return jax.jit(jax.shard_map(
        lambda t, yl: halo.halo_neighbor_sum(t, yl, s, comm_dtype=comm_dtype),
        mesh=mesh, in_specs=(topo.spec(), P(DATA, AGENTS)),
        out_specs=P(DATA, AGENTS), check_vma=False))


@pytest.mark.parametrize("comm_dtype,rel_tol", [("bfloat16", 2e-2), ("int8", 4e-2)])
def test_halo_comm_dtype_close_to_dense(rng, comm_dtype, rel_tol):
    """Compressed wire formats stay within their quantization error of the dense
    neighbor sum: bf16 ~2^-8 per element, int8 ~scale/2 = max|row|/254 per
    element, summed over <=D neighbor rows."""
    B, Pn, n, s = 4, 16, 8, 4
    adj = graphs.sample_connected_er(rng, B, Pn, 0.3)
    perm = halo.greedy_equal_partition(adj, s)
    adj_p, = halo.permute_agents(perm, adj)
    topo = halo.build_halo(adj_p, s)
    y = rng.standard_normal((B, Pn, n)).astype(np.float32)
    want = np.einsum("bpq,bqn->bpn", adj_p, y)

    mesh = mesh_lib.make_mesh(2, s)
    got = np.asarray(_halo_sum_fn(topo, s, mesh, comm_dtype)(topo, jnp.asarray(y)))
    denom = np.abs(want).max()
    assert np.abs(got - want).max() / denom < rel_tol
    # the error must actually be bounded by the per-row quantization radius
    # times the degree (deterministic worst case, not a statistical fluke)
    D = int(np.asarray(topo.deg).max())
    radius = (np.abs(y).max() / 254.0) if comm_dtype == "int8" else 2.0 ** -8 * np.abs(y).max()
    assert np.abs(got - want).max() <= D * radius * 1.5


def test_halo_comm_dtype_exact_when_no_cross_edges():
    """Quantization only touches the WIRE: with an empty halo (two cliques,
    2-way partition) int8 mode is bit-identical to the exact path."""
    Pn, s = 8, 2
    adj = np.zeros((1, Pn, Pn), np.float32)
    adj[0, :4, :4] = 1 - np.eye(4)
    adj[0, 4:, 4:] = 1 - np.eye(4)
    perm = halo.greedy_equal_partition(adj, s)
    adj_p, = halo.permute_agents(perm, adj)
    topo = halo.build_halo(adj_p, s)
    assert topo.halo_sizes() == (0,)
    mesh = mesh_lib.make_mesh(1, s)
    y = jnp.asarray(np.random.default_rng(3).standard_normal((1, Pn, 5)), jnp.float32)
    exact = np.asarray(_halo_sum_fn(topo, s, mesh, None)(topo, y))
    quant = np.asarray(_halo_sum_fn(topo, s, mesh, "int8")(topo, y))
    np.testing.assert_array_equal(exact, quant)


def test_halo_int8_bytes_match_traced_ppermutes(rng):
    """int8 wire bytes (payload + per-row f32 scale) == the traced ppermute
    operand bytes, same discipline as the exact-path byte test."""
    B, Pn, n, s = 8, 32, 16, 4
    adj = graphs.sample_connected_er(rng, B, Pn, 0.2)
    perm = halo.greedy_equal_partition(adj, s)
    adj_p, = halo.permute_agents(perm, adj)
    topo = halo.build_halo(adj_p, s)
    mesh = mesh_lib.make_mesh(2, s)
    B_local = B // 2
    y = jnp.asarray(rng.standard_normal((B, Pn, n)).astype(np.float32))
    fn = jax.shard_map(
        lambda t, yl: halo.halo_neighbor_sum(t, yl, s, comm_dtype="int8"),
        mesh=mesh, in_specs=(topo.spec(), P(DATA, AGENTS)),
        out_specs=P(DATA, AGENTS), check_vma=False)
    jaxpr = jax.make_jaxpr(fn)(topo, y)
    pps = [e for e in _walk_eqns(jaxpr.jaxpr) if e.primitive.name == "ppermute"]
    n_nonempty = sum(1 for h in topo.halo_sizes() if h > 0)
    assert len(pps) == 2 * n_nonempty          # payload + scale per offset
    traced = sum(int(np.prod(v.aval.shape)) * v.aval.dtype.itemsize
                 for e in pps for v in e.invars if hasattr(v.aval, "shape"))
    model = halo.halo_bytes_per_device_per_iter(
        topo.halo_sizes(), B_local, n, dtype_bytes=1, scale_bytes_per_row=4)
    assert traced == model, (traced, model)


@pytest.mark.parametrize("comm_dtype,tol", [("bfloat16", 2e-2), ("int8", 6e-2)])
def test_sharded_unroll_halo_comm_dtype_tracks_dense(rng, comm_dtype, tol):
    """Full K-iteration unroll with a compressed wire stays close to the dense
    trajectory end-to-end (inexact consensus; D-ADMM's proximal updates keep the
    perturbation from compounding — the measured artifact quantifies NMSE)."""
    mesh = mesh_lib.make_mesh(2, 4)
    s = 4
    B, Pn, m, n, K = 4, 8, 6, 16, 4
    A = sensing.set_A(jax.random.key(0), Pn, m, n)
    AtA = sensing.gram(A)
    adj_np = graphs.sample_connected_er(rng, B, Pn, 0.5)
    b = jnp.asarray(rng.standard_normal((B, Pn, m)).astype(np.float32))
    Atb = sensing.At_apply(A, b)
    state = dadmm_core.init_state(jax.random.key(1), B, Pn, n)
    table = seq_hyperparam.hyp_table(
        jnp.asarray(rng.standard_normal((K, Pn, 4)).astype(np.float32)),
        jnp.asarray([0.1, 0.99, 0.99, 0.99]),
    )
    dense = dadmm_core.unroll_table(state, table, AtA, Atb, jnp.asarray(adj_np))

    perm = halo.greedy_equal_partition(adj_np, s)
    adj_p, = halo.permute_agents(perm, adj_np)
    topo = halo.build_halo(adj_p, s)
    pj = jnp.asarray(perm)
    state_p = dadmm_core.SolverState(
        y=state.y[:, pj], U=state.U[:, pj], delta=state.delta[:, pj])
    unroll = unfolded_sharded.make_sharded_unroll_halo(
        mesh, topo, gram_mode="gram", comm_dtype=comm_dtype)
    got = unroll(state_p, table[:, pj], AtA[pj], Atb[:, pj], topo)
    inv = jnp.asarray(halo.inverse_perm(perm))
    err = np.abs(np.asarray(got[:, :, inv]) - np.asarray(dense))
    rel = err.max() / np.abs(np.asarray(dense)).max()
    assert rel < tol, rel


def test_halo_int8_projection_rows():
    """The int8 projection accounts the scale overhead and strictly improves on
    bf16 at equal halo geometry; the committed verdict keys exist."""
    bf16 = scaling_model.project_agent_axis_halo(
        2, 1024, 256, 512, 15, halo_rows=300, dtype_bytes=2)
    i8 = scaling_model.project_agent_axis_halo(
        2, 1024, 256, 512, 15, halo_rows=300, dtype_bytes=1,
        scale_bytes_per_row=4)
    assert i8.efficiency_vs_1host > bf16.efficiency_vs_1host
    assert i8.bytes_per_device_per_iter == 300 * 256 * (512 + 4)
    rows = scaling_model.halo_breakeven_rows(
        0.8, 2, 512, dtype_bytes=1, scale_bytes_per_row=4)
    pr = scaling_model.project_agent_axis_halo(
        2, 1024, 256, 512, 15, halo_rows=int(round(rows)), dtype_bytes=1,
        scale_bytes_per_row=4)
    assert abs(pr.efficiency_vs_1host - 0.8) < 0.02
