"""Sharding layer on the 8-device virtual CPU mesh: collective consensus parity,
sharded solver parity vs dense, GSPMD train step, mesh construction."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyperparameter_gnn_unfolded_d_admm_main_tpu.config import Config
from hyperparameter_gnn_unfolded_d_admm_main_tpu.models import dadmm_core, seq_hyperparam
from hyperparameter_gnn_unfolded_d_admm_main_tpu.models.gnn_hypernet import DLASSOGNNHyp
from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import data as data_ops
from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import graphs, sensing
from hyperparameter_gnn_unfolded_d_admm_main_tpu.parallel import (
    consensus as consensus_lib,
    mesh as mesh_lib,
    shard_step,
    unfolded_sharded,
)
from hyperparameter_gnn_unfolded_d_admm_main_tpu.train import losses, optim
from jax.sharding import PartitionSpec as P


pytestmark = [pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
), pytest.mark.mesh]


def _mesh(data=2, agents=4):
    return mesh_lib.make_mesh(data=data, agents=agents)


def test_auto_mesh_divisibility():
    m = mesh_lib.auto_mesh(8, P_agents=8)
    assert m.shape[mesh_lib.AGENT_AXIS] * m.shape[mesh_lib.DATA_AXIS] == 8
    assert 8 % m.shape[mesh_lib.AGENT_AXIS] == 0
    m2 = mesh_lib.auto_mesh(8, P_agents=5)  # P=5: agent axis must divide 5
    assert m2.shape[mesh_lib.AGENT_AXIS] in (1, 5)


@pytest.mark.parametrize("schedule", ["allgather", "ppermute"])
def test_collective_consensus_matches_dense(rng, schedule):
    mesh = _mesh()
    B, Pn, n = 4, 8, 16
    adj = jnp.asarray(graphs.sample_connected_er(rng, B, Pn, 0.5))
    y = jnp.asarray(rng.standard_normal((B, Pn, n)).astype(np.float32))
    want = np.asarray(graphs.consensus_delta(adj, y))

    num_shards = mesh.shape[mesh_lib.AGENT_AXIS]
    if schedule == "allgather":
        fn = consensus_lib.consensus_allgather
    else:
        import functools
        fn = functools.partial(consensus_lib.consensus_ppermute, num_shards=num_shards)

    shard_fn = jax.jit(
        jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(
                P(mesh_lib.DATA_AXIS, mesh_lib.AGENT_AXIS, None),
                P(mesh_lib.DATA_AXIS, mesh_lib.AGENT_AXIS),
            ),
            out_specs=P(mesh_lib.DATA_AXIS, mesh_lib.AGENT_AXIS),
            check_vma=False,
        )
    )
    got = np.asarray(shard_fn(adj, y))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("schedule", ["allgather", "ppermute"])
def test_sharded_unroll_matches_dense(rng, schedule):
    mesh = _mesh()
    B, Pn, m, n, K = 4, 8, 6, 16, 4
    A = sensing.set_A(jax.random.key(0), Pn, m, n)
    AtA = sensing.gram(A)
    adj = jnp.asarray(graphs.sample_connected_er(rng, B, Pn, 0.5))
    b = jnp.asarray(rng.standard_normal((B, Pn, m)).astype(np.float32))
    Atb = sensing.At_apply(A, b)
    state = dadmm_core.init_state(jax.random.key(1), B, Pn, n)
    table = seq_hyperparam.hyp_table(
        jnp.asarray(rng.standard_normal((K, Pn, 4)).astype(np.float32)),
        jnp.asarray([0.1, 0.99, 0.99, 0.99]),
    )

    dense = dadmm_core.unroll_table(state, table, AtA, Atb, adj)
    unroll = unfolded_sharded.make_sharded_unroll(mesh, schedule=schedule)
    sharded = unroll(state, table, AtA, Atb, adj)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense), rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_gspmd_train_step_runs_and_matches_unsharded(rng):
    mesh = _mesh(data=2, agents=4)
    cfg = Config(P=8, m=6, n=12, GHyp_hidden=4, GHN_iter_num=2, batch_size=4, lr=1e-3)
    A = sensing.set_A(jax.random.key(0), cfg.P, cfg.m, cfg.n)
    model = DLASSOGNNHyp(A, cfg)
    params, norm_state = model.init(jax.random.key(1))
    tx = optim.make_optimizer("adamw", cfg.lr, weight_decay=1e-5, clip_norm=100.0)
    opt_state = tx.init(params)
    b, y = data_ops.make_dataset(jax.random.key(2), A, cfg.batch_size)
    adj = jnp.asarray(graphs.sample_connected_er(rng, cfg.batch_size, cfg.P, 0.5))
    key = jax.random.key(3)

    # unsharded baseline
    def loss_fn(p):
        out = model.apply(p, norm_state, key, b, adj, training_iterations=2, training=True)
        lm, lf = losses.compute_loss(out.Y, y)
        return lf

    lf_base = float(loss_fn(params))

    bs, ys, adjs = mesh_lib.shard_batch(mesh, b, y, adj)
    params_r, state_r, opt_r = mesh_lib.replicate(mesh, (params, norm_state, opt_state))
    key_r = jax.device_put(key, mesh_lib.sharding(mesh))
    step = shard_step.make_gnn_train_step(mesh, model, tx)
    p2, s2, o2, lm, lf = step(params_r, state_r, opt_r, key_r, (bs, ys, adjs), 2)
    assert np.isfinite(float(lf))
    np.testing.assert_allclose(float(lf), lf_base, rtol=1e-4, atol=1e-5)
    # params actually updated
    diffs = jax.tree_util.tree_map(lambda a, b_: float(jnp.abs(a - b_).sum()), p2, params)
    moved = sum(jax.tree_util.tree_leaves(diffs))
    assert moved > 0


def test_sharded_unroll_factored_and_bf16(rng):
    """Sharded serving variants: factored operand matches the Gram operand; bf16
    solver state stays a valid (close) trajectory on this tiny well-conditioned
    problem and returns bf16."""
    mesh = _mesh()
    B, Pn, m, n, K = 4, 8, 6, 16, 3
    A = sensing.set_A(jax.random.key(0), Pn, m, n)
    AtA = sensing.gram(A)
    adj = jnp.asarray(graphs.sample_connected_er(rng, B, Pn, 0.5))
    b = jnp.asarray(rng.standard_normal((B, Pn, m)).astype(np.float32))
    Atb = sensing.At_apply(A, b)
    state = dadmm_core.init_state(jax.random.key(1), B, Pn, n)
    table = seq_hyperparam.hyp_table(
        jnp.asarray(rng.standard_normal((K, Pn, 4)).astype(np.float32)),
        jnp.asarray([0.1, 0.99, 0.99, 0.99]),
    )
    dense = dadmm_core.unroll_table(state, table, AtA, Atb, adj)

    unroll_f = unfolded_sharded.make_sharded_unroll(mesh, gram_mode="factored")
    got = unroll_f(state, table, A, Atb, adj)
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense), rtol=2e-4, atol=2e-4)

    unroll_bf = unfolded_sharded.make_sharded_unroll(
        mesh, gram_mode="gram", solver_dtype="bfloat16"
    )
    got16 = unroll_bf(state, table, AtA, Atb, adj)
    assert got16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got16, dtype=np.float32), np.asarray(dense), rtol=0.1, atol=0.1
    )

    with pytest.raises(ValueError):
        unfolded_sharded.make_sharded_unroll(mesh, gram_mode="auto")


def test_sharded_unroll_final_only_matches_stacked(rng):
    """The serving fast path (final_only=True: scan with NO stacked-Y output)
    returns exactly the stacked unroll's Y[-1] — the sharded analogue of the
    dense `apply_final` equivalence (cli/serve.py uses it per ADVICE r3)."""
    mesh = _mesh()
    B, Pn, m, n, K = 4, 8, 6, 16, 4
    A = sensing.set_A(jax.random.key(0), Pn, m, n)
    AtA = sensing.gram(A)
    adj = jnp.asarray(graphs.sample_connected_er(rng, B, Pn, 0.5))
    b = jnp.asarray(rng.standard_normal((B, Pn, m)).astype(np.float32))
    Atb = sensing.At_apply(A, b)
    state = dadmm_core.init_state(jax.random.key(1), B, Pn, n)
    table = seq_hyperparam.hyp_table(
        jnp.asarray(rng.standard_normal((K, Pn, 4)).astype(np.float32)),
        jnp.asarray([0.1, 0.99, 0.99, 0.99]),
    )
    stacked = unfolded_sharded.make_sharded_unroll(mesh)(
        state, table, AtA, Atb, adj)
    final = unfolded_sharded.make_sharded_unroll(mesh, final_only=True)(
        state, table, AtA, Atb, adj)
    assert final.shape == (B, Pn, n)
    np.testing.assert_allclose(np.asarray(final), np.asarray(stacked)[-1],
                               rtol=1e-6, atol=1e-6)
    # the bf16 serving combo too (the exact config cli/serve.py builds)
    final_bf = unfolded_sharded.make_sharded_unroll(
        mesh, gram_mode="factored", solver_dtype="bfloat16", remat=False,
        final_only=True)(state, table, A, Atb, adj)
    assert final_bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(final_bf, dtype=np.float32),
                               np.asarray(stacked)[-1], rtol=0.1, atol=0.1)


def test_sharded_dlr_unroll_matches_dense(rng):
    """The agent/data-sharded dlr solver (collective neighbor sums) reproduces the
    dense single-device unroll, both consensus schedules."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.models import unfolded_dlr

    mesh = _mesh()
    B, Pn, d, K = 4, 8, 6, 4
    adj = jnp.asarray(graphs.sample_connected_er(rng, B, Pn, 0.5))
    x = jnp.asarray(rng.standard_normal((B, Pn, d)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((B, Pn, 1)).astype(np.float32))
    hyp = jnp.asarray(rng.uniform(0.01, 0.2, size=(K, Pn, 6)).astype(np.float32))
    st = unfolded_dlr.init_state(jax.random.key(0), B, Pn, d)
    st_dense, per_dense = unfolded_dlr.unroll_table(st, hyp, x, y, adj)

    for schedule in ("allgather", "ppermute"):
        unroll = unfolded_sharded.make_sharded_dlr_unroll(mesh, schedule=schedule)
        st_sh, per_sh = unroll(st, hyp, x, y, adj)
        np.testing.assert_allclose(np.asarray(st_sh.a), np.asarray(st_dense.a),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(per_sh), np.asarray(per_dense),
                                   rtol=2e-4, atol=2e-4)


def test_sharded_packed_unroll_on_geometric_graphs(rng):
    """The second topology family (random geometric graphs, `--graph_type
    geometric`) through the pod-scale packed ppermute path: the sharded packed
    unroll must match the dense single-device solver — the collective schedule
    is topology-family-agnostic (adjacency is data)."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import topology as topo_lib

    B, Pn, m, n, K = 2, 8, 4, 12, 3
    mesh = _mesh(data=2, agents=4)
    adj_np = graphs.sample_graph_batch(5, B, Pn, "geometric", 0.45)
    A = jax.random.normal(jax.random.key(0), (Pn, m, n), jnp.float32) / np.sqrt(m)
    AtA = sensing.gram(A)
    b = jax.random.normal(jax.random.key(1), (B, Pn, m), jnp.float32)
    Atb = sensing.At_apply(A, b)
    st = dadmm_core.init_state(jax.random.key(2), B, Pn, n)
    table = seq_hyperparam.hyp_table(
        0.05 * jnp.ones((K, Pn, 4), jnp.float32), jnp.asarray([0.1, 0.99, 0.99, 0.99]))
    dense = dadmm_core.unroll_table(st, table, AtA, Atb, jnp.asarray(adj_np))
    packed = topo_lib.pack_adjacency_sharded(adj_np, num_shards=4)
    unroll = unfolded_sharded.make_sharded_unroll_packed(
        mesh, schedule="ppermute", gram_mode="gram")
    Y = unroll(st, table, AtA, Atb, packed)
    np.testing.assert_allclose(np.asarray(Y), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("tier", ["GHyp1", "GHyp1c"])
@pytest.mark.parametrize("mode", ["diff", "same"])
@pytest.mark.slow
def test_sharded_dlr_ghyp_tiers_match_dense(rng, tier, mode):
    """Agent/data-sharded one-shot dlr hypernetwork tiers: the dense-table +
    sharded-unroll pipeline (GHyp1c corrector running inside the shard, 'same'
    mode pooling via pmean) reproduces the dense `apply_losses`."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.models import unfolded_dlr

    mesh = _mesh(data=2, agents=4)
    B, Pn, d, K = 4, 8, 6, 3
    cfg = Config(P=Pn, m=d, n=d, GHyp_hidden=4, GHN_iter_num=K, DADMM_mode=mode)
    cls = {"GHyp1": unfolded_dlr.DLRGNNHypOneShot,
           "GHyp1c": unfolded_dlr.DLRGNNHypOneShotCorrected}[tier]
    model = cls(Pn, d, cfg)
    params = model.init()
    if tier == "GHyp1c":
        # zero-init corrector == GHyp1; perturb so the hook actually does work
        params["corr"]["w2"] = 0.1 * jnp.asarray(
            rng.standard_normal(params["corr"]["w2"].shape).astype(np.float32))
    adj = jnp.asarray(graphs.sample_connected_er(rng, B, Pn, 0.5))
    x = jnp.asarray(rng.standard_normal((B, Pn, d)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((B, Pn, 1)).astype(np.float32))
    key = jax.random.key(3)

    per_dense, _ = model.apply_losses(params, key, x, y, adj, training=False)

    for schedule in ("allgather", "ppermute"):
        run = unfolded_sharded.make_sharded_dlr_ghyp_unroll(
            mesh, model, schedule=schedule)
        st_sh, per_sh = run(params, key, x, y, adj, training=False)
        assert st_sh.a.shape == (B, Pn, d)
        np.testing.assert_allclose(np.asarray(per_sh), np.asarray(per_dense),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_gspmd_masked_k_matches_static(rng):
    """Sharded masked-K step (one compiled program, traced K) must produce the same
    loss as the sharded static-K step for a truncated K."""
    mesh = _mesh(data=2, agents=4)
    cfg = Config(P=8, m=6, n=12, GHyp_hidden=4, GHN_iter_num=4, batch_size=4, lr=1e-3)
    A = sensing.set_A(jax.random.key(0), cfg.P, cfg.m, cfg.n)
    model = DLASSOGNNHyp(A, cfg)
    params, norm_state = model.init(jax.random.key(1))
    tx = optim.make_optimizer("adamw", cfg.lr, weight_decay=1e-5, clip_norm=100.0)
    opt_state = tx.init(params)
    b, y = data_ops.make_dataset(jax.random.key(2), A, cfg.batch_size)
    adj = jnp.asarray(graphs.sample_connected_er(rng, cfg.batch_size, cfg.P, 0.5))
    key = jax.random.key(3)

    bs, ys, adjs = mesh_lib.shard_batch(mesh, b, y, adj)
    params_r, state_r, opt_r = mesh_lib.replicate(mesh, (params, norm_state, opt_state))
    key_r = jax.device_put(key, mesh_lib.sharding(mesh))

    static_step = shard_step.make_gnn_train_step(mesh, model, tx)
    masked_step = shard_step.make_gnn_train_step(mesh, model, tx, masked_k=True)
    for K in (1, 3):
        _, _, _, lm_s, lf_s = static_step(params_r, state_r, opt_r, key_r, (bs, ys, adjs), K)
        _, _, _, lm_m, lf_m = masked_step(params_r, state_r, opt_r, key_r, (bs, ys, adjs), K)
        np.testing.assert_allclose(float(lf_m), float(lf_s), rtol=1e-5)
        np.testing.assert_allclose(float(lm_m), float(lm_s), rtol=1e-5)

    # eval flavor too
    static_eval = shard_step.make_gnn_eval_step(mesh, model)
    masked_eval = shard_step.make_gnn_eval_step(mesh, model, masked_k=True)
    lm_s, lf_s, nm_s = static_eval(params_r, state_r, key_r, (bs, ys, adjs), 3)
    lm_m, lf_m, nm_m = masked_eval(params_r, state_r, key_r, (bs, ys, adjs), 3)
    np.testing.assert_allclose(float(nm_m), float(nm_s), rtol=1e-5)
    np.testing.assert_allclose(float(lf_m), float(lf_s), rtol=1e-5)


@pytest.mark.parametrize("schedule", ["allgather", "ppermute"])
def test_sharded_unroll_packed_matches_dense(rng, schedule):
    """Packed-topology sharded unroll (O(Pl*D) topology per shard) reproduces the
    dense single-device trajectory, both schedules."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import topology

    mesh = _mesh()
    B, Pn, m, n, K = 4, 8, 6, 16, 4
    A = sensing.set_A(jax.random.key(0), Pn, m, n)
    AtA = sensing.gram(A)
    adj_np = graphs.sample_connected_er(rng, B, Pn, 0.5)
    adj = jnp.asarray(adj_np)
    b = jnp.asarray(rng.standard_normal((B, Pn, m)).astype(np.float32))
    Atb = sensing.At_apply(A, b)
    state = dadmm_core.init_state(jax.random.key(1), B, Pn, n)
    table = seq_hyperparam.hyp_table(
        jnp.asarray(rng.standard_normal((K, Pn, 4)).astype(np.float32)),
        jnp.asarray([0.1, 0.99, 0.99, 0.99]),
    )
    dense = dadmm_core.unroll_table(state, table, AtA, Atb, adj)

    packed = topology.pack_adjacency_sharded(
        adj_np, num_shards=mesh.shape[mesh_lib.AGENT_AXIS])
    unroll = unfolded_sharded.make_sharded_unroll_packed(
        mesh, schedule=schedule, gram_mode="gram")
    got = unroll(state, table, AtA, Atb, packed)
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense), rtol=2e-5, atol=2e-5)
