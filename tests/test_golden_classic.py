"""Golden cross-framework checks for the CLASSIC path using the reference's own
committed artifacts: the trained segment-ladder hyperparameter tables
(`checkpoints/dlasso/exp for 5 agents/diff/params_P=5_batch=*_prob=0.5_size=*.pt`,
trained by reference `dlasso.py:59-102`) and the exact cached topology + coloring it
trained on (`graphs data/erods_renyi/graph_data_prob0.5_P=5.npy`, two stacked pickled
arrays: neighbor lists then color partition — written at `dlasso.py:33-36`).

The reference's global sensing matrix (`GaussianData.mat`, 500x2000) is LFS-missing in
the snapshot, so exact loss reproduction is impossible; what CAN be verified across
frameworks is (a) the ladder's frozen-prefix structure, which our
`classic.frozen_prefix_table` reproduces, and (b) that the trained table drives OUR
color-sweep solver to a converging solve on same-distribution data over the SAME
topology/coloring, beating the untrained scalar-default table it was initialized from
(`configurations.py:73-86`).
"""

import glob
import os
import re

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")

from hyperparameter_gnn_unfolded_d_admm_main_tpu.models import classic
from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import classic_data, graphs

REF_DIR = "/root/reference/checkpoints/dlasso/exp for 5 agents/diff"
REF_GRAPH = "/root/reference/graphs data/erods_renyi/graph_data_prob0.5_P=5.npy"

pytestmark = [pytest.mark.skipif(
    not (os.path.isdir(REF_DIR) and os.path.exists(REF_GRAPH)),
    reason="reference classic artifacts not present",
), pytest.mark.slow]


def _load_tables():
    out = {}
    for path in glob.glob(os.path.join(REF_DIR, "params_P=5_*_size=*.pt")):
        size = int(re.search(r"size=(\d+)\.pt", path).group(1))
        out[size] = torch.load(path, map_location="cpu", weights_only=False).numpy()
    return out


def _load_reference_schedule():
    with open(REF_GRAPH, "rb") as f:
        neighbors = np.load(f, allow_pickle=True)
        colors = np.load(f, allow_pickle=True)
    P = len(neighbors)
    adj = np.zeros((P, P), np.float32)
    for p, ns in enumerate(neighbors):
        adj[p, np.asarray(ns, np.int64)] = 1.0
    assert (adj == adj.T).all(), "reference neighbor lists must be symmetric"
    masks = np.zeros((len(colors), P), np.float32)
    for c, nodes in enumerate(colors):
        masks[c, np.asarray(nodes, np.int64)] = 1.0
    # every node in exactly one color, no edge within a color (proper coloring)
    assert (masks.sum(0) == 1.0).all()
    for c in range(masks.shape[0]):
        idx = np.where(masks[c] > 0)[0]
        assert adj[np.ix_(idx, idx)].sum() == 0.0
    return classic.ColorSchedule(
        masks=jnp.asarray(masks), adj=jnp.asarray(adj),
        deg=jnp.asarray(adj.sum(-1)),
    ), adj


def test_ladder_tables_are_frozen_prefix_nested():
    """Sequential-segment training freezes finished segments (`dlasso.py:59-102`):
    every size=k table must literally contain the size=k-2 table as its prefix. This is
    the invariant our `classic.frozen_prefix_table` builds the ladder with."""
    tables = _load_tables()
    sizes = sorted(tables)
    assert sizes[0] == 2 and sizes[-1] == 24 and len(sizes) == 12
    for lo, hi in zip(sizes, sizes[1:]):
        assert tables[hi].shape == (hi, 5, 4)
        np.testing.assert_array_equal(tables[hi][:lo], tables[lo])


def test_reference_trained_table_solves_in_our_solver():
    """The reference's final trained [24,5,4] table, on its exact training topology and
    coloring, drives our solver to a converging LASSO solve on same-distribution data —
    and beats the scalar-default table it was initialized from (rho=0.2603,
    alpha=0.3013, tau=0.1142, eta=0.0867; `configurations.py:73-86`)."""
    table = jnp.asarray(_load_tables()[24])
    sched, adj = _load_reference_schedule()

    key = __import__("jax").random.key(0)
    import jax

    k_A, k_data = jax.random.split(key)
    A_global = classic_data.global_sensing_matrix(k_A)
    b, y = classic_data.make_classic_lasso_dataset(k_data, A_global, 8, snr=2)
    solver = classic.DADMMLASSOClassic(A_global, P=5)

    _, _, curve = solver.run(table, b, sched, labels=y)
    curve = np.asarray(curve)
    assert np.isfinite(curve).all()
    # Exact loss reproduction is impossible (the reference's GaussianData.mat and
    # data/*.npy are LFS-missing) — on same-distribution data the transferable claims
    # are: a clear descent phase, and bounded late iterations.
    assert curve.min() < 0.93 * curve[0]
    assert curve[-1] < 1.2 * curve[0]

    default_row = jnp.asarray([0.2603, 0.3013, 0.1142, 0.0867])
    default_table = jnp.broadcast_to(default_row, (24, 5, 4))
    _, _, curve0 = solver.run(default_table, b, sched, labels=y)
    curve0 = np.asarray(curve0)
    # The trained table dominates the scalar defaults it was initialized from: deeper
    # minimum and far better late-iteration control (defaults blow past 2x initial
    # loss by k=24; the trained run stays bounded).
    assert curve.min() <= curve0.min()
    assert curve[-1] < 0.5 * curve0[-1]
