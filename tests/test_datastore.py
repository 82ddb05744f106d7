"""File-backed dataset pools: save/load roundtrip, reference slicing semantics,
identical training from a shared pool, MNIST IDX hook, data_tool CLI."""

import gzip
import json
import struct
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyperparameter_gnn_unfolded_d_admm_main_tpu.config import Config
from hyperparameter_gnn_unfolded_d_admm_main_tpu.ops import (
    classic_data, data as data_ops, datastore, sensing)


def _pool(tmp_path, n_pool=40, P=3, m=4, n=8):
    A = sensing.set_A(jax.random.key(0), P, m, n)
    b, y = data_ops.make_dataset(jax.random.key(1), A, n_pool)
    path = str(tmp_path / "pool.npz")
    meta = {"P": P, "m": m, "n": n, "snr": 4.0}
    fp = datastore.save_dataset(path, np.asarray(b), np.asarray(y), np.asarray(A), meta)
    return path, np.asarray(b), np.asarray(y), np.asarray(A), fp


def test_roundtrip(tmp_path):
    path, b, y, A, fp = _pool(tmp_path)
    b2, y2, A2, meta = datastore.load_dataset(path)
    np.testing.assert_array_equal(b2, b)
    np.testing.assert_array_equal(y2, y)
    np.testing.assert_array_equal(A2, A)
    assert meta["fingerprint"] == fp and meta["P"] == 3


def test_reference_slice_semantics():
    data = np.arange(2000)[:, None]
    label = np.arange(2000)[:, None] * 10
    # train split (idx >= 0.7 * min(N,1200)): FIRST idx rows of the capped pool
    d, l = datastore.reference_slice(data, label, 900)
    assert d.shape[0] == 900 and d[0, 0] == 0 and l[-1, 0] == 8990
    # test split: LAST idx rows of the capped (1200) pool
    d, l = datastore.reference_slice(data, label, 100)
    assert d.shape[0] == 100 and d[0, 0] == 1100 and d[-1, 0] == 1199


def test_split_loader_and_meta_check(tmp_path):
    path, b, y, A, _ = _pool(tmp_path, n_pool=40)
    (btr, ytr), (bva, yva), A2, _ = datastore.load_simulated_split(
        path, train_size=30, test_size=8, expect_meta={"P": 3}, pool_cap=40)
    np.testing.assert_array_equal(btr, b[:30])     # head
    np.testing.assert_array_equal(bva, b[-8:])     # tail
    assert A2 is not None
    with pytest.raises(ValueError):
        datastore.load_simulated_split(path, 30, 8, expect_meta={"P": 99}, pool_cap=40)
    with pytest.raises(ValueError):
        datastore.load_simulated_split(path, 36, 8, pool_cap=40)  # overlap


@pytest.mark.slow
def test_training_from_pool_is_reproducible(rng, tmp_path):
    """Two trainer runs from the same saved pool produce identical loss curves."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.train.loop import train_unfolded

    P, m, n = 3, 4, 8
    A = sensing.set_A(jax.random.key(0), P, m, n)
    b, y = data_ops.make_dataset(jax.random.key(1), A, 40)
    path = str(tmp_path / "pool.npz")
    datastore.save_dataset(path, np.asarray(b), np.asarray(y), np.asarray(A),
                           {"P": P, "m": m, "n": n})
    cfg = Config(P=P, m=m, n=n, GHN_iter_num=2, batch_size=8, train_size=30,
                 test_size=8, num_epochs=2, lr=1e-3, data_path=path)

    def run(d):
        res = train_unfolded(cfg, str(tmp_path / d))
        with open(str(tmp_path / d / "losses.csv")) as f:
            return f.read()

    assert run("r1") == run("r2")


def test_pool_A_overrides_seeded_A(rng, tmp_path):
    """_problem_data must return the pool's A: observations are only consistent
    with the matrix that generated them."""
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.train.loop import _problem_data

    P, m, n = 3, 4, 8
    A = sensing.set_A(jax.random.key(99), P, m, n)   # different key than the cfg seed
    b, y = data_ops.make_dataset(jax.random.key(1), A, 40)
    path = str(tmp_path / "pool.npz")
    datastore.save_dataset(path, np.asarray(b), np.asarray(y), np.asarray(A),
                           {"P": P, "m": m, "n": n})
    cfg = Config(P=P, m=m, n=n, train_size=30, test_size=8, data_path=path)
    A2, btr, *_ = _problem_data(cfg, jax.random.key(0), jax.random.key(1),
                                jax.random.key(2))
    np.testing.assert_array_equal(np.asarray(A2), np.asarray(A))
    assert btr.shape == (30, P, m)


def _write_idx(path, arr):
    arr = np.asarray(arr, np.uint8)
    with open(path, "wb") as f:
        f.write(struct.pack(">I", 0x0800 + arr.ndim))
        for d in arr.shape:
            f.write(struct.pack(">I", d))
        f.write(arr.tobytes())


def test_mnist_idx_hook(tmp_path):
    root = tmp_path / "mnist"
    root.mkdir()
    imgs = np.random.default_rng(0).integers(0, 255, (20, 28, 28), np.uint8)
    labs = np.random.default_rng(1).integers(0, 10, (20,), np.uint8)
    _write_idx(root / "train-images-idx3-ubyte", imgs)
    _write_idx(root / "train-labels-idx1-ubyte", labs)
    _write_idx(root / "t10k-images-idx3-ubyte", imgs[:10])
    _write_idx(root / "t10k-labels-idx1-ubyte", labs[:10])
    assert datastore.mnist_available(str(root))
    (x, yl), (xt, ylt) = datastore.load_mnist_dir(str(root))
    assert x.shape == (20, 784) and x.max() <= 1.0 and yl.shape == (20,)

    # the dlr plumbing: real images dealt across agents, /255-again scale
    xa, la = classic_data.make_lr_dataset_maybe_mnist(
        jax.random.key(0), P=4, data_len=5, data_path=str(root), train=True)
    assert xa.shape == (5, 4, 784) and la.shape == (5, 4, 1)
    assert float(xa.max()) <= 1.0 / 255.0 + 1e-6
    np.testing.assert_allclose(
        np.asarray(xa[0, 0]), imgs[0].reshape(-1) / 255.0 / 255.0, rtol=1e-6)

    with pytest.raises(FileNotFoundError):
        classic_data.make_lr_dataset_maybe_mnist(
            jax.random.key(0), 4, 5, data_path=str(tmp_path / "nope"))


def test_data_tool_cli(tmp_path):
    out = str(tmp_path / "pool.npz")
    from hyperparameter_gnn_unfolded_d_admm_main_tpu.cli import data_tool

    data_tool.main(["make", "--out", out, "--pool_size", "16",
                    "--P", "3", "--m", "4", "--n", "8"])
    info = data_tool.main(["inspect", "--out", out])
    assert info["pool"] == 16 and info["meta"]["P"] == 3
