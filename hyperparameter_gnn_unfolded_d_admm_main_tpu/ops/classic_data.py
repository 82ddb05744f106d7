"""Data for the classic (global-matrix) solvers.

The reference classic path depends on two artifacts that are git-LFS-missing in its
snapshot (`.MISSING_LARGE_BLOBS`): `GaussianData.mat` (the 500x2000 global sensing
matrix `A_BP`, `DADMM_utils.py:12-18`) and `data/data_{snr}_snr.npy` (the pickled
observation/label pairs consumed by `LoadData.py:7-31`). Both are regenerated here
synthetically with seeded JAX PRNG:

- `global_sensing_matrix`: Gaussian A [m, n] (defaults 500x2000 to match the docstring
  dims in `models.py:349,365-368`).
- `make_classic_lasso_dataset`: sparse y, observations b = A y (+ optional SNR noise),
  same SNR convention as the unfolded data path (`gnn_data.py:8`).
- `make_lr_dataset`: per-agent regression data standing in for the MNIST tensors the
  reference reshapes to [P, B, 784, 1] (`utils.py:56-59`) — x in [0, 1]^d with integer
  targets in [0, 9], so the rounding-accuracy metric (`utils.py:125-132`) is meaningful.

Also provides the reference's 80/20 train/valid split semantics (`utils.py:25-42`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def global_sensing_matrix(key: jax.Array, m: int = 500, n: int = 2000,
                          dtype=jnp.float32) -> jax.Array:
    return jax.random.normal(key, (m, n), dtype) / jnp.sqrt(jnp.asarray(m, dtype))


def make_classic_lasso_dataset(
    key: jax.Array,
    A: jax.Array,
    data_len: int,
    snr: float = 4.0,
    sparsity: float = 0.25,
    noise: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (b [data_len, m], y [data_len, n])."""
    m, n = A.shape
    k_y, k_mask, k_noise = jax.random.split(key, 3)
    y = 2.0 * jax.random.normal(k_y, (data_len, n), dtype=A.dtype)
    y = y * (jax.random.uniform(k_mask, (data_len, n)) <= sparsity).astype(A.dtype)
    b = y @ A.T
    if noise:
        sigma = jnp.power(10.0, -snr / 40.0).astype(A.dtype)
        b = b + sigma * jax.random.normal(k_noise, b.shape, dtype=A.dtype)
    return b, y


def make_lr_dataset(
    key: jax.Array, P: int, data_len: int, d: int = 784, dtype=jnp.float32
) -> Tuple[jax.Array, jax.Array]:
    """Returns (x [data_len, P, d], labels [data_len, P, 1]) with integer targets.

    Input scale matters: the reference loads MNIST with `ToTensor()` (already [0,1],
    `utils.py:12-17`) and then divides by 255 AGAIN inside the epoch loop
    (`utils.py:57,91` `inputs / 255`), so its effective dlr inputs are <= 0.004. Its
    default hyperparameter scalars (alpha=0.3013 etc., `configurations.py:73-86`) are
    only stable at that scale — at unit-scale inputs the d=784 rank-1 Gram term
    `x (x . a)` is ~65000x larger and the color sweep diverges within one segment.
    The synthetic stand-in reproduces the reference's effective scale."""
    kx, kl = jax.random.split(key)
    x = jax.random.uniform(kx, (data_len, P, d), dtype) / 255.0
    labels = jax.random.randint(kl, (data_len, P, 1), 0, 10).astype(dtype)
    return x, labels


def make_lr_dataset_maybe_mnist(
    key: jax.Array, P: int, data_len: int, d: int = 784,
    data_path: str = "", train: bool = True, dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """dlr inputs: REAL local MNIST when `data_path` points at a directory holding
    the standard IDX files (or mnist.npz) — the reference's actual dlr data
    (`utils.py:12-17`, download=False: it too expects the files already on disk) —
    else the synthetic stand-in.

    Real images get the same /255-again scaling the reference applies inside its
    epoch loop (`utils.py:57,91`): ToTensor() already yields [0,1], so effective
    inputs are <= 0.004 — the scale the default hyperparameters are stable at.
    Consecutive images are dealt across the P agents, matching the reference's
    [P, B, 784, 1] reshape of a B*P-image batch (`utils.py:56-59`).
    """
    if data_path:
        from . import datastore

        if datastore.mnist_available(data_path):
            (x_tr, y_tr), (x_te, y_te) = datastore.load_mnist_dir(data_path)
            x, lab = (x_tr, y_tr) if train else (x_te, y_te)
            need = data_len * P
            if need > x.shape[0]:
                raise ValueError(
                    f"MNIST split has {x.shape[0]} images; need {need} "
                    f"(data_len={data_len} x P={P})")
            x = jnp.asarray(x[:need].reshape(data_len, P, -1), dtype) / 255.0
            labels = jnp.asarray(lab[:need].reshape(data_len, P, 1), dtype)
            if x.shape[-1] != d:
                raise ValueError(f"MNIST gives d={x.shape[-1]}, run requests d={d}")
            return x, labels
        raise FileNotFoundError(
            f"--data_path {data_path!r}: no MNIST files found "
            "(expected IDX files, MNIST/raw/, or mnist.npz)")
    return make_lr_dataset(key, P, data_len, d, dtype)


def split_80_20(b: jax.Array, y: jax.Array, seed: int):
    """Seeded 80/20 random split (`utils.py:25-42`)."""
    n = b.shape[0]
    idx = jax.random.permutation(jax.random.key(seed), n)
    cut = int(0.8 * n)
    tr, va = idx[:cut], idx[cut:]
    return (b[tr], y[tr]), (b[va], y[va])
