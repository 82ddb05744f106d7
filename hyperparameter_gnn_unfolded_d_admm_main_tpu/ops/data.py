"""Synthetic problem data, TPU-first.

Equivalent of the reference `gnn_data.py:6-27` (`set_Data`/`GNN_Data`) and
`LoadData.py:7-31` (`SimulatedData`), but generated fully on device with JAX PRNG keys
and served through a reshuffling host iterator instead of a torch DataLoader.

Parity note: the reference *intends* SNR-scaled noise (`sigma = 10^(-snr/40)`,
`gnn_data.py:8,12`) but overwrites the noise tensor at `gnn_data.py:14`, so its data is
noiseless regardless of `--snr`. `make_dataset(noise=False)` reproduces that behavior
(the default, for baseline parity); `noise=True` applies the intended model.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_dataset(
    key: jax.Array,
    A: jax.Array,
    data_len: int,
    snr: float = 4.0,
    sparsity: float = 0.25,
    noise: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Sparse ground truth + per-agent observations.

    y_true = 2 * N(0,1) * Bernoulli(sparsity)   [data_len, n]   (gnn_data.py:11)
    b[:, p] = A_p @ y_true (+ sigma * N(0,1) when noise=True)   [data_len, P, m]
    """
    P, m, n = A.shape
    k_y, k_mask, k_noise = jax.random.split(key, 3)
    y = 2.0 * jax.random.normal(k_y, (data_len, n), dtype=A.dtype)
    mask = (jax.random.uniform(k_mask, (data_len, n)) <= sparsity).astype(A.dtype)
    y = y * mask
    b = jnp.einsum("pmn,dn->dpm", A, y)
    if noise:
        sigma = jnp.power(10.0, -snr / 40.0).astype(A.dtype)
        b = b + sigma * jax.random.normal(k_noise, b.shape, dtype=A.dtype)
    return b, y


def make_dlr_dataset(
    key: jax.Array,
    P: int,
    data_len: int,
    d: int,
    snr: float = 4.0,
    noise: bool = True,
    dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """Synthetic distributed linear regression instances (for the unfolded dlr
    extension — the reference's dlr path uses MNIST, unavailable offline).

    Each scenario has one shared ground-truth regressor (w*, b*) per scenario; each
    agent p holds one observation x[s, p] ~ N(0,1)/sqrt(d) with target
    y[s, p] = x.w* + b* (+ sigma * N(0,1)). Consensus across agents recovers the
    regressor no single observation determines.
    Returns (x [data_len, P, d], y [data_len, P, 1]).
    """
    k_w, k_b, k_x, k_n = jax.random.split(key, 4)
    w_star = jax.random.normal(k_w, (data_len, d), dtype)
    b_star = jax.random.normal(k_b, (data_len, 1), dtype)
    x = jax.random.normal(k_x, (data_len, P, d), dtype) / jnp.sqrt(jnp.asarray(d, dtype))
    y = jnp.einsum("spd,sd->sp", x, w_star)[..., None] + b_star[:, None, :]
    if noise:
        sigma = jnp.power(10.0, -snr / 40.0).astype(dtype)
        y = y + sigma * jax.random.normal(k_n, y.shape, dtype)
    return x, y


def batch_iterator(
    rng: np.random.Generator,
    b: jax.Array,
    y: jax.Array,
    batch_size: int,
    shuffle: bool = True,
    drop_last: bool = True,
) -> Iterator[Tuple[jax.Array, jax.Array]]:
    """Reshuffling mini-batch iterator (reference DataLoader semantics,
    `gnn_data.py:15`: shuffle=True, drop_last=True)."""
    nsamp = int(b.shape[0])
    idx = np.arange(nsamp)
    if shuffle:
        rng.shuffle(idx)
    end = nsamp - (nsamp % batch_size) if drop_last else nsamp
    for s in range(0, end, batch_size):
        take = idx[s : s + batch_size]
        yield b[take], y[take]


def num_batches(data_len: int, batch_size: int, drop_last: bool = True) -> int:
    return data_len // batch_size if drop_last else -(-data_len // batch_size)
