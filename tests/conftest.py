"""Test configuration: force an 8-device virtual CPU mesh.

The harness boot hook (`sitecustomize` on PYTHONPATH) imports jax at interpreter startup
and registers the single-chip axon TPU backend, so env-var edits here are too late;
`jax.config.update` still works because backends initialize lazily at first use. Tests
exercise multi-chip sharding (`shard_map`, pjit over a Mesh) on 8 virtual CPU devices;
benchmarks run separately on the real chip via `bench.py`.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
