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

# Build the native library up front when a toolchain is present, so the
# tests/test_native.py coverage doesn't silently skip on a fresh checkout
# (the .so is gitignored). Failure to build falls back to the skip markers.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_REPO, "native", "libgraph_builder.so")
if not os.path.exists(_SO):
    import shutil
    import subprocess

    if shutil.which("make") and shutil.which("g++"):
        subprocess.run(["make", "-C", os.path.join(_REPO, "native")],
                       check=False, capture_output=True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
