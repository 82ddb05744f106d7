"""Backend selection helper.

`--device cpu` must work even though the deployment boot hook imports jax and registers
the TPU backend before any user code runs (env-var overrides are therefore dead);
`jax.config.update` still wins because backends initialize lazily at first use.
"""

from __future__ import annotations

import os

import jax


def select_device(device: str, host_device_count: int | None = None) -> None:
    """Honor the reference `--device` flag (`configurations.py:108-110`): 'cpu' forces
    the host backend; 'tpu'/'cuda:*'/anything else keeps the default accelerator.

    `host_device_count` requests N virtual CPU devices (mesh testing without
    hardware). XLA reads the flag at backend creation, which is lazy — this works as
    long as no computation ran yet in the process.
    """
    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
        if host_device_count:
            flags = os.environ.get("XLA_FLAGS", "")
            if "xla_force_host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    flags + f" --xla_force_host_platform_device_count={host_device_count}"
                ).strip()


def configure_platform(cfg) -> None:
    """Apply a Config's platform knobs: backend selection + optional persistent
    compilation cache (`--compile_cache DIR`). Call before the first computation."""
    select_device(cfg.device)
    if getattr(cfg, "compile_cache", ""):
        enable_compile_cache(cfg.compile_cache)


def enable_compile_cache(cache_dir: str) -> None:
    """Persistent XLA compilation cache (new surface; the reference recompiles its
    torch graphs implicitly every process). Compiled executables are keyed by program
    + compiler version and reused across process restarts — the serving daemon's
    cold-start goes from a full compile to a cache read. Safe to share across runs;
    min_compile_time_secs=0 caches everything including the tiny eval programs."""
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
