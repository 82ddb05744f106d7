"""Backend selection helper.

`--device cpu` must work even though the deployment boot hook imports jax and registers
the TPU backend before any user code runs (env-var overrides are therefore dead);
`jax.config.update` still wins because backends initialize lazily at first use.
"""

from __future__ import annotations

import jax


def select_device(device: str) -> None:
    """Honor the reference `--device` flag (`configurations.py:108-110`): 'cpu' forces
    the host backend; 'tpu'/'cuda:*'/anything else keeps the default accelerator."""
    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
