"""Device-mesh construction for agent/data parallelism.

The reference has no distribution at all — P agents are a tensor axis in one process
(SURVEY.md section 2.3). Here the two parallel axes of the workload map to a 2-D mesh:

- `data`: scenario batch B, embarrassingly parallel (DCN-friendly across hosts)
- `agents`: the P D-ADMM agents, the algorithm's distributed dimension; the consensus
  exchange rides ICI collectives along this axis

Single-chip configurations still go through a (1, 1) mesh so every model/step carries
sharding annotations unconditionally.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
AGENT_AXIS = "agents"


def make_mesh(data: int = 1, agents: int = 1, devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    n = data * agents
    if len(devices) < n:
        raise ValueError(f"need {n} devices for a ({data}, {agents}) mesh, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(data, agents)
    return Mesh(dev, (DATA_AXIS, AGENT_AXIS))


def auto_mesh(n_devices: Optional[int] = None, P_agents: int = 8, devices=None) -> Mesh:
    """Pick (data, agents) for n devices: the agent axis gets the largest divisor of
    n_devices that also divides P (so agent blocks are even), the rest is data."""
    devices = jax.devices() if devices is None else devices
    n = len(devices) if n_devices is None else n_devices
    agents = 1
    for cand in range(min(n, P_agents), 0, -1):
        if n % cand == 0 and P_agents % cand == 0:
            agents = cand
            break
    return make_mesh(data=n // agents, agents=agents, devices=devices)


def agent_ring_mesh(agents: int, devices=None) -> Mesh:
    """Strictly 1-D ('agents',) mesh — required by the Pallas RDMA ring kernel, whose
    remote-DMA lowering rejects multi-axis meshes even when extra axes have size 1."""
    devices = jax.devices() if devices is None else devices
    if len(devices) < agents:
        raise ValueError(f"need {agents} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:agents]), (AGENT_AXIS,))


def batch_spec() -> P:
    """[B, P, ...] arrays: batch over data, agents over agents."""
    return P(DATA_AXIS, AGENT_AXIS)


def sharding(mesh: Mesh, *axes) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))


def shard_batch(mesh: Mesh, b, y, adj):
    """Place one training batch: b [B,P,m], y [B,n], adj [B,P,P]."""
    b = jax.device_put(b, sharding(mesh, DATA_AXIS, AGENT_AXIS))
    y = jax.device_put(y, sharding(mesh, DATA_AXIS))
    adj = jax.device_put(adj, sharding(mesh, DATA_AXIS, AGENT_AXIS))
    return b, y, adj


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / optimizer state) across the whole mesh."""
    s = sharding(mesh)
    return jax.device_put(tree, s)
