"""Pallas RDMA ring all-gather for the agent axis + consensus on top.

The collective layer (`parallel/consensus.py`) lowers the D-ADMM neighbor exchange to
`lax.all_gather` / `lax.ppermute`, letting XLA schedule the ICI transfers. This module
is the hand-scheduled alternative: a Pallas kernel that moves the agent blocks around
the ring itself with `make_async_remote_copy` (inter-chip RDMA), double-buffered so
each hop's transfer overlaps the previous block's copy-out. Pattern follows the public
Pallas distributed guide's ring collectives (see SNIPPETS.md / pallas_guide.md section
"Patterns: Ring Collectives").

`ring_all_gather(mesh)` builds a jitted `[B, P/s, n] -> [B, P, n]` gatherer over the
`agents` axis; `make_rdma_consensus(mesh)` composes it with the Laplacian math into a
drop-in replacement for `consensus_allgather`. Validated in interpreter mode on the
virtual CPU mesh (single-chip environments can't exercise real multi-chip RDMA;
`interpret=None` auto-selects interpret off-TPU).

Constraint: the mesh must be 1-D (agents only) — Pallas's remote-DMA discharge/lowering
does not support multi-axis meshes (NotImplementedError in dma_start_p); shard the
scenario batch across hosts with an outer data-parallel jit instead when combining.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from ..parallel.mesh import AGENT_AXIS, DATA_AXIS


def _ring_kernel_factory(num_shards: int, block_shape, axis_name: str):
    B, Pl, n = block_shape

    def kernel(y_ref, out_ref, comm, send_sem, recv_sem, copy_sem):
        my = lax.axis_index(axis_name)
        # Deposit the local block at its global position.
        cp = pltpu.make_async_copy(y_ref, out_ref.at[:, pl.ds(my * Pl, Pl)], copy_sem)
        cp.start()
        cp.wait()
        # Seed the travelling buffer with the local block.
        cp = pltpu.make_async_copy(y_ref, comm.at[0], copy_sem)
        cp.start()
        cp.wait()

        left = lax.rem(my + num_shards - 1, num_shards)
        for t in range(num_shards - 1):
            slot = t % 2
            nxt = (t + 1) % 2
            # Send my current block to the LEFT neighbor's next slot; symmetric sends
            # mean my next slot receives the RIGHT neighbor's block.
            rdma = pltpu.make_async_remote_copy(
                src_ref=comm.at[slot],
                dst_ref=comm.at[nxt],
                send_sem=send_sem.at[slot],
                recv_sem=recv_sem.at[nxt],
                device_id=left,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
            rdma.wait()
            src_shard = lax.rem(my + t + 1, num_shards)
            cp = pltpu.make_async_copy(
                comm.at[nxt], out_ref.at[:, pl.ds(src_shard * Pl, Pl)], copy_sem
            )
            cp.start()
            cp.wait()

    return kernel


def ring_all_gather(mesh: Mesh, B: int, Pl: int, n: int, dtype=jnp.float32,
                    interpret: Optional[bool] = None):
    """Jitted agent-axis all-gather `[B, Pl, n] (sharded) -> [B, P, n] (sharded rows,
    gathered agents)` using RDMA ring hops. `interpret` defaults to True off-TPU."""
    if len(mesh.shape) != 1 or AGENT_AXIS not in mesh.shape:
        raise ValueError("RDMA ring consensus needs a 1-D ('agents',) mesh; "
                         f"got axes {tuple(mesh.shape)}")
    s = mesh.shape[AGENT_AXIS]
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    kernel = _ring_kernel_factory(s, (B, Pl, n), AGENT_AXIS)

    inner = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, s * Pl, n), dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, B, Pl, n), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True, collective_id=7),
        interpret=interpret,
    )

    shard_fn = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=P(None, AGENT_AXIS),
        out_specs=P(None, None),
        check_vma=False,
    )
    return jax.jit(shard_fn)


def make_rdma_consensus(mesh: Mesh, B: int, Pl: int, n: int, dtype=jnp.float32,
                        interpret: Optional[bool] = None):
    """`delta = 2 * L @ y` across agent shards with the RDMA gatherer doing the
    exchange. Returns a jitted `(adj [B,P,P] sharded rows, y [B,Pl,n]) -> delta`
    matching `parallel.consensus.consensus_allgather` numerics."""
    gather = ring_all_gather(mesh, B, Pl, n, dtype, interpret)

    def consensus(adj_rows, y_local):
        y_full = gather(y_local)

        def local_math(adj_rows, y_local, y_full):
            deg = jnp.sum(adj_rows, axis=-1)
            neigh = jnp.einsum("bpq,bqn->bpn", adj_rows, y_full)
            return 2.0 * (deg[..., None] * y_local - neigh)

        return jax.jit(jax.shard_map(
            local_math,
            mesh=mesh,
            in_specs=(P(None, AGENT_AXIS, None), P(None, AGENT_AXIS),
                      P(None, None)),
            out_specs=P(None, AGENT_AXIS),
            check_vma=False,
        ))(adj_rows, y_local, y_full)

    return consensus
