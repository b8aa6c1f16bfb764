"""In-kernel ring halo exchange via remote DMA (SURVEY.md §2c advanced path).

The production tiled solver exchanges halos with `lax.ppermute` between
Pallas sweep launches (dist/halo.py) — XLA schedules the collective. This
module is the fused alternative: the halo rows move chip-to-chip with
`pltpu.make_async_remote_copy` *inside* a Pallas kernel, the building block
for overlapping halo transfer with interior compute on a pod slice.

Ring semantics (periodic): chip i's top halo comes from chip i-1's bottom
rows and vice versa. On a 1-chip mesh the ring degenerates to self — the
exact same RDMA path — which is what the hardware test asserts here
(a real multi-chip ring exercises the identical code on a pod slice).
The non-periodic clamp used by the solver is applied by the caller exactly
as dist/halo.py does (replicate at the global boundary).

Not supported in interpret mode (remote DMA needs real hardware), so this
stays a separately-tested building block rather than the default path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _halo_kernel(x_ref, o_ref, comm, send_up_sem, send_dn_sem,
                 recv_top_sem, recv_bot_sem, *, halo: int, axis_name: str):
    n = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    up = jax.lax.rem(my - 1 + n, n)
    dn = jax.lax.rem(my + 1, n)
    h = x_ref.shape[0]

    # Send my top rows to the upper neighbor's bottom-recv slot (they sit
    # below me in the ring view) and my bottom rows to the lower neighbor's
    # top-recv slot. comm[0] = recv_top (filled by `up`), comm[1] = recv_bot.
    rdma_up = pltpu.make_async_remote_copy(
        src_ref=x_ref.at[pl.ds(0, halo)],
        dst_ref=comm.at[1],
        send_sem=send_up_sem,
        recv_sem=recv_bot_sem,
        device_id=up,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rdma_dn = pltpu.make_async_remote_copy(
        src_ref=x_ref.at[pl.ds(h - halo, halo)],
        dst_ref=comm.at[0],
        send_sem=send_dn_sem,
        recv_sem=recv_top_sem,
        device_id=dn,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rdma_up.start()
    rdma_dn.start()
    # ... a fused solver would run interior-sweep compute here, overlapped
    # with the transfers ...
    rdma_up.wait()
    rdma_dn.wait()
    o_ref[pl.ds(0, halo)] = comm[0]
    o_ref[pl.ds(halo, h)] = x_ref[...]
    o_ref[pl.ds(halo + h, halo)] = comm[1]


def ring_halo_exchange(tile: jnp.ndarray, halo: int, axis_name: str = "y"):
    """(h, w) local tile -> (h + 2*halo, w) with periodic ring halos fetched
    from mesh neighbors along `axis_name` via in-kernel remote DMA.

    Must be called inside shard_map with `axis_name` bound; `halo` must be a
    multiple of the sublane tile (8 rows fp32). TPU hardware only.
    """
    h, w = tile.shape
    if halo % 8:
        raise ValueError(f"halo must be a multiple of 8 rows, got {halo}")
    if halo > h:
        raise ValueError(f"halo {halo} exceeds tile height {h}")
    out = jax.ShapeDtypeStruct((h + 2 * halo, w), tile.dtype)
    return pl.pallas_call(
        functools.partial(_halo_kernel, halo=halo, axis_name=axis_name),
        out_shape=out,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, halo, w), tile.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile)
