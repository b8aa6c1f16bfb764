"""Probe: remote-DMA (make_async_remote_copy) self-copy on one chip."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

def kernel(x_ref, o_ref, comm_buf, send_sem, recv_sem):
    my = jax.lax.axis_index('x')
    comm_buf[0] = x_ref[...] * 2.0
    rdma = pltpu.make_async_remote_copy(
        src_ref=comm_buf.at[0], dst_ref=comm_buf.at[1],
        send_sem=send_sem, recv_sem=recv_sem,
        device_id=my,  # self
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rdma.start()
    rdma.wait()
    o_ref[...] = comm_buf[1] + 1.0

mesh = Mesh(np.array(jax.devices()[:1]), ('x',))
x = jnp.ones((8, 128), jnp.float32) * 3.0

def run(a):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(a)

f = jax.jit(jax.shard_map(run, mesh=mesh, in_specs=P(), out_specs=P(), check_vma=False))
r = f(x)
print('rdma self-copy result[0,0]:', float(r[0,0]), '(want 7.0)', flush=True)
