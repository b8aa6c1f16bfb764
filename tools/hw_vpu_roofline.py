"""HW: empirical VPU speed-of-light for the compute roofline (round-4
VERDICT item 6).

The resident-class solves no longer stream HBM, so the streaming SoL is the
wrong baseline; the binding resource is VPU elementwise throughput. Public
spec sheets give MXU FLOPs, not VPU op rates, so this measures it: a Pallas
kernel running a long chain of fused elementwise ops on a VMEM-resident
array, in three flavors —

  * fma:  x = x * a + b            (2 ops/element/stage, the densest mix)
  * add:  x = x + a                (1 op/element/stage)
  * roll: x = roll(x, 1, sublane) + a  (the sweep's shift+add mix)

FINDING (2026-08-20, v5e): fma 1.38 / add 0.97 / roll+add 1.44 Tops/s —
all BELOW what the real sweep kernel sustains (~2.4 T-instr/s at 97
Gpx*sweeps/s device time x 25 instr/px), because each one-op stage here
round-trips VMEM while the sweep's ~25-instruction body amortizes the
loads over many ALU ops. A microbench below the kernel it is supposed to
bound is not a ceiling, so opticalflowhs_tpu/bench.py::VPU_TOPS uses the
architectural peak (4096 ops/cycle x ~1.5 GHz = 6.14 T-instr/s) instead;
this tool stays as the record of why. Writes /tmp/hw_vpu_roofline.json.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opticalflowhs_tpu.kernels.jacobi import _cshift

OUT = "/tmp/hw_vpu_roofline.json"
H, W = 512, 1024          # 2 MB fp32, comfortably VMEM-resident
STAGES = 256              # elementwise stages per grid step
REPS = 64                 # grid steps per launch


def _kernel(flavor, a_ref, b_ref, o_ref):
    # chain seed comes from an input ref (o_ref is uninitialized on the
    # first grid step); each grid step is an independent STAGES-deep chain
    x = b_ref[...]
    a = a_ref[...]
    b = b_ref[...]
    for _ in range(STAGES):
        if flavor == "fma":
            x = x * a + b
        elif flavor == "add":
            x = x + a
        else:  # roll
            x = _cshift(x, 1, 0) + a
    o_ref[...] = x


def run(flavor):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0.99, 1.01, (H, W)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1e-6, 1e-6, (H, W)).astype(np.float32))
    vmem = pl.BlockSpec((H, W), lambda i: (0, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(_kernel, flavor),
        grid=(REPS,),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        in_specs=[vmem, vmem],
        out_specs=vmem,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )
    fj = jax.jit(lambda aa, bb: f(aa, bb))
    out = fj(a, b)
    float(jnp.sum(out))  # force deferred remote compile + execute
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        out = fj(a, b)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    ops_per_stage = {"fma": 2, "add": 1, "roll": 2}[flavor]
    ops = H * W * STAGES * REPS * ops_per_stage
    return dt, ops / dt


def main():
    results = {"shape": [H, W], "stages": STAGES, "reps": REPS}
    for flavor in ("fma", "add", "roll"):
        dt, rate = run(flavor)
        print(f"{flavor}: {dt*1e3:.3f} ms/launch -> {rate/1e12:.3f} Tops/s",
              flush=True)
        results[flavor + "_tops"] = round(rate / 1e12, 4)
    json.dump(results, open(OUT, "w"), indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
