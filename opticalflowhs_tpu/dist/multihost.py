"""Multi-host entry (SURVEY.md §2c, §3.5): one process per host over DCN.

Not exercisable on this machine (single host, single chip — SURVEY.md §0
[ENV]); shipped tested-under-simulation with the exact run recipe below.

Run on a real pod slice (example: 2 hosts x 4 chips v5e):

    # on every host, same command (GCE TPU VM metadata fills the defaults):
    python -m opticalflowhs_tpu.dist.multihost --image 4k_frame1.png ...

    # or explicitly:
    HSFLOW_COORD=10.0.0.2:8476 HSFLOW_NPROC=2 HSFLOW_PROC_ID=$I \
        python -m opticalflowhs_tpu.dist.multihost ...

`init_multihost()` wires jax.distributed.initialize; afterwards
jax.device_count() spans the slice and the exact same `hs_solve_tiled`
call used in tests runs with cross-host halo legs riding DCN and
intra-host legs riding ICI — there is no separate multi-host code path
(that is the point of shard_map + GSPMD).
"""

from __future__ import annotations

import argparse
import os
from typing import Optional


def init_multihost(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize from args or HSFLOW_* / cloud-TPU metadata.

    On Cloud TPU VMs all three arguments are discovered automatically;
    elsewhere set HSFLOW_COORD=host:port, HSFLOW_NPROC, HSFLOW_PROC_ID.
    Safe to call when unset on a single-process run (no-op).
    """
    import jax

    coordinator = coordinator or os.environ.get("HSFLOW_COORD")
    num_processes = num_processes or _int_env("HSFLOW_NPROC")
    process_id = process_id if process_id is not None else _int_env("HSFLOW_PROC_ID")
    if coordinator is None and num_processes is None:
        try:  # Cloud TPU metadata path: fully automatic
            jax.distributed.initialize()
        except Exception:
            pass  # single-process fallback
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def main(argv=None) -> int:
    import numpy as np

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frame1")
    p.add_argument("--frame2")
    p.add_argument("--shape", default="2160x3840", help="synthetic HxW if no frames")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--halo-sweeps", type=int, default=4)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--levels", type=int, default=3,
                   help="pyramid levels (1 = single-level tiled solve)")
    p.add_argument("--backend", default="auto",
                   choices=["auto", "jnp", "pallas"],
                   help="per-shard sweep backend; auto = the Pallas tile "
                        "kernels on TPU (the fast path), jnp elsewhere")
    p.add_argument("-o", "--output", help=".flo output (process 0 only)")
    args = p.parse_args(argv)

    init_multihost()
    import jax
    import jax.numpy as jnp

    from opticalflowhs_tpu.config import HSConfig, PyramidConfig
    from opticalflowhs_tpu.dist import hs_pyramid_tiled, make_mesh
    from opticalflowhs_tpu.dist.mesh import mesh_for_devices
    from opticalflowhs_tpu.egomotion import estimate_egomotion

    n = jax.device_count()
    mesh_cfg = mesh_for_devices(n, batch=args.batch)
    mesh = make_mesh(mesh_cfg)
    if jax.process_index() == 0:
        print(f"{jax.process_count()} processes, {n} devices, mesh {mesh_cfg.shape}")

    if args.frame1:
        from opticalflowhs_tpu.io.images import load_gray

        i1 = jnp.asarray(load_gray(args.frame1))
        i2 = jnp.asarray(load_gray(args.frame2))
    else:
        h, w = (int(t) for t in args.shape.split("x"))
        rng = np.random.default_rng(0)
        i1 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
        i2 = jnp.asarray(jnp.roll(i1, 2, axis=1))

    # backend="auto" routes each shard's sweeps through the Pallas tile
    # kernels on TPU (9.5x the jnp fallback's in-kernel rate — the whole
    # point of a pod run); "jnp" remains selectable for CPU rehearsals.
    cfg = HSConfig(alpha=args.alpha, iters=args.iters, backend=args.backend)
    pyr = PyramidConfig(levels=args.levels)
    flow = hs_pyramid_tiled(
        i1, i2, cfg, pyr, mesh=mesh, halo_sweeps=args.halo_sweeps
    )
    jax.block_until_ready(flow)
    em = estimate_egomotion(flow)
    if jax.process_index() == 0:
        print(
            f"ego-motion: t=({float(em.tx):+.3f}, {float(em.ty):+.3f}) px/frame, "
            f"omega={float(em.omega):+.5f} rad, scale={float(em.scale):+.5f}, "
            f"residual={float(em.residual):.4f}"
        )
        if args.output:
            from opticalflowhs_tpu.io.flo import write_flo

            f = np.stack([np.asarray(flow.u), np.asarray(flow.v)], axis=-1)
            write_flo(args.output, f)
            print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
