"""Device-mesh construction (SURVEY.md §2b).

Axes: "batch" (data parallel over frame pairs, P1), "y"/"x" (spatial tiling
of the pixel grid, P2). Collectives ride ICI within a host's slice and DCN
across hosts; axis order puts "x" innermost so the per-sweep x-direction halo
ppermute maps to nearest-neighbor ICI links (SURVEY.md §2c).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from opticalflowhs_tpu.config import MeshConfig


def make_mesh(cfg: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None) -> Mesh:
    """Build a ("batch", "y", "x") Mesh of batch*y*x devices.

    Uses mesh_utils.create_device_mesh when it can (ICI-topology-aware
    placement on real slices); falls back to a reshape of the device list
    (CPU fake backend, or axis shapes the util rejects).
    """
    if devices is None:
        devices = jax.devices()
    n = cfg.batch * cfg.y * cfg.x
    if n > len(devices):
        raise ValueError(
            f"mesh {cfg.shape} needs {n} devices, have {len(devices)}"
        )
    devices = devices[:n]
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh(cfg.shape, devices=devices)
    except Exception:
        dev_array = np.asarray(devices).reshape(cfg.shape)
    return Mesh(dev_array, cfg.axis_names)


def mesh_for_devices(n: int, batch: int = 1) -> MeshConfig:
    """Factor n devices into a near-square (batch, y, x) spatial tiling."""
    if n % batch != 0:
        raise ValueError(f"{n} devices not divisible by batch={batch}")
    spatial = n // batch
    y = int(np.sqrt(spatial))
    while spatial % y != 0:
        y -= 1
    return MeshConfig(batch=batch, y=y, x=spatial // y)
