"""Reshard helpers between pipeline phases (SURVEY.md §2b P5 — Ulysses analog).

Phase transitions in a video pipeline want different layouts: decode/ingest
is naturally time-sharded (each chip holds a contiguous frame run), the tiled
solve is space-sharded, separable filter passes prefer W-split then H-split.
`reshard` expresses the transition as a `with_sharding_constraint` inside jit
so GSPMD emits a single all_to_all over ICI instead of a host round-trip.

Also here: the P3 sequence-parallel pair construction — frames sharded along
time need one neighbor frame (temporal halo = 1 frame, SURVEY.md §2b P3) to
form their last local pair, exchanged with a ppermute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def reshard(x: jnp.ndarray, mesh: Mesh, spec: P) -> jnp.ndarray:
    """Constrain x to NamedSharding(mesh, spec); inside jit this lowers to a
    collective layout change (all_to_all / collective-permute as needed)."""
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def time_to_space(frames: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """(T, H, W) time-sharded P("batch") -> space-sharded P(None, "y", "x")."""
    return reshard(frames, mesh, P(None, "y", "x"))


def space_to_time(frames: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    return reshard(frames, mesh, P("batch", None, None))


def timesharded_pairs(frames: jnp.ndarray):
    """Local (i1, i2) pair stacks for time-sharded frames, inside shard_map.

    Each shard holds k consecutive frames; its last pair needs the next
    shard's first frame — the 1-frame temporal halo (P3), fetched with a
    ppermute along "batch". The last shard's trailing pair is marked invalid
    (returned mask) since the video simply ends there.

    Returns (i1, i2, valid) each of leading length k: pair j is
    (frame j, frame j+1) in this shard's local numbering.
    """
    n = lax.axis_size("batch")
    idx = lax.axis_index("batch")
    # next shard's first frame -> my temporal halo
    halo = lax.ppermute(
        frames[:1], "batch", [(i + 1, i) for i in range(n - 1)]
    )
    ext = jnp.concatenate([frames, halo], axis=0)  # (k+1, H, W)
    i1 = ext[:-1]
    i2 = ext[1:]
    k = frames.shape[0]
    local = jnp.arange(k)
    # global pair index t = idx*k + local must have a successor frame
    valid = (idx * k + local) < (n * k - 1)
    return i1, i2, valid
