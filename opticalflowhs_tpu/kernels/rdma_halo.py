"""In-kernel ring halo exchange via remote DMA (SURVEY.md §2c advanced path).

The production tiled solver exchanges halos with `lax.ppermute` between
Pallas sweep launches (dist/halo.py) — XLA schedules the collective. This
module is the fused alternative: the halo rows move chip-to-chip with
`pltpu.make_async_remote_copy` *inside* a Pallas kernel.

Two layers:

  * `ring_halo_exchange` — the standalone exchange primitive (round 1).
  * `ring_fused_sweeps` — the FUSED solver hot loop: ONE kernel launch runs
    all n Jacobi sweeps, exchanging a sigma-row u/v halo every s sweeps
    in-kernel and overlapping each transfer with the first sweep of the
    block on the halo-independent interior rows (SURVEY.md §2c "overlap
    comm with the interior-pixel sweep"). Routed from
    `hs_solve_tiled(halo_impl="rdma")` for 1-D row-decomposed meshes.

Ring semantics (periodic): chip i's top halo comes from chip i-1's bottom
rows and vice versa. On a 1-chip mesh the ring degenerates to self — the
exact same RDMA path — which is what the hardware tests assert here
(a real multi-chip ring exercises the identical code on a pod slice).
The non-periodic global boundary needs no special halo content: the solver
clamps at the true image edge via masks (kernels/jacobi.py), so at the top/
bottom of the ring the wrapped-around halo rows are garbage that true
pixels never read and that decays in the discarded ring (same argument as
the banded kernel's slabs).

Not supported in interpret mode (remote DMA needs real hardware), so this
stays a separately-(hardware-)tested path rather than the CI default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opticalflowhs_tpu.kernels.jacobi import (
    _edge_masks,
    _kernel_step,
    _round_up,
    pad_to_tiles,
)


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
    # Device ids are MESH dicts {ring_axis: coord}: unnamed axes default to
    # the sender's own coordinates (jax lowers the dict per-axis), so the
    # ring stays correct on any multi-axis ("batch", "y", "x") mesh — a
    # scalar LOGICAL id would alias across batch groups.
    rdma_up = pltpu.make_async_remote_copy(
        src_ref=x_ref.at[pl.ds(0, halo)],
        dst_ref=comm.at[1],
        send_sem=send_up_sem,
        recv_sem=recv_bot_sem,
        device_id={axis_name: up},
        device_id_type=pltpu.DeviceIdType.MESH,
    )
    rdma_dn = pltpu.make_async_remote_copy(
        src_ref=x_ref.at[pl.ds(h - halo, halo)],
        dst_ref=comm.at[0],
        send_sem=send_dn_sem,
        recv_sem=recv_top_sem,
        device_id={axis_name: dn},
        device_id_type=pltpu.DeviceIdType.MESH,
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


# -- fused solver hot loop: in-kernel exchange + sweeps, transfer overlapped --


def _step_rows(u, v, ex, ey, et, invd, mask_fn, r0: int, r1: int):
    """Rows [r0, r1) of one Jacobi sweep, reading rows [r0-1, r1+1).

    Masks come from `mask_fn` (fresh iotas per strip) rather than slicing a
    precomputed full-extent mask: Mosaic stores row-constant boolean masks
    in a broadcast layout whose strided-slice lowering check-fails."""
    sl = slice(r0 - 1, r1 + 1)
    mu = mask_fn(r0 - 1, r1 + 1)
    uu, vv = _kernel_step(u[sl], v[sl], ex[sl], ey[sl], et[sl], invd[sl], mu)
    return uu[1:-1], vv[1:-1]


def _fused_kernel(row0_ref, u0_ref, v0_ref, ex_ref, ey_ref, et_ref, invd_ref,
                  uo_ref, vo_ref,
                  uw, vw, ucomm, vcomm,
                  su_up, su_dn, ru_top, ru_bot,
                  sv_up, sv_dn, rv_top, rv_bot,
                  *, n_blocks: int, s: int, rem: int, sigma: int, th: int,
                  hglob: int, wglob: int, axis_name: str,
                  emulate_ring1: bool = False):
    if emulate_ring1:
        # CPU logic twin (round 5): on the degenerate 1-chip ring the
        # remote copies are LOCAL slot writes (up == dn == self), so every
        # other line of this kernel — slot parity double-buffering, halo
        # writes, strip decomposition, masks, decay loop — runs under
        # interpret mode in CI (test_rdma_halo.py). Only the physical
        # cross-chip transfer itself remains hardware-only.
        up = dn = 0
    else:
        n = jax.lax.axis_size(axis_name)
        me = jax.lax.axis_index(axis_name)
        up = jax.lax.rem(me - 1 + n, n)
        dn = jax.lax.rem(me + 1, n)
    hp2, wp = uw.shape  # th + 2*sigma

    ex, ey = ex_ref[...], ey_ref[...]
    et, invd = et_ref[...], invd_ref[...]

    def mask_fn(r0: int, r1: int):
        # True-edge clamp masks for working rows [r0, r1): left col is the
        # array edge (no left pad); top/bottom array edges are halo rows,
        # never the true image edge. Fresh iotas per extent (see _step_rows).
        rows = r1 - r0
        gr = (row0_ref[0] - sigma + r0
              + jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 0))
        gc = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 1)
        return _edge_masks(gr, gc, hglob, wglob,
                           (False, False, True, wglob == wp))

    masks = mask_fn(0, hp2)

    uw[pl.ds(sigma, th)] = u0_ref[...]
    vw[pl.ds(sigma, th)] = v0_ref[...]

    def run_block(s_blk: int, parity):
        # Exchange sigma-row u/v halos with both ring neighbors; overlap the
        # transfer with sweep 1 on the halo-independent interior rows.
        #
        # comm slots are double-buffered by block parity: block k+1's
        # incoming transfer lands in the OTHER slot, so a fast neighbor can
        # never overwrite slot data this chip has not consumed yet (its
        # block-k+2 send is transitively ordered after my block-k consume
        # through the recv->compute->send chain).
        dmas = []
        if emulate_ring1:
            # 1-ring logic twin: the same slot writes the remote copies
            # below perform, minus the wire (self is both neighbors).
            for buf, comm in ((uw, ucomm), (vw, vcomm)):
                comm[parity, 1] = buf[pl.ds(sigma, sigma)]
                comm[parity, 0] = buf[pl.ds(th, sigma)]
        else:
            for buf, comm, s_up, s_dn, r_top, r_bot in (
                (uw, ucomm, su_up, su_dn, ru_top, ru_bot),
                (vw, vcomm, sv_up, sv_dn, rv_top, rv_bot),
            ):
                dmas.append(pltpu.make_async_remote_copy(
                    src_ref=buf.at[pl.ds(sigma, sigma)],  # my top owned rows
                    dst_ref=comm.at[parity, 1],           # -> up's bottom halo
                    send_sem=s_up, recv_sem=r_bot,
                    device_id={axis_name: up},  # MESH dict: other axes = own
                    device_id_type=pltpu.DeviceIdType.MESH,
                ))
                dmas.append(pltpu.make_async_remote_copy(
                    src_ref=buf.at[pl.ds(th, sigma)],     # my bottom owned rows
                    dst_ref=comm.at[parity, 0],           # -> down's top halo
                    send_sem=s_dn, recv_sem=r_top,
                    device_id={axis_name: dn},
                    device_id_type=pltpu.DeviceIdType.MESH,
                ))
        for d in dmas:
            d.start()
        # Sweep 1, interior: rows [sigma+1, sigma+th-1) read only owned
        # pre-sweep rows [sigma, sigma+th) — no halo dependence.
        u_pre, v_pre = uw[...], vw[...]
        u1i, v1i = _step_rows(
            u_pre, v_pre, ex, ey, et, invd, mask_fn, sigma + 1, sigma + th - 1
        )
        for d in dmas:
            d.wait()
        uw[pl.ds(0, sigma)] = ucomm[parity, 0]
        uw[pl.ds(sigma + th, sigma)] = ucomm[parity, 1]
        vw[pl.ds(0, sigma)] = vcomm[parity, 0]
        vw[pl.ds(sigma + th, sigma)] = vcomm[parity, 1]
        # Sweep 1, halo-adjacent strips (fresh halos + untouched pre-sweep
        # owned rows are both still in uw/vw).
        u_all, v_all = uw[...], vw[...]
        u1t, v1t = _step_rows(
            u_all, v_all, ex, ey, et, invd, mask_fn, 1, sigma + 1
        )
        u1b, v1b = _step_rows(
            u_all, v_all, ex, ey, et, invd, mask_fn, sigma + th - 1, hp2 - 1
        )
        u1 = jnp.concatenate([u_all[:1], u1t, u1i, u1b, u_all[-1:]], axis=0)
        v1 = jnp.concatenate([v_all[:1], v1t, v1i, v1b, v_all[-1:]], axis=0)
        # Sweeps 2..s_blk: fully local, valid extent decays one ring/sweep
        # while the owned rows stay exact (sigma >= s_blk).
        for _ in range(s_blk - 1):
            u1, v1 = _kernel_step(u1, v1, ex, ey, et, invd, masks)
        uw[...] = u1
        vw[...] = v1

    if n_blocks > 0:
        def body(k, c):
            run_block(s, jax.lax.rem(k, 2))
            return c
        jax.lax.fori_loop(0, n_blocks, body, 0)
    if rem:
        run_block(rem, n_blocks % 2)

    uo_ref[...] = uw[pl.ds(sigma, th)]
    vo_ref[...] = vw[pl.ds(sigma, th)]


def ring_fused_sweeps(
    u: jnp.ndarray,
    v: jnp.ndarray,
    exh: jnp.ndarray,
    eyh: jnp.ndarray,
    eth: jnp.ndarray,
    invdh: jnp.ndarray,
    n_sweeps: int,
    block_sweeps: int,
    row0,
    hglob: int,
    wglob: int,
    axis_name: str = "y",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """All n sweeps of one chip's row-decomposed tile in ONE kernel launch,
    with in-kernel remote-DMA halo exchange every `block_sweeps` sweeps and
    transfer/compute overlap (SURVEY.md §2c advanced path; the ppermute
    twin is dist/tiled_solver.py's hot loop).

    u, v: (th, tw) owned tile; exh/eyh/eth/invdh: (th + 2*sigma, tw)
    halo-extended loop-invariant fields, sigma = round_up(block_sweeps, 8)
    (exchanged once by the caller — they never change). `row0` (traced) is
    the global row of owned row 0; clamps fire at the true (hglob, wglob)
    edges. Must run inside shard_map with `axis_name` bound, mesh x-size 1.
    TPU hardware only (remote DMA does not interpret).
    """
    th, tw = u.shape
    if th % 8:
        raise ValueError(
            f"tile height {th} must be a multiple of 8 (in-kernel DMA slices "
            "start at sublane-aligned rows; pad the tile)"
        )
    s = max(1, min(block_sweeps, n_sweeps))
    sigma = _round_up(s, 8)
    if exh.shape[0] != th + 2 * sigma:
        raise ValueError(
            f"fields must carry a {sigma}-row halo: got {exh.shape[0]} rows "
            f"for a {th}-row tile"
        )
    if n_sweeps == 0:
        return u, v
    wp = _round_up(tw, 128)
    u, v = pad_to_tiles(u, th, wp), pad_to_tiles(v, th, wp)
    fields = [pad_to_tiles(a, th + 2 * sigma, wp) for a in (exh, eyh, eth, invdh)]
    n_blocks, rem = divmod(n_sweeps, s)
    out = jax.ShapeDtypeStruct((th, wp), u.dtype)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    uo, vo = pl.pallas_call(
        functools.partial(
            _fused_kernel, n_blocks=n_blocks, s=s, rem=rem, sigma=sigma,
            th=th, hglob=hglob, wglob=wglob, axis_name=axis_name,
        ),
        out_shape=(out, out),
        in_specs=[sspec] + [vspec] * 6,
        out_specs=(vspec, vspec),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * sigma, wp), u.dtype),
            pltpu.VMEM((th + 2 * sigma, wp), u.dtype),
            pltpu.VMEM((2, 2, sigma, wp), u.dtype),  # [parity][top/bot]
            pltpu.VMEM((2, 2, sigma, wp), u.dtype),
        ] + [pltpu.SemaphoreType.DMA(())] * 8,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # Whole-tile VMEM residency, like the _sweeps_vmem kernel: lift
            # the default ~19.5 MB scoped-vmem limit (kernels/jacobi.py).
            vmem_limit_bytes=100 * 1024 * 1024 + 8 * 1024 * 1024,
        ),
    )(jnp.asarray(row0, jnp.int32).reshape(1), u, v, *fields)
    return uo[:, :tw], vo[:, :tw]


def ring_fused_sweeps_logic_twin(
    u: jnp.ndarray,
    v: jnp.ndarray,
    exh: jnp.ndarray,
    eyh: jnp.ndarray,
    eth: jnp.ndarray,
    invdh: jnp.ndarray,
    n_sweeps: int,
    block_sweeps: int,
    row0,
    hglob: int,
    wglob: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """CPU-runnable logic twin of ring_fused_sweeps (round-5 VERDICT
    item 8): the SAME `_fused_kernel` body under interpret mode on the
    degenerate 1-chip ring, with the remote copies emulated as local slot
    writes (self is both ring neighbors — exactly the topology the
    hardware tests run). This puts the slot-parity double buffering, halo
    placement, strip decomposition, true-edge masks, and decay loop under
    CI on every platform; the physical cross-chip DMA ordering remains
    covered by the hardware-marked tests (test_rdma_halo.py tpu subset).
    Takes no axis_name: there is no mesh — owned rows must be the whole
    global image (the 1-ring), as in the degenerate hardware legs."""
    th, tw = u.shape
    if th % 8:
        raise ValueError(f"tile height {th} must be a multiple of 8")
    s = max(1, min(block_sweeps, n_sweeps))
    sigma = _round_up(s, 8)
    if exh.shape[0] != th + 2 * sigma:
        raise ValueError(
            f"fields must carry a {sigma}-row halo: got {exh.shape[0]} rows "
            f"for a {th}-row tile"
        )
    if n_sweeps == 0:
        return u, v
    wp = _round_up(tw, 128)
    u, v = pad_to_tiles(u, th, wp), pad_to_tiles(v, th, wp)
    fields = [pad_to_tiles(a, th + 2 * sigma, wp)
              for a in (exh, eyh, eth, invdh)]
    n_blocks, rem = divmod(n_sweeps, s)
    out = jax.ShapeDtypeStruct((th, wp), u.dtype)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    uo, vo = pl.pallas_call(
        functools.partial(
            _fused_kernel, n_blocks=n_blocks, s=s, rem=rem, sigma=sigma,
            th=th, hglob=hglob, wglob=wglob, axis_name="y",
            emulate_ring1=True,
        ),
        out_shape=(out, out),
        in_specs=[sspec] + [vspec] * 6,
        out_specs=(vspec, vspec),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * sigma, wp), u.dtype),
            pltpu.VMEM((th + 2 * sigma, wp), u.dtype),
            pltpu.VMEM((2, 2, sigma, wp), u.dtype),  # [parity][top/bot]
            pltpu.VMEM((2, 2, sigma, wp), u.dtype),
        ] + [pltpu.SemaphoreType.DMA(())] * 8,
        interpret=True,
    )(jnp.asarray(row0, jnp.int32).reshape(1), u, v, *fields)
    return uo[:, :tw], vo[:, :tw]


# -- 2-D mesh variant: row ring x column ring ----------------------------------

_LC = 128  # column-halo width: one lane tile, so every DMA slice stays
           # lane-aligned; >= any admissible block_sweeps, so one exchange
           # covers a full block's decay on the x axis too


def _fused_kernel_2d(pos_ref, u0_ref, v0_ref, ex_ref, ey_ref, et_ref,
                     invd_ref, uo_ref, vo_ref,
                     uw, vw, urow, vrow, ucol, vcol, ssem, rsem,
                     *, n_blocks: int, s: int, rem: int, sigma: int,
                     th: int, tw: int, hglob: int, wglob: int,
                     axis_y: str, axis_x: str):
    ny = jax.lax.axis_size(axis_y)
    me_y = jax.lax.axis_index(axis_y)
    up = jax.lax.rem(me_y - 1 + ny, ny)
    dn = jax.lax.rem(me_y + 1, ny)
    nx = jax.lax.axis_size(axis_x)
    me_x = jax.lax.axis_index(axis_x)
    lf = jax.lax.rem(me_x - 1 + nx, nx)
    rt = jax.lax.rem(me_x + 1, nx)
    hp2, wp2 = uw.shape  # (th + 2*sigma, tw + 2*_LC)

    ex, ey = ex_ref[...], ey_ref[...]
    et, invd = et_ref[...], invd_ref[...]

    gr = (pos_ref[0] - sigma
          + jax.lax.broadcasted_iota(jnp.int32, (hp2, wp2), 0))
    gc = (pos_ref[1] - _LC
          + jax.lax.broadcasted_iota(jnp.int32, (hp2, wp2), 1))
    masks = _edge_masks(gr, gc, hglob, wglob)

    uw[pl.ds(sigma, th), pl.ds(_LC, tw)] = u0_ref[...]
    vw[pl.ds(sigma, th), pl.ds(_LC, tw)] = v0_ref[...]

    def run_block(s_blk: int, parity):
        # Two-phase exchange (v1: serial with the sweeps — the 1-D path
        # keeps the tuned overlap). Phase R moves sigma-row strips of the
        # OWNED columns along the y ring; phase C then moves full-height
        # _LC-column strips along the x ring INCLUDING the just-received
        # row halos, which lands the corners without diagonal transfers
        # (the classic two-phase halo argument, dist/halo.py).
        dmas = []
        for j, (buf, comm) in enumerate(((uw, urow), (vw, vrow))):
            dmas.append(pltpu.make_async_remote_copy(
                src_ref=buf.at[pl.ds(sigma, sigma), pl.ds(_LC, tw)],
                dst_ref=comm.at[parity, 1],
                send_sem=ssem.at[j], recv_sem=rsem.at[j],
                device_id={axis_y: up},
                device_id_type=pltpu.DeviceIdType.MESH,
            ))
            dmas.append(pltpu.make_async_remote_copy(
                src_ref=buf.at[pl.ds(th, sigma), pl.ds(_LC, tw)],
                dst_ref=comm.at[parity, 0],
                send_sem=ssem.at[2 + j], recv_sem=rsem.at[2 + j],
                device_id={axis_y: dn},
                device_id_type=pltpu.DeviceIdType.MESH,
            ))
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()
        uw[pl.ds(0, sigma), pl.ds(_LC, tw)] = urow[parity, 0]
        uw[pl.ds(sigma + th, sigma), pl.ds(_LC, tw)] = urow[parity, 1]
        vw[pl.ds(0, sigma), pl.ds(_LC, tw)] = vrow[parity, 0]
        vw[pl.ds(sigma + th, sigma), pl.ds(_LC, tw)] = vrow[parity, 1]

        dmas = []
        for j, (buf, comm) in enumerate(((uw, ucol), (vw, vcol))):
            dmas.append(pltpu.make_async_remote_copy(
                src_ref=buf.at[:, pl.ds(_LC, _LC)],
                dst_ref=comm.at[parity, 1],
                send_sem=ssem.at[4 + j], recv_sem=rsem.at[4 + j],
                device_id={axis_x: lf},
                device_id_type=pltpu.DeviceIdType.MESH,
            ))
            dmas.append(pltpu.make_async_remote_copy(
                src_ref=buf.at[:, pl.ds(tw, _LC)],
                dst_ref=comm.at[parity, 0],
                send_sem=ssem.at[6 + j], recv_sem=rsem.at[6 + j],
                device_id={axis_x: rt},
                device_id_type=pltpu.DeviceIdType.MESH,
            ))
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()
        uw[:, pl.ds(0, _LC)] = ucol[parity, 0]
        uw[:, pl.ds(_LC + tw, _LC)] = ucol[parity, 1]
        vw[:, pl.ds(0, _LC)] = vcol[parity, 0]
        vw[:, pl.ds(_LC + tw, _LC)] = vcol[parity, 1]

        u1, v1 = uw[...], vw[...]
        for _ in range(s_blk):
            u1, v1 = _kernel_step(u1, v1, ex, ey, et, invd, masks)
        uw[...] = u1
        vw[...] = v1

    if n_blocks > 0:
        def body(k, c):
            run_block(s, jax.lax.rem(k, 2))
            return c
        jax.lax.fori_loop(0, n_blocks, body, 0)
    if rem:
        run_block(rem, n_blocks % 2)

    uo_ref[...] = uw[pl.ds(sigma, th), pl.ds(_LC, tw)]
    vo_ref[...] = vw[pl.ds(sigma, th), pl.ds(_LC, tw)]


def ring_fused_sweeps_2d(
    u: jnp.ndarray,
    v: jnp.ndarray,
    exh: jnp.ndarray,
    eyh: jnp.ndarray,
    eth: jnp.ndarray,
    invdh: jnp.ndarray,
    n_sweeps: int,
    block_sweeps: int,
    row0,
    col0,
    hglob: int,
    wglob: int,
    axis_y: str = "y",
    axis_x: str = "x",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """2-D mesh twin of ring_fused_sweeps: all n sweeps of one chip's
    (row x column)-decomposed tile in ONE launch, exchanging u/v halos
    in-kernel along BOTH mesh rings every `block_sweeps` sweeps — sigma
    rows on y, one 128-column lane tile on x, corners via the two-phase
    order (columns carry the fresh row halos).

    u, v: (th, tw) owned tile, th % 8 == 0 and tw % 128 == 0 (pad the
    sharded array so every DMA slice is tile-aligned). exh/eyh/eth/invdh:
    (th + 2*sigma, tw + 2*128) halo-extended loop-invariant fields
    (exchanged once by the caller). row0/col0 (traced): global coords of
    owned (0, 0); clamps fire at the true (hglob, wglob) edges. Must run
    inside shard_map with both axis names bound. TPU hardware only.
    """
    th, tw = u.shape
    if th % 8 or tw % _LC:
        raise ValueError(
            f"tile {th}x{tw} must be 8-row / 128-column aligned (in-kernel "
            "DMA slices are tile-aligned; pad the sharded array)"
        )
    s = max(1, min(block_sweeps, n_sweeps))
    sigma = _round_up(s, 8)
    if s > _LC:
        raise ValueError(f"block_sweeps {s} exceeds the {_LC}-column x halo")
    if exh.shape != (th + 2 * sigma, tw + 2 * _LC):
        raise ValueError(
            f"fields must carry ({sigma}-row, {_LC}-col) halos: got "
            f"{exh.shape} for a {th}x{tw} tile"
        )
    if n_sweeps == 0:
        return u, v
    n_blocks, rem = divmod(n_sweeps, s)
    out = jax.ShapeDtypeStruct((th, tw), u.dtype)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    hp2, wp2 = th + 2 * sigma, tw + 2 * _LC
    pos = jnp.stack([jnp.asarray(row0, jnp.int32),
                     jnp.asarray(col0, jnp.int32)])
    uo, vo = pl.pallas_call(
        functools.partial(
            _fused_kernel_2d, n_blocks=n_blocks, s=s, rem=rem, sigma=sigma,
            th=th, tw=tw, hglob=hglob, wglob=wglob,
            axis_y=axis_y, axis_x=axis_x,
        ),
        out_shape=(out, out),
        in_specs=[sspec] + [vspec] * 6,
        out_specs=(vspec, vspec),
        scratch_shapes=[
            pltpu.VMEM((hp2, wp2), u.dtype),            # u working
            pltpu.VMEM((hp2, wp2), u.dtype),            # v working
            pltpu.VMEM((2, 2, sigma, tw), u.dtype),     # u row slots
            pltpu.VMEM((2, 2, sigma, tw), u.dtype),     # v row slots
            pltpu.VMEM((2, 2, hp2, _LC), u.dtype),      # u col slots
            pltpu.VMEM((2, 2, hp2, _LC), u.dtype),      # v col slots
            pltpu.SemaphoreType.DMA((8,)),              # send
            pltpu.SemaphoreType.DMA((8,)),              # recv
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024 + 8 * 1024 * 1024,
        ),
    )(pos, u, v, exh, eyh, eth, invdh)
    return uo, vo
