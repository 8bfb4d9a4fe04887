"""Pallas TPU kernel: z-slab-pruned general H-bond counting (two point sets).

The dense kernel (hbond_kernel.py) visits every acceptor x donor pair; at
the 3.5 A heavy-heavy cutoff more than 80% of those pairs are guaranteed
misses on production boxes. This variant extends the one-set slab trick
(slab.py) to TWO sets: acceptors and donors are each sorted by z (per
frame, in-graph), donors get z-shifted boundary copies, and each
128-acceptor tile sweeps only the donor window within `dist_cut` (in z) of
the tile. A bond requires heavy-heavy distance <= dist_cut, so a window
that covers [tile_zmin - dist_cut, tile_zmax + dist_cut] provably holds
every bondable donor — certified per frame by `covered` (window width and
pad depth sufficiency), with the dense kernel as the fallback.

Same criteria as hbond_kernel / bonds.general_hbonds (waterlib.f90:
1136-1210): heavy-heavy dsq <= dist_cut^2, self pairs dsq <= 1e-2
excluded, D-H...A angle at the hydrogen >= ang_cut via the cos-threshold
test (no acos).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from waterorderlib_tpu.core import pbc


def _make_kernel(r: int, w: int):
    def kernel(scalars_ref, starts_ref, acc_t_ref, don_t_ref, donh_t_ref,
               vhat_t_ref, acc_cnt_ref, don_cnt_ref):
        i = pl.program_id(0)
        dist_sq = scalars_ref[2]
        cos_cut = scalars_ref[3]
        bx, by, bz = scalars_ref[4], scalars_ref[5], scalars_ref[6]

        row0 = i * r
        start = starts_ref[i] * 128

        def mi(d, box_l):
            d = jnp.where(d > box_l * 0.5, d - box_l, d)
            return jnp.where(d < -box_l * 0.5, d + box_l, d)

        xa = acc_t_ref[0, pl.ds(row0, r)].reshape(r, 1)
        ya = acc_t_ref[1, pl.ds(row0, r)].reshape(r, 1)
        za = acc_t_ref[2, pl.ds(row0, r)].reshape(r, 1)
        xd = don_t_ref[0, pl.ds(start, w)].reshape(1, w)
        yd = don_t_ref[1, pl.ds(start, w)].reshape(1, w)
        zd = don_t_ref[2, pl.ds(start, w)].reshape(1, w)
        xh = donh_t_ref[0, pl.ds(start, w)].reshape(1, w)
        yh = donh_t_ref[1, pl.ds(start, w)].reshape(1, w)
        zh = donh_t_ref[2, pl.ds(start, w)].reshape(1, w)
        vx = vhat_t_ref[0, pl.ds(start, w)].reshape(1, w)
        vy = vhat_t_ref[1, pl.ds(start, w)].reshape(1, w)
        vz = vhat_t_ref[2, pl.ds(start, w)].reshape(1, w)

        dxd = mi(xd - xa, bx)
        dyd = mi(yd - ya, by)
        dzd = mi(zd - za, bz)
        dsq = dxd * dxd + dyd * dyd + dzd * dzd
        within = (dsq <= dist_sq) & (dsq > 1.0e-2)

        ux = mi(xa - xh, bx)
        uy = mi(ya - yh, by)
        uz = mi(za - zh, bz)
        usq = ux * ux + uy * uy + uz * uz
        t = ux * vx + uy * vy + uz * vz
        bond = (within & (t <= cos_cut * jnp.sqrt(usq))).astype(jnp.float32)

        acc_cnt_ref[pl.ds(i, 1), :] = jnp.sum(bond, axis=1).reshape(1, r)
        don_contrib = jnp.sum(bond, axis=0, keepdims=True)  # (1, w)

        @pl.when(i == 0)
        def _():
            don_cnt_ref[:, :] = jnp.zeros_like(don_cnt_ref)

        don_cnt_ref[:, pl.ds(start, w)] = don_cnt_ref[:, pl.ds(start, w)] + don_contrib

    return kernel


def suggest_window_two_set(
    na: int, nd: int, box_z: float, cut: float, row_tile: int = 128,
    safety: float = 1.5,
) -> int:
    """Donor-window width (multiple of 128) expected to cover an acceptor
    tile's z-slab; `covered` still verifies at run time."""
    est = nd * (row_tile / max(na, 1) * box_z + 2.0 * cut) / box_z * safety + 256
    return int(-(-est // 128) * 128)


def suggest_pad_two_set(nd: int, box_z: float, cut: float, safety: float = 1.8) -> int:
    """Donor boundary-copy count whose z extent is expected to exceed the
    cutoff on both faces."""
    est = nd * cut / box_z * safety + 128
    return int(min(nd, -(-est // 128) * 128))


@partial(jax.jit, static_argnames=("row_tile", "window", "pad"))
def hbond_counts_slab(
    acc_pos: jnp.ndarray,
    don_pos: jnp.ndarray,
    donh_pos: jnp.ndarray,
    box: jnp.ndarray,
    dist_cut: float = 3.5,
    ang_cut: float = 120.0,
    row_tile: int = 128,
    window: int = 1536,
    pad: int = 512,
):
    """(acc_counts (Na,), don_counts (Nd,), covered ()) — slab-pruned
    equivalent of hbond_kernel.hbond_counts. `covered` certifies that every
    acceptor tile's donor window held all donors within `dist_cut` in z
    (callers fall back to the dense kernel when False). Jittable; sorts
    both sets per call, so no persistent-ordering drift concerns."""
    na, nd = acc_pos.shape[0], don_pos.shape[0]
    box = box.astype(jnp.float32)

    acc_w = jnp.mod(acc_pos, box[None, :])
    don_w = jnp.mod(don_pos, box[None, :])
    # hydrogens ride with their donor under the same wrap offset so the
    # donor copies below keep the D-H pair contiguous (mi() in-kernel only
    # corrects by one box length)
    donh_w = don_w + pbc.minimum_image(donh_pos - don_pos, box)
    vden = pbc.minimum_image(don_pos - donh_pos, box)
    vhat = vden / jnp.maximum(jnp.linalg.norm(vden, axis=-1, keepdims=True), 1e-12)

    # z-sort both sets
    order_a = jnp.argsort(acc_w[:, 2])
    order_d = jnp.argsort(don_w[:, 2])
    acc_s = acc_w[order_a]
    don_s = don_w[order_d]
    donh_s = donh_w[order_d]
    vhat_s = vhat[order_d]

    # acceptor rows padded with far-away sentinels (never bond, never
    # perturb windows: their window start clips to the array end)
    r = row_tile
    na_pad = -(-na // r) * r
    sentinel = jnp.full((na_pad - na, 3), 1.0e6, acc_s.dtype)
    acc_sp = jnp.concatenate([acc_s, sentinel], axis=0)
    n_tiles = na_pad // r

    # donor boundary copies, z-shifted by +-L so ext z is monotone
    L = box[2]
    z_shift = jnp.array([0.0, 0.0, 1.0], jnp.float32) * L
    don_ext = jnp.concatenate(
        [don_s[-pad:] - z_shift, don_s, don_s[:pad] + z_shift], axis=0
    )
    donh_ext = jnp.concatenate(
        [donh_s[-pad:] - z_shift, donh_s, donh_s[:pad] + z_shift], axis=0
    )
    vhat_ext = jnp.concatenate([vhat_s[-pad:], vhat_s, vhat_s[:pad]], axis=0)
    nd_ext = nd + 2 * pad
    # a window wider than Nd can hold a donor AND its boundary copy and
    # double-count bonds; below 128 donors no lane-aligned window can avoid
    # that, so refuse (the dense kernel is the right tool there anyway)
    if nd < 128:
        raise ValueError("hbond_counts_slab needs >= 128 donors; use hbond_counts")
    w = min(window, nd_ext, (nd // 128) * 128)

    ext_z = don_ext[:, 2]
    tile_first = jnp.arange(n_tiles) * r
    tile_last = jnp.minimum(tile_first + r - 1, na - 1)
    # tile_last is clamped to the last REAL acceptor, so sentinel rows never
    # widen a window
    z_lo = acc_sp[:, 2][tile_first] - dist_cut
    z_hi = acc_sp[:, 2][tile_last] + dist_cut
    starts = jnp.searchsorted(ext_z, z_lo, side="left")
    ends = jnp.searchsorted(ext_z, z_hi, side="right")
    starts = (starts // 128) * 128
    starts = jnp.clip(starts, 0, nd_ext - w)
    real_tile = tile_first < na
    pad_ok = (ext_z[0] <= jnp.min(z_lo)) & (
        ext_z[-1] >= jnp.max(jnp.where(real_tile, z_hi, -jnp.inf))
    )
    covered = jnp.all(jnp.where(real_tile, ends - starts <= w, True)) & pad_ok
    starts_f = (starts // 128).astype(jnp.int32)

    cos_cut = jnp.cos(jnp.radians(jnp.asarray(ang_cut, jnp.float32)))
    scalars = jnp.stack(
        [jnp.float32(na), jnp.float32(nd),
         jnp.asarray(dist_cut * dist_cut, jnp.float32), cos_cut,
         box[0], box[1], box[2]]
    )

    def padt(a):
        return jnp.transpose(a).astype(jnp.float32)

    acc_cnt, don_cnt = pl.pallas_call(
        _make_kernel(r, w),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((3, na_pad), lambda i, s1, s2: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, nd_ext), lambda i, s1, s2: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, nd_ext), lambda i, s1, s2: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, nd_ext), lambda i, s1, s2: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((n_tiles, r), lambda i, s1, s2: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nd_ext), lambda i, s1, s2: (0, 0), memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, r), jnp.float32),
            jax.ShapeDtypeStruct((1, nd_ext), jnp.float32),
        ),
    )(scalars, starts_f, padt(acc_sp), padt(don_ext), padt(donh_ext), padt(vhat_ext))

    # unsort acceptors; fold donor boundary copies back onto their sources
    acc_out = jnp.zeros(na, jnp.float32).at[order_a].set(acc_cnt.reshape(-1)[:na])
    dc = don_cnt[0]
    main = dc[pad : pad + nd]
    main = main.at[nd - pad :].add(dc[:pad])
    main = main.at[:pad].add(dc[pad + nd :])
    don_out = jnp.zeros(nd, jnp.float32).at[order_d].set(main)
    return acc_out, don_out, covered
