"""Pallas TPU kernel: open-space K-nearest candidates for device Voronoi.

Drop-in replacement for the XLA `_windowed_topk` stage of
`surface.voronoi_device` (the top-k candidate search was the largest single
cost of the device tessellation: 189 of 357 ms/frame at 12k atoms —
`lax.top_k` over ~13.5k-lane windows is sort-bound). Reference workload:
the scipy.spatial Voronoi tessellations behind
/root/reference/structureLibs/orderParam_lib.py:920-962 and
surface_library.py:245-307.

Same shape of machinery as the *_chunked order-parameter kernels
(slab.extract_k_min / slab.merge_k_min), with three differences:

- the candidate set is the MIRRORED point set in open space: no periodic
  wrap, no boundary copies, no min-image — so no double-count hazard and
  the window may legally cover the whole set;
- K = k_search (64 by default) is much larger than the order-parameter
  K's, so the (row, seg) scratch is kept narrow (seg=768) to fit the
  ~(2 + 0.32*K)x Mosaic stack;
- the payload is each candidate's position in the z-sorted candidate
  array (exact in f32 up to 2^24), mapped back to original candidate ids
  outside the kernel.

Coverage is certified OUTSIDE the kernel exactly like `_windowed_topk`:
per center, the window's z extent must reach at least d_K beyond the
center on each side (or hit the array end), and every slot must be
filled. Ties at equal distance may resolve differently than `lax.top_k`
(first-column rule vs sort order); the Voronoi certificates make either
choice exact, so results differ only on uncertified cells.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from waterorderlib_tpu.ops.pallas.slab import extract_k_min, merge_k_min


def _make_kernel(row_tile: int, seg: int, n_seg: int, k: int):
    def kernel(starts_ref, cen_t_ref, ext_t_ref, dist_ref, idx_ref, dsq_ref):
        i = pl.program_id(0)
        r = row_tile
        start = starts_ref[i] * 128
        xr = cen_t_ref[0, pl.ds(i * r, r)].reshape(r, 1)
        yr = cen_t_ref[1, pl.ds(i * r, r)].reshape(r, 1)
        zr = cen_t_ref[2, pl.ds(i * r, r)].reshape(r, 1)

        col = jax.lax.broadcasted_iota(jnp.int32, (r, seg), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, seg), 1).astype(jnp.float32)

        def segment(s, carry):
            cd, cidx = carry
            seg_start = pl.multiple_of(start + s * seg, 128)
            xs = ext_t_ref[0, pl.ds(seg_start, seg)].reshape(1, seg)
            ys = ext_t_ref[1, pl.ds(seg_start, seg)].reshape(1, seg)
            zs = ext_t_ref[2, pl.ds(seg_start, seg)].reshape(1, seg)
            gpos = seg_start.astype(jnp.float32) + lane  # sorted-ext position
            dx = xs - xr
            dy = ys - yr
            dz = zs - zr
            dsq = dx * dx + dy * dy + dz * dz
            # self-exclusion (a center IS one of the candidates) and the
            # +inf sentinel lanes both land on the invalid side
            dsq_ref[:] = jnp.where(dsq > 0.0, dsq, jnp.inf)
            nd, (pos_j,), oks = extract_k_min(dsq_ref, col, [gpos], k)
            npos = [jnp.where(oks[j], pos_j[j], -1.0) for j in range(k)]
            kd, (kidx,) = merge_k_min(
                jnp.concatenate([cd] + nd, axis=1),
                [jnp.concatenate([cidx] + npos, axis=1)],
                k,
                invalids=[-1.0],
            )
            return kd, kidx

        init = (
            jnp.full((r, k), jnp.inf, jnp.float32),
            jnp.full((r, k), -1.0, jnp.float32),
        )
        cd, cidx = jax.lax.fori_loop(0, n_seg, segment, init)
        dist_ref[0] = jnp.sqrt(cd)
        idx_ref[0] = cidx

    return kernel


def fits_voronoi_topk(
    row_tile: int, seg: int, k: int, p4: int, num: int | None = None
) -> bool:
    """Scoped-VMEM pre-guard (same empirical model as slab.fits_scoped_vmem,
    plus the merge stack over (r, 2K) and the VMEM-resident (3, p4)
    candidate + (3, num) center arrays)."""
    extract = row_tile * seg * 4 * (2.0 + 0.32 * k)
    merge = row_tile * 2 * k * 4 * (2.0 + 0.32 * k)
    resident = 3 * p4 * 4 + 3 * (p4 if num is None else num) * 4
    return extract + merge + resident <= 14_500_000


@partial(jax.jit, static_argnames=("k", "row_tile", "win", "seg"))
def _topk_pallas(cen_t, ext_t, starts, k, row_tile, win, seg):
    n_tiles = cen_t.shape[1] // row_tile
    n_seg = win // seg
    out_spec = pl.BlockSpec(
        (1, row_tile, k), lambda i, s1: (i, 0, 0), memory_space=pltpu.VMEM
    )
    full = lambda i, s1: (0, 0)
    dist, idxf = pl.pallas_call(
        _make_kernel(row_tile, seg, n_seg, k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(cen_t.shape, full, memory_space=pltpu.VMEM),
                pl.BlockSpec(ext_t.shape, full, memory_space=pltpu.VMEM),
            ],
            out_specs=(out_spec, out_spec),
            scratch_shapes=[pltpu.VMEM((row_tile, seg), jnp.float32)],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, row_tile, k), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, row_tile, k), jnp.float32),
        ),
    )(starts, cen_t, ext_t)
    return dist.reshape(-1, k), idxf.reshape(-1, k)


def _make_cg_kernel(row_tile: int, seg: int, n_seg: int, k: int):
    """Per-row-candidate variant of `_make_kernel`: each row brings its OWN
    (4, L) candidate planes [x, y, z, idx] (the cell-grid 27-neighborhood
    gather), instead of all rows sharing one z-sorted window."""

    def kernel(cen_t_ref, planes_ref, dist_ref, idx_ref, dsq_ref):
        i = pl.program_id(0)
        r = row_tile
        xr = cen_t_ref[0, pl.ds(i * r, r)].reshape(r, 1)
        yr = cen_t_ref[1, pl.ds(i * r, r)].reshape(r, 1)
        zr = cen_t_ref[2, pl.ds(i * r, r)].reshape(r, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (r, seg), 1)

        def segment(s, carry):
            cd, cidx = carry
            o = pl.multiple_of(s * seg, 128)
            xs = planes_ref[0, :, pl.ds(o, seg)]
            ys = planes_ref[1, :, pl.ds(o, seg)]
            zs = planes_ref[2, :, pl.ds(o, seg)]
            ids = planes_ref[3, :, pl.ds(o, seg)]
            dx = xs - xr
            dy = ys - yr
            dz = zs - zr
            dsq = dx * dx + dy * dy + dz * dz
            # self-exclusion (the center is one of its cell's members);
            # parked empty slots carry x=y=z=+inf so their dsq is +inf
            dsq_ref[:] = jnp.where(dsq > 0.0, dsq, jnp.inf)
            nd, (pid,), oks = extract_k_min(dsq_ref, col, [ids], k)
            npid = [jnp.where(oks[j], pid[j], -1.0) for j in range(k)]
            kd, (kidx,) = merge_k_min(
                jnp.concatenate([cd] + nd, axis=1),
                [jnp.concatenate([cidx] + npid, axis=1)],
                k,
                invalids=[-1.0],
            )
            return kd, kidx

        init = (
            jnp.full((r, k), jnp.inf, jnp.float32),
            jnp.full((r, k), -1.0, jnp.float32),
        )
        cd, cidx = jax.lax.fori_loop(0, n_seg, segment, init)
        dist_ref[0] = jnp.sqrt(cd)
        idx_ref[0] = cidx

    return kernel


def pick_cg_seg(k: int, lanes: int, rc: int = 4096):
    """(row_tile, seg) for `cellgrid_extract_pallas` fitting scoped VMEM
    (same ~(2 + 0.32*K)x Mosaic stack model as fits_voronoi_topk, plus the
    per-tile (4, row_tile, Lp) planes block), or None when no segment
    width fits (k_search too large). row_tile is pinned at 128: tile starts
    must be statically 128-aligned for the manual center loads (Mosaic
    rejects `pl.ds(i * 64, …)` — "cannot statically prove … multiple of
    128")."""
    for rt in (128,):
        for seg in (1024, 896, 768, 640, 512, 384, 256):
            n_seg = -(-lanes // seg)
            lp = n_seg * seg
            extract = rt * seg * 4 * (2.0 + 0.32 * k)
            merge = rt * 2 * k * 4 * (2.0 + 0.32 * k)
            block = 4 * rt * lp * 4
            cen = 3 * rc * 4
            if extract + merge + block + cen <= 13_500_000:
                return rt, seg
    return None


@partial(jax.jit, static_argnames=("k", "row_tile", "seg"))
def cellgrid_extract_pallas(cen_t, planes, k, row_tile, seg):
    """K-nearest among each row's own candidate planes.

    cen_t: (3, num) f32 centers (num a multiple of row_tile); planes:
    (4, num, Lp) f32 — per row the planes [x, y, z, idx] of its gathered
    cell-grid neighborhood, empty slots parked at +inf/-1, Lp a multiple
    of `seg`. Returns (dist (num, k), idx_f (num, k)) — idx as float
    (exact below 2^24), -1 where fewer than k candidates exist.
    """
    num = cen_t.shape[1]
    lp = planes.shape[2]
    n_tiles = num // row_tile
    n_seg = lp // seg
    out_spec = pl.BlockSpec(
        (1, row_tile, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    dist, idxf = pl.pallas_call(
        _make_cg_kernel(row_tile, seg, n_seg, k),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                cen_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (4, row_tile, lp), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[pltpu.VMEM((row_tile, seg), jnp.float32)],
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, row_tile, k), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, row_tile, k), jnp.float32),
        ),
    )(cen_t, planes)
    return dist.reshape(-1, k), idxf.reshape(-1, k)


def voronoi_topk_pallas(
    centers: jnp.ndarray,
    ext: jnp.ndarray,
    k_search: int,
    row_block: int,
    win: int,
    seg: int = 768,
):
    """K-nearest mirrored candidates, contract-identical to
    voronoi_device._windowed_topk: returns (dist (num, K), idx (num, K)
    into ext, valid (num, K), covered (num,)).

    centers (num, 3) and ext (P4, 3) live in open space (the mirror
    construction already encodes the boundary). `win` lanes of the
    z-sorted candidate array are scanned per center tile in `seg`-lane
    segments; `win` is clamped to a seg multiple covering at most the
    whole (sentinel-padded) set.
    """
    num = centers.shape[0]
    p4 = ext.shape[0]
    orde = jnp.argsort(ext[:, 2])
    exts = ext[orde].astype(jnp.float32)
    p4_pad = -(-p4 // 128) * 128
    if p4_pad > p4:
        exts = jnp.concatenate(
            [exts, jnp.full((p4_pad - p4, 3), jnp.inf, jnp.float32)], axis=0
        )
    ez = exts[: , 2]

    ordc = jnp.argsort(centers[:, 2])
    cs = centers[ordc].astype(jnp.float32)
    pad = (-num) % row_block
    if pad:
        cs = jnp.concatenate([cs, jnp.repeat(cs[-1:], pad, axis=0)], axis=0)
    n_tiles = cs.shape[0] // row_block

    win = min(-(-win // seg) * seg, (p4_pad // seg) * seg)
    # per-tile window start centered on the tile's median z (the sentinel
    # tail sorts last, so clipping to p4_pad - win keeps sentinels only
    # where no real candidates remain)
    z_mid = cs[:, 2].reshape(n_tiles, row_block)[:, row_block // 2]
    starts = jnp.clip(
        jnp.searchsorted(ez[:p4], z_mid) - win // 2, 0, p4_pad - win
    )
    starts = ((starts // 128)).astype(jnp.int32)

    dist, idxf = _topk_pallas(
        jnp.transpose(cs), jnp.transpose(exts), starts, k_search,
        row_block, win, seg,
    )
    dist = dist[:num]
    idxf = idxf[:num]
    slot_ok = (idxf >= 0.0) & jnp.isfinite(dist)
    pos = jnp.where(slot_ok, idxf, 0.0).astype(jnp.int32)
    gidx = orde[jnp.clip(pos, 0, p4 - 1)].astype(jnp.int32)
    d_far = dist[:, -1]
    d_far = jnp.where(jnp.isfinite(d_far), d_far, 0.0)

    # per-row coverage certificate, in sorted-center order (rows of `dist`
    # correspond to rows of `cs`): the window's z extent must reach at
    # least d_K beyond the center on each side, or hit the array end.
    # Sentinel lanes carry z=+inf, so a window ending in sentinels counts
    # as reaching the real end.
    start_lane = starts.astype(jnp.int32)[:, None] * 128  # (n_tiles, 1)
    start_rows = jnp.repeat(start_lane, row_block, axis=1).reshape(-1)[:num]
    z_lo = ez[start_rows]
    hi_pos = start_rows + win - 1
    z_hi = ez[hi_pos]
    cz = cs[:num, 2]
    covered = (
        ((cz - z_lo >= d_far) | (start_rows == 0))
        & ((z_hi - cz >= d_far) | (hi_pos >= p4 - 1))
        & jnp.all(slot_ok, axis=-1)
    )

    # scatter back to the original center order
    inv = jnp.zeros(num, jnp.int32).at[ordc].set(jnp.arange(num, dtype=jnp.int32))
    return dist[inv], gidx[inv], slot_ok[inv], covered[inv]
