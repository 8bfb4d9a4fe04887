"""Slab-pruned Pallas q_tet kernel: z-sorted atoms, contiguous column windows.

The brute-force kernel (qtet_kernel.py) sweeps all N columns per row tile —
16.7M pair evaluations for N = 4096 even though only the 4 nearest neighbors
(within ~4 A) matter. Here the frame is sorted by z once (XLA argsort), the
sorted array is extended with wrapped copies of the boundary slabs so PBC
neighbors stay contiguous, and each 128-row tile only scans the W ~ 1280
columns whose z lies within `margin` of the tile — a ~3x reduction in pair
work that keeps every memory access contiguous (the TPU-friendly alternative
to cell lists, whose gather patterns don't map to the VPU).

Correctness contract: exact equality with the brute kernel whenever every
atom's 4th-nearest neighbor lies within `margin` (always true for condensed
phases; margin defaults to 4.5 A vs the ~3.4 A 4-NN distance of water). Two
validity signals are returned so callers can verify instead of trust:
per-atom `ok` (4 neighbors found, 4th distance <= margin — these q values
are exact) and the per-frame window-coverage check done during preparation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_sorted_kernel(pad: int):
    """pad must be a static python int (it feeds lane-aligned slices)."""

    def kernel(scalars_ref, boxes_ref, starts_ref, ext_t_ref, out_ref, ok_ref,
               dx_ref, dy_ref, dz_ref, dsq_ref):
        f = pl.program_id(0)
        i = pl.program_id(1)
        r = dx_ref.shape[0]
        w = dx_ref.shape[1]
        low_sq = scalars_ref[1]
        high_sq = scalars_ref[2]
        margin_sq = scalars_ref[4]
        bx, by, bz = boxes_ref[f, 0], boxes_ref[f, 1], boxes_ref[f, 2]

        row0 = pad + i * r
        # starts are stored pre-divided by 128 so the product is provably
        # lane-aligned for Mosaic
        start = starts_ref[f, i] * 128

        def mi(d, box_l):
            # coordinates are pre-wrapped into [0, L); two compare-selects
            # replace round()
            d = jnp.where(d > box_l * 0.5, d - box_l, d)
            d = jnp.where(d < -box_l * 0.5, d + box_l, d)
            return d

        xs = ext_t_ref[0, 0, pl.ds(start, w)].reshape(1, w)
        ys = ext_t_ref[0, 1, pl.ds(start, w)].reshape(1, w)
        zs = ext_t_ref[0, 2, pl.ds(start, w)].reshape(1, w)
        xr = ext_t_ref[0, 0, pl.ds(row0, r)].reshape(r, 1)
        yr = ext_t_ref[0, 1, pl.ds(row0, r)].reshape(r, 1)
        zr = ext_t_ref[0, 2, pl.ds(row0, r)].reshape(r, 1)

        dx = mi(xs - xr, bx)
        dy = mi(ys - yr, by)
        dz = mi(zs - zr, bz)
        dsq = dx * dx + dy * dy + dz * dz
        # (low, high] shell; dsq > low_sq with low 0 drops the self pair
        valid = (dsq > low_sq) & (dsq <= high_sq)
        count = jnp.sum(valid.astype(jnp.float32), axis=1, keepdims=True)

        dx_ref[:] = dx
        dy_ref[:] = dy
        dz_ref[:] = dz
        dsq_ref[:] = jnp.where(valid, dsq, jnp.inf)

        col = jax.lax.broadcasted_iota(jnp.int32, (r, w), 1)
        big = jnp.int32(w)
        units = []
        oks = []
        last_d = None
        for _ in range(4):
            d = dsq_ref[:]
            m = jnp.min(d, axis=1, keepdims=True)
            eq = (d == m) & jnp.isfinite(d)
            fc = jnp.min(jnp.where(eq, col, big), axis=1, keepdims=True)
            first = eq & (col == fc)
            wgt = first.astype(jnp.float32)
            vx = jnp.sum(wgt * dx_ref[:], axis=1, keepdims=True)
            vy = jnp.sum(wgt * dy_ref[:], axis=1, keepdims=True)
            vz = jnp.sum(wgt * dz_ref[:], axis=1, keepdims=True)
            ok = jnp.sum(wgt, axis=1, keepdims=True) > 0
            nrm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
            inv = jnp.where(nrm > 0, 1.0 / jnp.where(nrm > 0, nrm, 1.0), 0.0)
            units.append((vx * inv, vy * inv, vz * inv))
            oks.append(ok)
            last_d = jnp.where(jnp.isfinite(m), m, jnp.inf)
            dsq_ref[:] = jnp.where(first, jnp.inf, d)

        ssum = jnp.zeros((r, 1), jnp.float32)
        for a in range(4):
            for b in range(a + 1, 4):
                ca, cb = units[a], units[b]
                cosv = ca[0] * cb[0] + ca[1] * cb[1] + ca[2] * cb[2]
                pair_ok = oks[a] & oks[b]
                cosv = jnp.where(pair_ok, jnp.clip(cosv, -1.0, 1.0), -1.0)
                ssum = ssum + (cosv + 1.0 / 3.0) ** 2
        q = 1.0 - 0.375 * ssum
        q = jnp.where(count > 0, q, 0.0)
        out_ref[0, pl.ds(i, 1), :] = q.reshape(1, r)
        # exact iff all 4 slots filled and the 4th-nearest lies within margin
        exact = oks[3] & (last_d <= margin_sq)
        ok_ref[0, pl.ds(i, 1), :] = exact.astype(jnp.float32).reshape(1, r)

    return kernel


@partial(jax.jit, static_argnames=("row_tile", "window", "pad", "unsort"))
def order_param_q_pallas_sorted(
    pos: jnp.ndarray,
    boxes: jnp.ndarray,
    low_cut: float = 0.0,
    high_cut: float = 10.0,
    margin: float = 4.5,
    row_tile: int = 128,
    window: int = 1280,
    pad: int = 512,
    unsort: bool = True,
):
    """Slab-pruned q for a whole trajectory.

    pos: (F, N, 3); boxes: (F, 3) orthorhombic edges. Returns
    (q (F, N) in the ORIGINAL atom order, ok (F, N) bool, covered (F,) bool).
    q[i] is exact wherever ok[i]; `covered[f]` additionally certifies every
    tile's window held all of its slab candidates.
    """
    F, n = pos.shape[0], pos.shape[1]
    n_pad_rows = -(-n // row_tile) * row_tile
    n_tiles = n_pad_rows // row_tile
    L = boxes[:, 2][:, None]  # (F, 1) z edge

    wrapped = jnp.mod(pos, boxes[:, None, :])
    z = wrapped[..., 2]
    order = jnp.argsort(z, axis=1)  # (F, N)
    sp = jnp.take_along_axis(wrapped, order[..., None], axis=1)  # (F, N, 3)
    zs = jnp.take_along_axis(z, order, axis=1)

    z_shift = jnp.concatenate(
        [jnp.zeros((F, pad, 2), sp.dtype), L[:, :, None] * jnp.ones((F, pad, 1), sp.dtype)],
        axis=-1,
    )
    top = sp[:, -pad:, :] - z_shift  # z near L shifted below 0
    bot = sp[:, :pad, :] + z_shift  # z near 0 shifted above L
    ext = jnp.concatenate([top, sp, bot], axis=1)  # (F, N + 2*pad, 3)
    # row tiles run over [pad, pad + n_pad_rows); any overhang past the real
    # atoms lands in the bottom boundary copy (computed, then discarded)
    if n_pad_rows - n > pad:
        raise ValueError("row_tile remainder exceeds the boundary pad")
    ext_z = ext[..., 2]
    n_ext = ext.shape[1]
    # the window must never exceed N sorted atoms: a wider window can hold an
    # atom AND its periodic boundary copy, double-counting that neighbor
    w = min(window, n_ext, (n // 128) * 128)

    # per-tile window starts (left edge of the slab) + coverage check
    tile_first = jnp.arange(n_tiles) * row_tile
    tile_last = jnp.minimum(tile_first + row_tile - 1, n - 1)
    z_lo = jnp.take_along_axis(
        zs, jnp.broadcast_to(tile_first[None, :], (F, n_tiles)), axis=1
    ) - margin
    z_hi = jnp.take_along_axis(
        zs, jnp.broadcast_to(tile_last[None, :], (F, n_tiles)), axis=1
    ) + margin
    starts = jax.vmap(lambda ez, lo: jnp.searchsorted(ez, lo, side="left"))(ext_z, z_lo)
    ends = jax.vmap(lambda ez, hi: jnp.searchsorted(ez, hi, side="right"))(ext_z, z_hi)
    # Mosaic needs lane-dim slice starts provably 128-aligned: round down
    # (window only grows leftward) and store pre-divided by 128
    starts = (starts // 128) * 128
    starts = jnp.clip(starts, 0, n_ext - w)
    covered = jnp.all(ends - starts <= w, axis=1)
    starts = (starts // 128).astype(jnp.int32)

    ext_t = jnp.transpose(ext, (0, 2, 1)).astype(jnp.float32)
    # jnp.stack (not np.float32): low/high/margin may be tracers under an
    # outer jit
    scalars = jnp.stack(
        [jnp.float32(n), jnp.asarray(low_cut * low_cut, jnp.float32),
         jnp.asarray(high_cut * high_cut, jnp.float32), jnp.float32(pad),
         jnp.asarray(margin * margin, jnp.float32)],
    )

    out, ok = pl.pallas_call(
        _make_sorted_kernel(pad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(F, n_tiles),
            in_specs=[
                pl.BlockSpec(
                    (1, 3, n_ext), lambda f, i, s1, s2, s3: (f, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=(
                pl.BlockSpec(
                    (1, n_tiles, row_tile), lambda f, i, s1, s2, s3: (f, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, n_tiles, row_tile), lambda f, i, s1, s2, s3: (f, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            scratch_shapes=[pltpu.VMEM((row_tile, w), jnp.float32)] * 4,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((F, n_tiles, row_tile), jnp.float32),
            jax.ShapeDtypeStruct((F, n_tiles, row_tile), jnp.float32),
        ),
    )(scalars, boxes.astype(jnp.float32), starts, ext_t)

    q_sorted = out.reshape(F, -1)[:, :n]
    ok_sorted = ok.reshape(F, -1)[:, :n] > 0
    if not unsort:
        # order-invariant consumers (histograms, means) can skip the
        # scatter back to original atom order
        return q_sorted, ok_sorted, covered
    q_orig = jax.vmap(lambda idx, src: jnp.zeros_like(src).at[idx].set(src))(order, q_sorted)
    ok_orig = jax.vmap(lambda idx, src: jnp.zeros_like(src).at[idx].set(src))(order, ok_sorted)
    return q_orig, ok_orig, covered


def suggest_window(n: int, box_z: float, margin: float = 4.5, row_tile: int = 128,
                   safety: float = 1.35) -> int:
    """Window width (multiple of 128) expected to cover a tile's slab:
    atoms within (tile z-extent + 2*margin) of the tile, times a safety
    factor for density fluctuations. Check the `covered` output and retry
    larger if it ever comes back False."""
    tile_extent = row_tile / n * box_z
    slab = tile_extent + 2.0 * margin
    est = n * slab / box_z * safety + 256  # + alignment slack
    return int(-(-est // 128) * 128)


@partial(jax.jit, static_argnames=("row_tile", "window", "pad", "unsort"))
def order_param_q_pallas_traj(
    pos: jnp.ndarray,
    boxes: jnp.ndarray,
    low_cut: float = 0.0,
    high_cut: float = 10.0,
    margin: float = 4.5,
    row_tile: int = 128,
    window: int = 1536,
    pad: int = 512,
    unsort: bool = True,
):
    """Trajectory variant with a persistent frame-0 z-ordering.

    For MD trajectories atoms drift slowly, so the frame-0 sort order stays
    approximately z-sorted for every frame. This removes the per-frame
    argsort/searchsorted prep: one ordering, one gather, and frame-0 window
    starts whose margin is inflated by twice the measured maximum z-drift
    (a candidate within `margin` of a row atom at frame t lies within
    margin + 2*drift of the frame-0 z coordinates, which ARE sorted).

    Exactness is still *certified*, not assumed: the per-atom `ok` flag
    tests the actual 4th-neighbor distance against `margin`, and `covered`
    checks window coverage at the inflated margin. Returns
    (q (F, N), ok (F, N), covered (F,)).
    """
    F, n = pos.shape[0], pos.shape[1]
    n_pad_rows = -(-n // row_tile) * row_tile
    n_tiles = n_pad_rows // row_tile
    L = boxes[:, 2][:, None]

    wrapped = jnp.mod(pos, boxes[:, None, :])
    z0 = wrapped[0, :, 2]
    order0 = jnp.argsort(z0)  # one sort for the whole trajectory
    sp = wrapped[:, order0, :]  # (F, N, 3)
    zs = sp[..., 2]
    drift = jnp.max(jnp.abs(zs - zs[0:1]))  # max |z_t - z_0| over atoms
    margin_eff = margin + 2.0 * drift

    z_shift = jnp.concatenate(
        [jnp.zeros((F, pad, 2), sp.dtype), L[:, :, None] * jnp.ones((F, pad, 1), sp.dtype)],
        axis=-1,
    )
    ext = jnp.concatenate([sp[:, -pad:, :] - z_shift, sp, sp[:, :pad, :] + z_shift], axis=1)
    if n_pad_rows - n > pad:
        raise ValueError("row_tile remainder exceeds the boundary pad")
    n_ext = ext.shape[1]
    w = min(window, n_ext, (n // 128) * 128)

    # frame-0 extended z (truly sorted) drives all window starts
    ext_z0 = ext[0, :, 2]
    tile_first = jnp.arange(n_tiles) * row_tile
    tile_last = jnp.minimum(tile_first + row_tile - 1, n - 1)
    z_lo = zs[0][tile_first] - margin_eff
    z_hi = zs[0][tile_last] + margin_eff
    starts = jnp.searchsorted(ext_z0, z_lo, side="left")
    ends = jnp.searchsorted(ext_z0, z_hi, side="right")
    starts = (starts // 128) * 128
    starts = jnp.clip(starts, 0, n_ext - w)
    covered_all = jnp.all(ends - starts <= w)
    covered = jnp.broadcast_to(covered_all, (F,))
    starts_f = jnp.broadcast_to(((starts // 128).astype(jnp.int32))[None, :], (F, n_tiles))

    ext_t = jnp.transpose(ext, (0, 2, 1)).astype(jnp.float32)
    # jnp.stack (not np.float32): low/high/margin may be tracers under an
    # outer jit
    scalars = jnp.stack(
        [jnp.float32(n), jnp.asarray(low_cut * low_cut, jnp.float32),
         jnp.asarray(high_cut * high_cut, jnp.float32), jnp.float32(pad),
         jnp.asarray(margin * margin, jnp.float32)],
    )
    out, ok = pl.pallas_call(
        _make_sorted_kernel(pad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(F, n_tiles),
            in_specs=[
                pl.BlockSpec(
                    (1, 3, n_ext), lambda f, i, s1, s2, s3: (f, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=(
                pl.BlockSpec(
                    (1, n_tiles, row_tile), lambda f, i, s1, s2, s3: (f, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, n_tiles, row_tile), lambda f, i, s1, s2, s3: (f, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            scratch_shapes=[pltpu.VMEM((row_tile, w), jnp.float32)] * 4,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((F, n_tiles, row_tile), jnp.float32),
            jax.ShapeDtypeStruct((F, n_tiles, row_tile), jnp.float32),
        ),
    )(scalars, boxes.astype(jnp.float32), starts_f, ext_t)

    q_sorted = out.reshape(F, -1)[:, :n]
    ok_sorted = ok.reshape(F, -1)[:, :n] > 0
    if not unsort:
        return q_sorted, ok_sorted, covered
    q_orig = jax.vmap(lambda src: jnp.zeros_like(src).at[order0].set(src))(q_sorted)
    ok_orig = jax.vmap(lambda src: jnp.zeros_like(src).at[order0].set(src))(ok_sorted)
    return q_orig, ok_orig, covered
