"""Pallas TPU kernel: fused LSI (Shiratani-Sasai local structure index).

Replaces the LSI hot path (`getLSI` water_properties.py:252-311 over f2py
`nearneighbors`/`lsidists` waterlib.f90:710-743/:900-918): one z-slab sweep
per row tile extracts the 24 nearest candidates in the (low, high + 3.7]
shell as SORTED minimum-image distances, tracks each candidate's raw
(non-imaged) squared distance for the reference's next-shell argmin quirk,
and evaluates the gap variance in-register.

Semantics match order.lsi.lsi(sub, pos, box, low, high, k=24) exactly:
- in-shell members = ascending-distance prefix with dist <= high;
- the next-shell neighbor minimizes the RAW distance (wp:289-291) among the
  k-nearest-by-imaged-distance candidates beyond high;
- valid requires >= 2 in-shell neighbors and >= 1 next-shell candidate.

Exactness certified by `covered` (window held every candidate within
high + 3.7 at the drift-inflated margin).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from waterorderlib_tpu.ops.pallas.slab import (
    extract_k_min,
    slab_prep_traj,
    unsort_frames,
)

K = 24


def _make_kernel(pad: int):
    def kernel(scalars_ref, boxes_ref, starts_ref, ext_t_ref, raw_t_ref,
               lsi_ref, valid_ref, cnt_ref, dsq_ref):
        f = pl.program_id(0)
        i = pl.program_id(1)
        r = cnt_ref.shape[2]
        w = dsq_ref.shape[1]
        low_sq = scalars_ref[1]
        high = scalars_ref[2]          # in-shell cutoff (not squared)
        outer_sq = scalars_ref[3]      # (high + 3.7)^2
        bx, by, bz = boxes_ref[f, 0], boxes_ref[f, 1], boxes_ref[f, 2]

        row0 = pad + i * r
        start = starts_ref[i] * 128

        def mi(d, box_l):
            d = jnp.where(d > box_l * 0.5, d - box_l, d)
            return jnp.where(d < -box_l * 0.5, d + box_l, d)

        xs = ext_t_ref[0, 0, pl.ds(start, w)].reshape(1, w)
        ys = ext_t_ref[0, 1, pl.ds(start, w)].reshape(1, w)
        zs = ext_t_ref[0, 2, pl.ds(start, w)].reshape(1, w)
        xr = ext_t_ref[0, 0, pl.ds(row0, r)].reshape(r, 1)
        yr = ext_t_ref[0, 1, pl.ds(row0, r)].reshape(r, 1)
        zr = ext_t_ref[0, 2, pl.ds(row0, r)].reshape(r, 1)
        # raw (stored, non-imaged) coordinates for the next-shell pick quirk
        rxs = raw_t_ref[0, 0, pl.ds(start, w)].reshape(1, w)
        rys = raw_t_ref[0, 1, pl.ds(start, w)].reshape(1, w)
        rzs = raw_t_ref[0, 2, pl.ds(start, w)].reshape(1, w)
        rxr = raw_t_ref[0, 0, pl.ds(row0, r)].reshape(r, 1)
        ryr = raw_t_ref[0, 1, pl.ds(row0, r)].reshape(r, 1)
        rzr = raw_t_ref[0, 2, pl.ds(row0, r)].reshape(r, 1)

        dx = mi(xs - xr, bx)
        dy = mi(ys - yr, by)
        dz = mi(zs - zr, bz)
        dsq = dx * dx + dy * dy + dz * dz
        col = jax.lax.broadcasted_iota(jnp.int32, (r, w), 1)
        valid = (dsq > low_sq) & (dsq <= outer_sq)
        dsq_ref[:] = jnp.where(valid, dsq, jnp.inf)

        # sorted imaged distances + each candidate's raw (non-imaged)
        # squared distance, the quantity the next-shell argmin selects on.
        # The raw distance matrix is formed ONCE and extracted as a single
        # payload: one-hot extraction returns the (r, w) entry bit-exactly,
        # so this equals computing the square from three extracted
        # coordinates (the previous form) while carrying one payload
        # instead of three — fewer live (r, w) temps per unrolled round
        # and ~2 fewer multiply-sums per round.
        rawdsq = (rxs - rxr) ** 2 + (rys - ryr) ** 2 + (rzs - rzr) ** 2
        mins, (rawj,), fin = extract_k_min(dsq_ref, col, [rawdsq], K)
        dists = [jnp.sqrt(mins[j]) for j in range(K)]
        rawsqs = [jnp.where(fin[j], rawj[j], jnp.inf) for j in range(K)]

        var, okrow, n_near = lsi_epilogue(dists, rawsqs, fin, high, r)
        lsi_ref[0, pl.ds(i, 1), :] = jnp.where(okrow, var, 0.0).reshape(1, r)
        valid_ref[0, pl.ds(i, 1), :] = okrow.astype(jnp.float32).reshape(1, r)
        cnt_ref[0, pl.ds(i, 1), :] = jnp.where(okrow, n_near, 0.0).reshape(1, r)

    return kernel


def lsi_epilogue(dists, rawsqs, fin, high, r):
    """Gap variance over the sorted in-shell prefix + next-shell pick, from
    K sorted candidate slots. dists/rawsqs/fin: K-lists of (r, 1) arrays.
    Returns (var, okrow, n_near) as (r, 1) arrays. Shared by the monolithic
    and window-chunked LSI kernels so their semantics cannot drift."""
    near = [fin[j] & (dists[j] <= high) for j in range(len(dists))]
    n_near = sum(nj.astype(jnp.float32) for nj in near)  # (r, 1)
    # next-shell pick: min RAW distance among candidates beyond high
    best_raw = jnp.full((r, 1), jnp.inf, jnp.float32)
    next_dist = jnp.zeros((r, 1), jnp.float32)
    has_next = jnp.zeros((r, 1), jnp.bool_)
    for j in range(len(dists)):
        isnext = fin[j] & (dists[j] > high)
        better = isnext & (rawsqs[j] < best_raw)
        best_raw = jnp.where(better, rawsqs[j], best_raw)
        next_dist = jnp.where(better, dists[j], next_dist)
        has_next = has_next | isnext
    # last in-shell distance: the (n_near - 1)-th sorted entry
    idxf = jnp.maximum(n_near - 1.0, 0.0)
    last_near = jnp.zeros((r, 1), jnp.float32)
    for j in range(len(dists)):
        last_near = jnp.where(idxf == float(j), dists[j], last_near)
    final_gap = next_dist - last_near

    denom = jnp.maximum(n_near, 1.0)
    sum_gaps = final_gap
    for j in range(len(dists) - 1):
        inner_ok = (float(j) < n_near - 1.0) & jnp.isfinite(dists[j + 1])
        sum_gaps = sum_gaps + jnp.where(inner_ok, dists[j + 1] - dists[j], 0.0)
    mean = sum_gaps / denom
    var = (final_gap - mean) ** 2
    for j in range(len(dists) - 1):
        inner_ok = (float(j) < n_near - 1.0) & jnp.isfinite(dists[j + 1])
        var = var + jnp.where(inner_ok, (dists[j + 1] - dists[j] - mean) ** 2, 0.0)
    var = var / denom
    okrow = (n_near > 1.0) & has_next
    return var, okrow, n_near


@partial(jax.jit, static_argnames=("row_tile", "window", "pad", "unsort"))
def lsi_traj(
    pos: jnp.ndarray,
    boxes: jnp.ndarray,
    low_cut: float = 0.0,
    high_cut: float = 3.7,
    row_tile: int = 128,
    window: int = 2048,
    pad: int = 512,
    unsort: bool = True,
):
    """LSI for a whole trajectory in one kernel launch.

    pos: (F, N, 3); boxes: (F, 3). Returns (lsi (F, N), valid (F, N) bool,
    count (F, N), covered (F,)). Matches order.lsi.lsi(p, p, b, low, high,
    k=24) per frame wherever covered."""
    F, n = pos.shape[0], pos.shape[1]
    margin = high_cut + 3.7
    prep = slab_prep_traj(pos, boxes, margin, row_tile, window, pad)
    # raw (stored) coordinates in the same sorted/extended layout; boundary
    # copies keep the ORIGINAL coordinates (the reference's raw distance
    # uses stored positions, wp:289-291)
    raw_sp = pos[:, prep.order0, :]
    raw_ext = jnp.concatenate(
        [raw_sp[:, -pad:, :], raw_sp, raw_sp[:, :pad, :]], axis=1
    )
    raw_t = jnp.transpose(raw_ext, (0, 2, 1)).astype(jnp.float32)

    scalars = jnp.stack(
        [jnp.float32(n), jnp.asarray(low_cut * low_cut, jnp.float32),
         jnp.asarray(high_cut, jnp.float32),
         jnp.asarray((high_cut + 3.7) ** 2, jnp.float32)]
    )
    out_spec = pl.BlockSpec(
        (1, prep.n_tiles, row_tile), lambda f, i, s1, s2, s3: (f, 0, 0),
        memory_space=pltpu.VMEM,
    )
    lsi_v, valid, cnt = pl.pallas_call(
        _make_kernel(pad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(F, prep.n_tiles),
            in_specs=[
                pl.BlockSpec(
                    (1, 3, prep.ext_t.shape[2]), lambda f, i, s1, s2, s3: (f, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 3, prep.ext_t.shape[2]), lambda f, i, s1, s2, s3: (f, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=(out_spec, out_spec, out_spec),
            scratch_shapes=[pltpu.VMEM((row_tile, prep.w), jnp.float32)],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((F, prep.n_tiles, row_tile), jnp.float32),
            jax.ShapeDtypeStruct((F, prep.n_tiles, row_tile), jnp.float32),
            jax.ShapeDtypeStruct((F, prep.n_tiles, row_tile), jnp.float32),
        ),
    )(scalars, boxes.astype(jnp.float32), prep.starts, prep.ext_t, raw_t)

    lsi_v = lsi_v.reshape(F, -1)[:, :n]
    valid = valid.reshape(F, -1)[:, :n] > 0
    cnt = cnt.reshape(F, -1)[:, :n]
    if unsort:
        lsi_v = unsort_frames(lsi_v, prep.order0)
        valid = unsort_frames(valid, prep.order0)
        cnt = unsort_frames(cnt, prep.order0)
    return lsi_v, valid, cnt, prep.covered
