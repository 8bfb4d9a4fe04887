"""Window-chunked LSI kernel for huge systems.

Carried-top-K extension (see qtet_chunked.py for the exactness argument) of
the monolithic LSI kernel (lsi_kernel.py; reference hot path `getLSI`
water_properties.py:252-311 + `lsiDists` waterlib.f90:900-918). The carry
holds, per row, the K=24 smallest imaged squared distances AND each
candidate's raw (non-imaged) squared distance — the quantity the
reference's next-shell argmin quirk selects on — so the shared
`lsi_epilogue` evaluates the gap variance from the final carry exactly as
the monolithic kernel does. Bit-identical results for the same window;
VMEM holds a (row_tile, SEG) scratch instead of (row_tile, window), whose
~9.5x Mosaic stack caps the monolithic kernel near ~25k atoms.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from waterorderlib_tpu.ops.pallas.lsi_kernel import K, lsi_epilogue
from waterorderlib_tpu.ops.pallas.slab import (
    extract_k_min,
    merge_k_min,
    slab_prep_traj,
    unsort_frames,
)


def _make_kernel(pad: int, seg: int, n_seg: int):
    def kernel(scalars_ref, boxes_ref, starts_ref, ext_t_ref, raw_t_ref,
               lsi_ref, valid_ref, cnt_ref, dsq_ref):
        f = pl.program_id(0)
        i = pl.program_id(1)
        r = cnt_ref.shape[2]
        low_sq = scalars_ref[1]
        high = scalars_ref[2]
        outer_sq = scalars_ref[3]
        bx, by, bz = boxes_ref[f, 0], boxes_ref[f, 1], boxes_ref[f, 2]

        row0 = pad + i * r
        start = starts_ref[i] * 128

        def mi(d, box_l):
            d = jnp.where(d > box_l * 0.5, d - box_l, d)
            return jnp.where(d < -box_l * 0.5, d + box_l, d)

        xr = ext_t_ref[0, 0, pl.ds(row0, r)].reshape(r, 1)
        yr = ext_t_ref[0, 1, pl.ds(row0, r)].reshape(r, 1)
        zr = ext_t_ref[0, 2, pl.ds(row0, r)].reshape(r, 1)
        rxr = raw_t_ref[0, 0, pl.ds(row0, r)].reshape(r, 1)
        ryr = raw_t_ref[0, 1, pl.ds(row0, r)].reshape(r, 1)
        rzr = raw_t_ref[0, 2, pl.ds(row0, r)].reshape(r, 1)

        col = jax.lax.broadcasted_iota(jnp.int32, (r, seg), 1)

        def segment(s, carry):
            cd, craw = carry
            seg_start = pl.multiple_of(start + s * seg, 128)
            xs = ext_t_ref[0, 0, pl.ds(seg_start, seg)].reshape(1, seg)
            ys = ext_t_ref[0, 1, pl.ds(seg_start, seg)].reshape(1, seg)
            zs = ext_t_ref[0, 2, pl.ds(seg_start, seg)].reshape(1, seg)
            rxs = raw_t_ref[0, 0, pl.ds(seg_start, seg)].reshape(1, seg)
            rys = raw_t_ref[0, 1, pl.ds(seg_start, seg)].reshape(1, seg)
            rzs = raw_t_ref[0, 2, pl.ds(seg_start, seg)].reshape(1, seg)
            dx = mi(xs - xr, bx)
            dy = mi(ys - yr, by)
            dz = mi(zs - zr, bz)
            dsq = dx * dx + dy * dy + dz * dz
            valid = (dsq > low_sq) & (dsq <= outer_sq)
            dsq_ref[:] = jnp.where(valid, dsq, jnp.inf)

            # per-round raw squared distance of the extracted candidate,
            # the quantity the reference's next-shell argmin selects on
            nd, (rxjs, ryjs, rzjs), oks = extract_k_min(
                dsq_ref, col, [rxs, rys, rzs], K
            )
            nraw = [
                jnp.where(
                    oks[j],
                    (rxjs[j] - rxr) ** 2 + (ryjs[j] - ryr) ** 2 + (rzjs[j] - rzr) ** 2,
                    jnp.inf,
                )
                for j in range(K)
            ]
            kd, (kraw,) = merge_k_min(
                jnp.concatenate([cd] + nd, axis=1),
                [jnp.concatenate([craw] + nraw, axis=1)],
                K,
                invalids=[jnp.inf],
            )
            return kd, kraw

        init = (
            jnp.full((r, K), jnp.inf, jnp.float32),
            jnp.full((r, K), jnp.inf, jnp.float32),
        )
        cd, craw = jax.lax.fori_loop(0, n_seg, segment, init)

        dists = [jnp.sqrt(cd[:, j : j + 1]) for j in range(K)]
        rawsqs = [craw[:, j : j + 1] for j in range(K)]
        fin = [jnp.isfinite(cd[:, j : j + 1]) for j in range(K)]

        var, okrow, n_near = lsi_epilogue(dists, rawsqs, fin, high, r)
        lsi_ref[0, pl.ds(i, 1), :] = jnp.where(okrow, var, 0.0).reshape(1, r)
        valid_ref[0, pl.ds(i, 1), :] = okrow.astype(jnp.float32).reshape(1, r)
        cnt_ref[0, pl.ds(i, 1), :] = jnp.where(okrow, n_near, 0.0).reshape(1, r)

    return kernel


@partial(jax.jit, static_argnames=("row_tile", "window", "pad", "seg", "unsort"))
def lsi_traj_chunked(
    pos: jnp.ndarray,
    boxes: jnp.ndarray,
    low_cut: float = 0.0,
    high_cut: float = 3.7,
    row_tile: int = 128,
    window: int = 6144,
    pad: int = 512,
    seg: int = 1536,
    unsort: bool = True,
):
    """Contract matches lsi_kernel.lsi_traj: returns (lsi (F, N),
    valid (F, N) bool, count (F, N), covered (F,))."""
    F, n = pos.shape[0], pos.shape[1]
    window = -(-window // seg) * seg
    margin = high_cut + 3.7
    prep = slab_prep_traj(pos, boxes, margin, row_tile, window, pad)
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
    n_seg = window // seg
    out_spec = pl.BlockSpec(
        (1, prep.n_tiles, row_tile), lambda f, i, s1, s2, s3: (f, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_spec = pl.BlockSpec(
        (1, 3, prep.ext_t.shape[2]), lambda f, i, s1, s2, s3: (f, 0, 0),
        memory_space=pltpu.VMEM,
    )
    lsi_v, valid, cnt = pl.pallas_call(
        _make_kernel(pad, seg, n_seg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(F, prep.n_tiles),
            in_specs=[in_spec, in_spec],
            out_specs=(out_spec, out_spec, out_spec),
            scratch_shapes=[pltpu.VMEM((row_tile, seg), jnp.float32)],
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
