"""q_tet Pallas kernel v3: window-chunked 4-NN extraction for huge systems.

The v2 kernel (qtet2.py) holds a (row_tile, window) distance scratch in
VMEM, whose ~(2 + 0.32*K)x Mosaic stack hits the 16 MB scoped limit near
N ~ 100k atoms (window grows ~ N^(2/3) at fixed density). This variant
processes the z-slab window in fixed SEG-column segments with a carried
running top-4, so VMEM holds only (row_tile, SEG) + the (r, 4) carry and
the reachable system size is bounded by the extended coordinate array
(3 x N_ext f32 in VMEM, ~8 MB at half a million atoms), not by the window.

Exactness: the global 4 nearest of a row are each within their segment's
top-4 (at most 3 others are globally smaller), so merging per-segment
top-4s into a carried top-4 loses nothing. Tie-breaks reproduce v2's
first-column rule: segments are scanned in column order and the merge
prefers lower candidate index, with carried slots (strictly earlier
columns) ordered before the new segment's extractions.

Same reference hot path as qtet2 (`allNearNeighbors` waterlib.f90:830-862 +
argsort-4NN + `tetraCosAng` waterlib.f90:867-895 + the q formula
water_properties.py:388) and the same certificates (`ok` per atom,
`covered` per frame from slab prep).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from waterorderlib_tpu.ops.pallas.qtet2 import _scalars, suggest_window
from waterorderlib_tpu.ops.pallas.slab import (
    clamp_window,
    extract_k_min,
    merge_k_min,
    slab_prep_traj,
    unsort_frames,
)


def _make_kernel(pad: int, seg: int, n_seg: int):
    def kernel(scalars_ref, boxes_ref, starts_ref, ext_t_ref, out_ref, ok_ref, dsq_ref):
        f = pl.program_id(0)
        i = pl.program_id(1)
        r = out_ref.shape[2]
        low_sq = scalars_ref[1]
        high_sq = scalars_ref[2]
        margin_sq = scalars_ref[4]
        bx, by, bz = boxes_ref[f, 0], boxes_ref[f, 1], boxes_ref[f, 2]

        row0 = pad + i * r
        start = starts_ref[i] * 128  # pre-divided: provably lane-aligned

        def mi(d, box_l):
            d = jnp.where(d > box_l * 0.5, d - box_l, d)
            return jnp.where(d < -box_l * 0.5, d + box_l, d)

        xr = ext_t_ref[0, 0, pl.ds(row0, r)].reshape(r, 1)
        yr = ext_t_ref[0, 1, pl.ds(row0, r)].reshape(r, 1)
        zr = ext_t_ref[0, 2, pl.ds(row0, r)].reshape(r, 1)

        col = jax.lax.broadcasted_iota(jnp.int32, (r, seg), 1)
        inf4 = jnp.full((r, 4), jnp.inf, jnp.float32)
        zero4 = jnp.zeros((r, 4), jnp.float32)

        def segment(s, carry):
            cd, cx, cy, cz, count = carry
            seg_start = pl.multiple_of(start + s * seg, 128)
            xs = ext_t_ref[0, 0, pl.ds(seg_start, seg)].reshape(1, seg)
            ys = ext_t_ref[0, 1, pl.ds(seg_start, seg)].reshape(1, seg)
            zs = ext_t_ref[0, 2, pl.ds(seg_start, seg)].reshape(1, seg)
            dx = mi(xs - xr, bx)
            dy = mi(ys - yr, by)
            dz = mi(zs - zr, bz)
            dsq = dx * dx + dy * dy + dz * dz
            valid = (dsq > low_sq) & (dsq <= high_sq)
            count = count + jnp.sum(valid.astype(jnp.float32), axis=1, keepdims=True)
            dsq_ref[:] = jnp.where(valid, dsq, jnp.inf)

            # segment-local top-4, then merge with the carried 4 (carried
            # ordered first so equal distances keep v2's first-column winner)
            nd, (nx, ny, nz), _ = extract_k_min(dsq_ref, col, [xs, ys, zs], 4)
            kd, (kx, ky, kz) = merge_k_min(
                jnp.concatenate([cd] + nd, axis=1),
                [
                    jnp.concatenate([cx] + nx, axis=1),
                    jnp.concatenate([cy] + ny, axis=1),
                    jnp.concatenate([cz] + nz, axis=1),
                ],
                4,
            )
            return kd, kx, ky, kz, count

        cd, cx, cy, cz, count = jax.lax.fori_loop(
            0, n_seg, segment, (inf4, zero4, zero4, zero4, jnp.zeros((r, 1), jnp.float32))
        )

        units = []
        oks = []
        for k in range(4):
            dk = cd[:, k : k + 1]
            ok = jnp.isfinite(dk)
            vx = mi(cx[:, k : k + 1] - xr, bx)
            vy = mi(cy[:, k : k + 1] - yr, by)
            vz = mi(cz[:, k : k + 1] - zr, bz)
            nrm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
            inv = jnp.where(nrm > 0, 1.0 / jnp.where(nrm > 0, nrm, 1.0), 0.0)
            units.append((vx * inv, vy * inv, vz * inv))
            oks.append(ok)

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
        exact = oks[3] & (cd[:, 3:4] <= margin_sq)
        ok_ref[0, pl.ds(i, 1), :] = exact.astype(jnp.float32).reshape(1, r)

    return kernel


@partial(jax.jit, static_argnames=("row_tile", "window", "pad", "seg", "unsort"))
def order_param_q_traj_chunked(
    pos: jnp.ndarray,
    boxes: jnp.ndarray,
    low_cut: float = 0.0,
    high_cut: float = 10.0,
    margin: float = 4.5,
    row_tile: int = 128,
    window: int = 6144,
    pad: int = 512,
    seg: int = 1536,
    unsort: bool = True,
):
    """Slab-pruned whole-trajectory q_tet with a window-chunked carry.

    Contract matches qtet2.order_param_q_traj: returns (q (F, N), ok (F, N),
    covered (F,)) with the frame-0 persistent z-ordering. `window` is
    rounded up to a multiple of `seg`; both must be multiples of 128.
    """
    F, n = pos.shape[0], pos.shape[1]
    window = clamp_window(window, n, seg)
    prep = slab_prep_traj(pos, boxes, margin, row_tile, window, pad)
    scalars = _scalars(n, low_cut, high_cut, pad, margin)
    n_seg = window // seg
    out, ok = pl.pallas_call(
        _make_kernel(pad, seg, n_seg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(F, prep.n_tiles),
            in_specs=[
                pl.BlockSpec(
                    (1, 3, prep.ext_t.shape[2]), lambda f, i, s1, s2, s3: (f, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=(
                pl.BlockSpec(
                    (1, prep.n_tiles, row_tile), lambda f, i, s1, s2, s3: (f, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, prep.n_tiles, row_tile), lambda f, i, s1, s2, s3: (f, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            scratch_shapes=[pltpu.VMEM((row_tile, seg), jnp.float32)],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((F, prep.n_tiles, row_tile), jnp.float32),
            jax.ShapeDtypeStruct((F, prep.n_tiles, row_tile), jnp.float32),
        ),
    )(scalars, boxes.astype(jnp.float32), prep.starts, prep.ext_t)

    q_sorted = out.reshape(F, -1)[:, :n]
    ok_sorted = ok.reshape(F, -1)[:, :n] > 0
    if not unsort:
        return q_sorted, ok_sorted, prep.covered
    return (
        unsort_frames(q_sorted, prep.order0),
        unsort_frames(ok_sorted, prep.order0),
        prep.covered,
    )
