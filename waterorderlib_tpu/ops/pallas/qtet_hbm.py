"""q_tet Pallas kernel v4: HBM-resident coordinates for million-atom frames.

The window-chunked kernel (qtet_chunked.py) still holds the full extended
coordinate array in VMEM (~12.5 MB at 1M atoms — the single-chip ceiling
recorded in PERF.md). This variant leaves the coordinates in HBM
(`memory_space=ANY`) and DMAs what each grid step needs into VMEM scratch:
the row tile's coordinates once, and the window's SEG-column slabs
double-buffered (the DMA pipeline pattern from the Pallas guide), so the
next slab streams in while the current one is reduced. Everything else —
the carried-top-4 merge, tie-breaks, certificates — is qtet_chunked's, via
the shared slab.extract_k_min/merge_k_min helpers, and results are
bit-identical for the same window.

Same reference hot path as qtet2 (`allNearNeighbors` waterlib.f90:830-862 +
argsort-4NN + `tetraCosAng` waterlib.f90:867-895 + the q formula
water_properties.py:388).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from waterorderlib_tpu.ops.pallas.qtet2 import _scalars
from waterorderlib_tpu.ops.pallas.slab import (
    clamp_window,
    extract_k_min,
    merge_k_min,
    slab_prep_traj,
    unsort_frames,
)


def _make_kernel(pad: int, seg: int, n_seg: int):
    def kernel(scalars_ref, boxes_ref, starts_ref, ext_hbm,
               out_ref, ok_ref, rows_buf, slab_buf, dsq_ref, sems):
        f = pl.program_id(0)
        i = pl.program_id(1)
        r = out_ref.shape[2]
        low_sq = scalars_ref[1]
        high_sq = scalars_ref[2]
        margin_sq = scalars_ref[4]
        bx, by, bz = boxes_ref[f, 0], boxes_ref[f, 1], boxes_ref[f, 2]

        row0 = pad + i * r
        start = starts_ref[i] * 128

        def mi(d, box_l):
            d = jnp.where(d > box_l * 0.5, d - box_l, d)
            return jnp.where(d < -box_l * 0.5, d + box_l, d)

        def slab_dma(slot, s):
            seg_start = pl.multiple_of(start + s * seg, 128)
            return pltpu.make_async_copy(
                ext_hbm.at[pl.ds(f, 1), :, pl.ds(seg_start, seg)],
                slab_buf.at[slot],
                sems.at[slot],
            )

        # rows once + first slab, in flight together (coordinate rows are
        # padded to a full 8-sublane f32 tile so HBM slices stay tile-whole)
        row_dma = pltpu.make_async_copy(
            ext_hbm.at[pl.ds(f, 1), :, pl.ds(row0, r)], rows_buf, sems.at[2]
        )
        row_dma.start()
        slab_dma(0, 0).start()
        row_dma.wait()

        xr = rows_buf[0, 0, :].reshape(r, 1)
        yr = rows_buf[0, 1, :].reshape(r, 1)
        zr = rows_buf[0, 2, :].reshape(r, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (r, seg), 1)

        def segment(s, carry):
            cd, cx, cy, cz, count = carry
            slot = jax.lax.rem(s, 2)

            @pl.when(s + 1 < n_seg)
            def _():
                slab_dma(1 - slot, s + 1).start()

            slab_dma(slot, s).wait()
            xs = slab_buf[slot, 0, 0, :].reshape(1, seg)
            ys = slab_buf[slot, 0, 1, :].reshape(1, seg)
            zs = slab_buf[slot, 0, 2, :].reshape(1, seg)
            dx = mi(xs - xr, bx)
            dy = mi(ys - yr, by)
            dz = mi(zs - zr, bz)
            dsq = dx * dx + dy * dy + dz * dz
            valid = (dsq > low_sq) & (dsq <= high_sq)
            count = count + jnp.sum(valid.astype(jnp.float32), axis=1, keepdims=True)
            dsq_ref[:] = jnp.where(valid, dsq, jnp.inf)

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

        init = (
            jnp.full((r, 4), jnp.inf, jnp.float32),
            jnp.zeros((r, 4), jnp.float32),
            jnp.zeros((r, 4), jnp.float32),
            jnp.zeros((r, 4), jnp.float32),
            jnp.zeros((r, 1), jnp.float32),
        )
        cd, cx, cy, cz, count = jax.lax.fori_loop(0, n_seg, segment, init)

        units = []
        oks = []
        for k in range(4):
            ok = jnp.isfinite(cd[:, k : k + 1])
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
def order_param_q_traj_hbm(
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
    """Contract matches qtet_chunked.order_param_q_traj_chunked: returns
    (q (F, N), ok (F, N), covered (F,)); coordinates stay HBM-resident."""
    F, n = pos.shape[0], pos.shape[1]
    window = clamp_window(window, n, seg)
    prep = slab_prep_traj(pos, boxes, margin, row_tile, window, pad)
    scalars = _scalars(n, low_cut, high_cut, pad, margin)
    n_seg = window // seg
    # pad the coordinate-row axis 3 -> 8 so every HBM DMA slice covers whole
    # (8, 128) f32 tiles (Mosaic cannot slice partial sublane tiles in HBM)
    ext8 = jnp.pad(prep.ext_t, ((0, 0), (0, 5), (0, 0)))
    out, ok = pl.pallas_call(
        _make_kernel(pad, seg, n_seg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(F, prep.n_tiles),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),  # coordinates stay in HBM
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
            scratch_shapes=[
                pltpu.VMEM((1, 8, row_tile), jnp.float32),   # row tile coords
                pltpu.VMEM((2, 1, 8, seg), jnp.float32),     # double-buffered slabs
                pltpu.VMEM((row_tile, seg), jnp.float32),    # dsq
                pltpu.SemaphoreType.DMA((3,)),               # slab x2 + rows
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((F, prep.n_tiles, row_tile), jnp.float32),
            jax.ShapeDtypeStruct((F, prep.n_tiles, row_tile), jnp.float32),
        ),
    )(scalars, boxes.astype(jnp.float32), prep.starts, ext8)

    q_sorted = out.reshape(F, -1)[:, :n]
    ok_sorted = ok.reshape(F, -1)[:, :n] > 0
    if not unsort:
        return q_sorted, ok_sorted, prep.covered
    return (
        unsort_frames(q_sorted, prep.order0),
        unsort_frames(ok_sorted, prep.order0),
        prep.covered,
    )
