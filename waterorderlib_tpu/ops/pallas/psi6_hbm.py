"""HBM-resident psi-6 kernel for million-atom frames.

The DMA tier of psi6_chunked.py, exactly as qtet_hbm.py is the DMA tier of
qtet_chunked.py: coordinates stay in HBM (padded to a full 8-sublane tile)
and each grid step streams its row tile once plus double-buffered
SEG-column slabs, with the carried-top-24 merge running on the shared
slab.extract_k_min/merge_k_min helpers and the shared `psi6_epilogue`
evaluating | mean exp(6 i theta) |. Bit-identical to psi6_chunked for the
same window; VMEM holds only the (row_tile, SEG) scratch, the slab buffers
and the row tile, so reachable size is bounded by HBM, not VMEM.

Reference hot path: `getOrderParamPsi` water_properties.py:393-433.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from waterorderlib_tpu.ops.pallas.psi6_kernel import K, psi6_epilogue
from waterorderlib_tpu.ops.pallas.slab import (
    clamp_window,
    extract_k_min,
    merge_k_min,
    slab_prep_traj,
    unsort_frames,
)


def _make_kernel(pad: int, seg: int, n_seg: int):
    def kernel(scalars_ref, boxes_ref, starts_ref, ext_hbm,
               psi_ref, cnt_ref, rows_buf, slab_buf, dsq_ref, sems):
        f = pl.program_id(0)
        i = pl.program_id(1)
        r = cnt_ref.shape[2]
        low_sq = scalars_ref[1]
        high_sq = scalars_ref[2]
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

            nd, (nx, ny, nz), _ = extract_k_min(dsq_ref, col, [xs, ys, zs], K)
            kd, (kx, ky, kz) = merge_k_min(
                jnp.concatenate([cd] + nd, axis=1),
                [
                    jnp.concatenate([cx] + nx, axis=1),
                    jnp.concatenate([cy] + ny, axis=1),
                    jnp.concatenate([cz] + nz, axis=1),
                ],
                K,
            )
            return kd, kx, ky, kz, count

        init = (
            jnp.full((r, K), jnp.inf, jnp.float32),
            jnp.zeros((r, K), jnp.float32),
            jnp.zeros((r, K), jnp.float32),
            jnp.zeros((r, K), jnp.float32),
            jnp.zeros((r, 1), jnp.float32),
        )
        cd, cx, cy, cz, count = jax.lax.fori_loop(0, n_seg, segment, init)

        ux, uy, uz, oks = [], [], [], []
        for k in range(K):
            ok = jnp.isfinite(cd[:, k : k + 1])
            vx = mi(cx[:, k : k + 1] - xr, bx)
            vy = mi(cy[:, k : k + 1] - yr, by)
            vz = mi(cz[:, k : k + 1] - zr, bz)
            nrm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
            inv = jnp.where(nrm > 0, 1.0 / jnp.where(nrm > 0, nrm, 1.0), 0.0)
            ux.append(vx * inv)
            uy.append(vy * inv)
            uz.append(vz * inv)
            oks.append(ok)

        psi = psi6_epilogue(ux, uy, uz, oks, count, r)
        sub = jax.lax.rem(i, 8)
        psi_ref[0, pl.ds(sub, 1), :] = psi.reshape(1, r)
        cnt_ref[0, pl.ds(sub, 1), :] = count.reshape(1, r)

    return kernel


@partial(jax.jit, static_argnames=("row_tile", "window", "pad", "seg", "unsort"))
def psi6_traj_hbm(
    pos: jnp.ndarray,
    boxes: jnp.ndarray,
    low_cut: float = 0.0,
    high_cut: float = 7.0,
    margin: float | None = None,
    row_tile: int = 128,
    window: int = 6144,
    pad: int = 512,
    seg: int = 1536,
    unsort: bool = True,
):
    """Contract matches psi6_chunked.psi6_traj_chunked: returns (psi (F, N),
    count (F, N), covered (F,)); coordinates stay HBM-resident."""
    if margin is None:
        margin = high_cut
    F, n = pos.shape[0], pos.shape[1]
    window = clamp_window(window, n, seg)
    prep = slab_prep_traj(pos, boxes, margin, row_tile, window, pad)
    scalars = jnp.stack(
        [jnp.float32(n), jnp.asarray(low_cut * low_cut, jnp.float32),
         jnp.asarray(high_cut * high_cut, jnp.float32)]
    )
    n_seg = window // seg
    ext8 = jnp.pad(prep.ext_t, ((0, 0), (0, 5), (0, 0)))
    # 8-tile output blocks (see lsi_hbm.py: whole-frame blocks scale with
    # N and OOM scoped VMEM at million-atom frames)
    out_spec = pl.BlockSpec(
        (1, 8, row_tile), lambda f, i, s1, s2, s3: (f, i // 8, 0),
        memory_space=pltpu.VMEM,
    )
    psi, cnt = pl.pallas_call(
        _make_kernel(pad, seg, n_seg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(F, prep.n_tiles),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=(out_spec, out_spec),
            scratch_shapes=[
                pltpu.VMEM((1, 8, row_tile), jnp.float32),
                pltpu.VMEM((2, 1, 8, seg), jnp.float32),
                pltpu.VMEM((row_tile, seg), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((F, prep.n_tiles, row_tile), jnp.float32),
            jax.ShapeDtypeStruct((F, prep.n_tiles, row_tile), jnp.float32),
        ),
    )(scalars, boxes.astype(jnp.float32), prep.starts, ext8)

    psi = psi.reshape(F, -1)[:, :n]
    cnt = cnt.reshape(F, -1)[:, :n]
    if unsort:
        psi = unsort_frames(psi, prep.order0)
        cnt = unsort_frames(cnt, prep.order0)
    return psi, cnt, prep.covered
