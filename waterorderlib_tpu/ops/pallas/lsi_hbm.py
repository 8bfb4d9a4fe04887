"""HBM-resident LSI kernel for million-atom frames.

The DMA tier of lsi_chunked.py, exactly as qtet_hbm.py is the DMA tier of
qtet_chunked.py: coordinates stay in HBM and each grid step streams its row
tile once plus double-buffered SEG-column slabs. LSI needs BOTH the imaged
z-sorted coordinates (for distances) and the raw coordinates (for the
reference's next-shell argmin quirk, water_properties.py:275-294), so the
two 3-row blocks are packed into one 8-sublane HBM array and served by a
single DMA stream. The carried-top-24 merge runs on the shared
slab.extract_k_min/merge_k_min helpers and the shared `lsi_epilogue`
evaluates the gap variance — bit-identical to lsi_chunked for the same
window; VMEM holds only the (row_tile, SEG) scratch and the slab buffers,
so reachable size is bounded by HBM, not VMEM.

Reference hot path: `getLSI` water_properties.py:252-311 + `lsiDists`
waterlib.f90:900-918.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from waterorderlib_tpu.ops.pallas.lsi_kernel import K, lsi_epilogue
from waterorderlib_tpu.ops.pallas.slab import (
    clamp_window,
    extract_k_min,
    merge_k_min,
    slab_prep_traj,
    unsort_frames,
)


def _make_kernel(pad: int, seg: int, n_seg: int):
    def kernel(scalars_ref, boxes_ref, starts_ref, combo_hbm,
               lsi_ref, code_ref, rows_buf, slab_buf, dsq_ref, sems):
        f = pl.program_id(0)
        i = pl.program_id(1)
        r = code_ref.shape[2]
        low_sq = scalars_ref[1]
        high = scalars_ref[2]
        outer_sq = scalars_ref[3]
        bx, by, bz = boxes_ref[f, 0], boxes_ref[f, 1], boxes_ref[f, 2]

        row0 = pad + i * r
        start = starts_ref[i] * 128

        def mi(d, box_l):
            d = jnp.where(d > box_l * 0.5, d - box_l, d)
            return jnp.where(d < -box_l * 0.5, d + box_l, d)

        def slab_dma(slot, s):
            seg_start = pl.multiple_of(start + s * seg, 128)
            return pltpu.make_async_copy(
                combo_hbm.at[pl.ds(f, 1), :, pl.ds(seg_start, seg)],
                slab_buf.at[slot],
                sems.at[slot],
            )

        row_dma = pltpu.make_async_copy(
            combo_hbm.at[pl.ds(f, 1), :, pl.ds(row0, r)], rows_buf, sems.at[2]
        )
        row_dma.start()
        slab_dma(0, 0).start()
        row_dma.wait()

        xr = rows_buf[0, 0, :].reshape(r, 1)
        yr = rows_buf[0, 1, :].reshape(r, 1)
        zr = rows_buf[0, 2, :].reshape(r, 1)
        rxr = rows_buf[0, 3, :].reshape(r, 1)
        ryr = rows_buf[0, 4, :].reshape(r, 1)
        rzr = rows_buf[0, 5, :].reshape(r, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (r, seg), 1)

        def segment(s, carry):
            cd, craw = carry
            slot = jax.lax.rem(s, 2)

            @pl.when(s + 1 < n_seg)
            def _():
                slab_dma(1 - slot, s + 1).start()

            slab_dma(slot, s).wait()
            xs = slab_buf[slot, 0, 0, :].reshape(1, seg)
            ys = slab_buf[slot, 0, 1, :].reshape(1, seg)
            zs = slab_buf[slot, 0, 2, :].reshape(1, seg)
            rxs = slab_buf[slot, 0, 3, :].reshape(1, seg)
            rys = slab_buf[slot, 0, 4, :].reshape(1, seg)
            rzs = slab_buf[slot, 0, 5, :].reshape(1, seg)
            dx = mi(xs - xr, bx)
            dy = mi(ys - yr, by)
            dz = mi(zs - zr, bz)
            dsq = dx * dx + dy * dy + dz * dz
            valid = (dsq > low_sq) & (dsq <= outer_sq)
            dsq_ref[:] = jnp.where(valid, dsq, jnp.inf)

            # per-round raw squared distance of the extracted candidate,
            # the quantity the reference's next-shell argmin selects on.
            # Formed once, extracted as ONE payload — bit-equal to squaring
            # three extracted coordinates (one-hot extraction is exact),
            # two fewer (r, seg) temps per unrolled round.
            rawdsq = (rxs - rxr) ** 2 + (rys - ryr) ** 2 + (rzs - rzr) ** 2
            nd, (rawj,), oks = extract_k_min(dsq_ref, col, [rawdsq], K)
            nraw = [jnp.where(oks[j], rawj[j], jnp.inf) for j in range(K)]
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
        # output blocks hold 8 tiles (the sublane minimum), NOT the whole
        # frame: whole-frame (1, n_tiles, row_tile) blocks keep
        # n_tiles*row_tile*4 B resident per output, which scales with N and
        # OOMs scoped VMEM at million-atom frames; an 8-tile block is 4 KB
        # and revisits the same block for 8 consecutive grid steps
        sub = jax.lax.rem(i, 8)
        lsi_ref[0, pl.ds(sub, 1), :] = jnp.where(okrow, var, 0.0).reshape(1, r)
        # valid+count packed into ONE output (cnt*2 + valid, exact small
        # ints in f32) — one less output stream
        code = jnp.where(okrow, n_near, 0.0) * 2.0 + okrow.astype(jnp.float32)
        code_ref[0, pl.ds(sub, 1), :] = code.reshape(1, r)

    return kernel


@partial(jax.jit, static_argnames=("row_tile", "window", "pad", "seg", "unsort"))
def lsi_traj_hbm(
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
    """Contract matches lsi_chunked.lsi_traj_chunked: returns (lsi (F, N),
    valid (F, N) bool, count (F, N), covered (F,)); coordinates stay
    HBM-resident."""
    F, n = pos.shape[0], pos.shape[1]
    window = clamp_window(window, n, seg)
    margin = high_cut + 3.7
    prep = slab_prep_traj(pos, boxes, margin, row_tile, window, pad)
    raw_sp = pos[:, prep.order0, :]
    raw_ext = jnp.concatenate(
        [raw_sp[:, -pad:, :], raw_sp, raw_sp[:, :pad, :]], axis=1
    )
    raw_t = jnp.transpose(raw_ext, (0, 2, 1)).astype(jnp.float32)
    # imaged rows 0-2, raw rows 3-5, 2 pad rows -> one 8-sublane DMA stream
    combo = jnp.pad(
        jnp.concatenate([prep.ext_t, raw_t], axis=1), ((0, 0), (0, 2), (0, 0))
    )

    scalars = jnp.stack(
        [jnp.float32(n), jnp.asarray(low_cut * low_cut, jnp.float32),
         jnp.asarray(high_cut, jnp.float32),
         jnp.asarray((high_cut + 3.7) ** 2, jnp.float32)]
    )
    n_seg = window // seg
    out_spec = pl.BlockSpec(
        (1, 8, row_tile), lambda f, i, s1, s2, s3: (f, i // 8, 0),
        memory_space=pltpu.VMEM,
    )
    lsi_v, code = pl.pallas_call(
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
    )(scalars, boxes.astype(jnp.float32), prep.starts, combo)

    lsi_v = lsi_v.reshape(F, -1)[:, :n]
    code = code.reshape(F, -1)[:, :n]
    valid = jnp.mod(code, 2.0) > 0
    cnt = jnp.floor(code / 2.0)
    if unsort:
        lsi_v = unsort_frames(lsi_v, prep.order0)
        valid = unsort_frames(valid, prep.order0)
        cnt = unsort_frames(cnt, prep.order0)
    return lsi_v, valid, cnt, prep.covered
