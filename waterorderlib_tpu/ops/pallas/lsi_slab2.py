"""Split-shell LSI kernel: narrow in-shell extraction + wide next-shell min.

The window-chunked LSI kernel (lsi_chunked.py) extracts K=24 carried minima
over the FULL (low, high+3.7] annulus window — but the LSI statistic
(reference `getLSI`, /root/reference/structureLibs/water_properties.py:
252-311) only needs (a) ALL in-shell neighbors within `high` (3.7 A —
typically ~5 for water) sorted ascending, and (b) the SINGLE next-shell
neighbor minimizing the RAW (non-imaged) distance among candidates whose
imaged distance lies in (high, high+3.7] (wp:289-291). Extraction cost is
K x window lanes per row, so splitting the work as

  - pass 1: K_in=12 rounds over a HALF-width window (z-margin `high`
    instead of `high + 3.7`) restricted to in-shell candidates, with an
    exact in-shell count carried alongside, and
  - pass 2: ONE min-select round over the wide window for the next-shell
    pick (no carried-top-K at all),

costs ~K_in x W/2 + W instead of 24 x W — a ~3.4x lane-round reduction.

Exactness: pass 1 is certified by the slab window coverage AND a per-row
count certificate (in-shell count <= K_in; rows over the cap set the
`incomplete` flag and the frame's `covered` goes False, exactly like a
window-coverage miss — the driver falls back to the K=24 chunked kernel).
Pass 2 needs no count: a single min over ALL wide-window candidates is the
exact reference semantics (the K=24 kernels approximate it by restricting
the argmin to the top-24-by-imaged-distance list; wp:289-291 does not).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from waterorderlib_tpu.ops.pallas.lsi_kernel import lsi_epilogue
from waterorderlib_tpu.ops.pallas.slab import (
    clamp_window,
    extract_k_min,
    merge_k_min,
    slab_prep_traj_multi,
    unsort_frames,
)

K_IN = 12  # in-shell slots; count-certified (water coordination ~5)


def _make_kernel(pad: int, seg: int, n_seg_n: int, n_seg_w: int, k_in: int):
    def kernel(scalars_ref, boxes_ref, starts_n_ref, starts_w_ref,
               ext_t_ref, raw_t_ref, lsi_ref, valid_ref, cnt_ref,
               incomplete_ref, dsq_ref):
        f = pl.program_id(0)
        i = pl.program_id(1)
        r = cnt_ref.shape[2]
        low_sq = scalars_ref[1]
        high = scalars_ref[2]
        high_sq = scalars_ref[3]
        outer_sq = scalars_ref[4]
        bx, by, bz = boxes_ref[f, 0], boxes_ref[f, 1], boxes_ref[f, 2]

        row0 = pad + i * r

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

        # ---- pass 1: in-shell K_in extraction over the narrow window ----
        start_n = starts_n_ref[i] * 128

        def segment_n(s, carry):
            cd, cnt = carry
            seg_start = pl.multiple_of(start_n + s * seg, 128)
            xs = ext_t_ref[0, 0, pl.ds(seg_start, seg)].reshape(1, seg)
            ys = ext_t_ref[0, 1, pl.ds(seg_start, seg)].reshape(1, seg)
            zs = ext_t_ref[0, 2, pl.ds(seg_start, seg)].reshape(1, seg)
            dx = mi(xs - xr, bx)
            dy = mi(ys - yr, by)
            dz = mi(zs - zr, bz)
            dsq = dx * dx + dy * dy + dz * dz
            valid = (dsq > low_sq) & (dsq <= high_sq)
            cnt = cnt + jnp.sum(
                valid.astype(jnp.float32), axis=1, keepdims=True
            )
            dsq_ref[:] = jnp.where(valid, dsq, jnp.inf)
            nd, _, _ = extract_k_min(dsq_ref, col, [], k_in)
            kd, _ = merge_k_min(jnp.concatenate([cd] + nd, axis=1), [], k_in)
            return kd, cnt

        cd, cnt = jax.lax.fori_loop(
            0, n_seg_n, segment_n,
            (jnp.full((r, k_in), jnp.inf, jnp.float32),
             jnp.zeros((r, 1), jnp.float32)),
        )

        # ---- pass 2: next-shell min-RAW select over the wide window ----
        start_w = starts_w_ref[i] * 128

        def segment_w(s, carry):
            best_raw, best_img = carry
            seg_start = pl.multiple_of(start_w + s * seg, 128)
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
            valid = (dsq > high_sq) & (dsq <= outer_sq)
            rawdsq = (rxs - rxr) ** 2 + (rys - ryr) ** 2 + (rzs - rzr) ** 2
            rawm = jnp.where(valid, rawdsq, jnp.inf)
            m = jnp.min(rawm, axis=1, keepdims=True)  # (r, 1)
            # imaged dsq of the first-column raw minimum (one-hot select)
            eq = (rawm == m) & jnp.isfinite(rawm)
            fc = jnp.min(
                jnp.where(eq, col, jnp.int32(seg)), axis=1, keepdims=True
            )
            first = (eq & (col == fc)).astype(jnp.float32)
            img = jnp.sum(first * dsq, axis=1, keepdims=True)
            better = m < best_raw
            return (
                jnp.where(better, m, best_raw),
                jnp.where(better, img, best_img),
            )

        best_raw, best_img = jax.lax.fori_loop(
            0, n_seg_w, segment_w,
            (jnp.full((r, 1), jnp.inf, jnp.float32),
             jnp.zeros((r, 1), jnp.float32)),
        )

        # ---- epilogue: K_in sorted in-shell slots + one next-shell slot ----
        dists = [jnp.sqrt(cd[:, j : j + 1]) for j in range(k_in)]
        rawsqs = [jnp.full((r, 1), jnp.inf, jnp.float32)] * k_in
        fin = [jnp.isfinite(cd[:, j : j + 1]) for j in range(k_in)]
        has_next = jnp.isfinite(best_raw)
        dists.append(jnp.where(has_next, jnp.sqrt(best_img), jnp.inf))
        rawsqs.append(best_raw)
        fin.append(has_next)

        var, okrow, n_near = lsi_epilogue(dists, rawsqs, fin, high, r)
        lsi_ref[0, pl.ds(i, 1), :] = jnp.where(okrow, var, 0.0).reshape(1, r)
        valid_ref[0, pl.ds(i, 1), :] = okrow.astype(jnp.float32).reshape(1, r)
        cnt_ref[0, pl.ds(i, 1), :] = jnp.where(okrow, n_near, 0.0).reshape(1, r)
        incomplete_ref[0, pl.ds(i, 1), :] = (
            (cnt > float(k_in)).astype(jnp.float32).reshape(1, r)
        )

    return kernel


def fits_lsi_split(row_tile: int, seg: int, k_in: int, n_ext: int,
                   n_tiles: int) -> bool:
    """Scoped-VMEM pre-guard: K_in extraction stack + pass-2 temps + the
    VMEM-resident (3, n_ext) ext/raw blocks + 4 output blocks."""
    extract = row_tile * seg * 4 * (2.0 + 0.32 * k_in)
    pass2 = 4 * row_tile * seg * 4
    resident = 2 * 3 * n_ext * 4
    outs = 4 * n_tiles * row_tile * 4
    return extract + pass2 + resident + outs <= 14_000_000


@partial(
    jax.jit,
    static_argnames=(
        "row_tile", "window_narrow", "window_wide", "pad", "seg", "k_in",
        "unsort",
    ),
)
def lsi_traj_split(
    pos: jnp.ndarray,
    boxes: jnp.ndarray,
    low_cut: float = 0.0,
    high_cut: float = 3.7,
    row_tile: int = 128,
    window_narrow: int = 4608,
    window_wide: int = 9216,
    pad: int = 512,
    seg: int = 1536,
    k_in: int = K_IN,
    unsort: bool = True,
):
    """Contract matches lsi_kernel.lsi_traj: returns (lsi (F, N),
    valid (F, N) bool, count (F, N), covered (F,)). `covered` additionally
    requires every row's in-shell count <= k_in (the count certificate)."""
    F, n = pos.shape[0], pos.shape[1]
    w_n = clamp_window(window_narrow, n, seg)
    w_w = clamp_window(window_wide, n, seg)
    prep = slab_prep_traj_multi(
        pos, boxes,
        ((high_cut, w_n), (high_cut + 3.7, w_w)),
        row_tile, pad,
    )
    raw_sp = pos[:, prep.order0, :]
    raw_ext = jnp.concatenate(
        [raw_sp[:, -pad:, :], raw_sp, raw_sp[:, :pad, :]], axis=1
    )
    raw_t = jnp.transpose(raw_ext, (0, 2, 1)).astype(jnp.float32)

    scalars = jnp.stack(
        [jnp.float32(n), jnp.asarray(low_cut * low_cut, jnp.float32),
         jnp.asarray(high_cut, jnp.float32),
         jnp.asarray(high_cut * high_cut, jnp.float32),
         jnp.asarray((high_cut + 3.7) ** 2, jnp.float32)]
    )
    # clamp_window bounds both widths by (n // seg) * seg, which is <= every
    # clamp slab_prep applies — so the scanned widths equal the certified
    # ones exactly (asserted: a narrower scan than certified would be unsound)
    assert prep.ws[0] == w_n and prep.ws[1] == w_w
    n_seg_n = w_n // seg
    n_seg_w = w_w // seg
    out_spec = pl.BlockSpec(
        (1, prep.n_tiles, row_tile),
        lambda f, i, s1, s2, s3, s4: (f, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_spec = pl.BlockSpec(
        (1, 3, prep.ext_t.shape[2]),
        lambda f, i, s1, s2, s3, s4: (f, 0, 0),
        memory_space=pltpu.VMEM,
    )
    lsi_v, valid, cnt, incomplete = pl.pallas_call(
        _make_kernel(pad, seg, n_seg_n, n_seg_w, k_in),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(F, prep.n_tiles),
            in_specs=[in_spec, in_spec],
            out_specs=(out_spec, out_spec, out_spec, out_spec),
            scratch_shapes=[pltpu.VMEM((row_tile, seg), jnp.float32)],
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((F, prep.n_tiles, row_tile), jnp.float32)
            for _ in range(4)
        ),
    )(scalars, boxes.astype(jnp.float32), prep.starts[0], prep.starts[1],
      prep.ext_t, raw_t)

    lsi_v = lsi_v.reshape(F, -1)[:, :n]
    valid = valid.reshape(F, -1)[:, :n] > 0
    cnt = cnt.reshape(F, -1)[:, :n]
    incomplete = incomplete.reshape(F, -1)[:, :n] > 0
    covered = (
        prep.covered[0]
        & prep.covered[1]
        & ~jnp.any(incomplete, axis=1)
    )
    if unsort:
        lsi_v = unsort_frames(lsi_v, prep.order0)
        valid = unsort_frames(valid, prep.order0)
        cnt = unsort_frames(cnt, prep.order0)
    return lsi_v, valid, cnt, covered
