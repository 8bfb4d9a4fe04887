"""Window-chunked 3-body pair-angle kernel for huge systems.

Extends the carried-top-K pattern of qtet_chunked.py (see its docstring for
the exactness argument) to the K=16 neighbor extraction of the 3-body
analysis (`allNearNeighbors` waterlib.f90:830-862 + per-water
`tetraCosAng` waterlib.f90:867-895): the z-slab window is scanned in
SEG-column segments, each segment's top-16 in-shell neighbors are merged
into a carried top-16, and the 120 pair angles are emitted from the final
carry — VMEM holds a (row_tile, SEG) scratch instead of the monolithic
(row_tile, window) one whose ~7x Mosaic stack caps the monolithic kernel
(angles_kernel.py) near ~25k atoms.

Per-tile output blocks ((1, 1, row_tile, 128) — the last two dims satisfy
the (8, 128) divisibility rule) keep the angle tensor out of whole-frame
VMEM, so the reachable size is bounded only by the extended coordinate
array. Results are bit-identical to angles_kernel for the same window.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from waterorderlib_tpu.ops.pallas.angles_kernel import (
    K,
    N_PAIRS,
    N_PAIRS_PAD,
    PAIR_A,
    PAIR_B,
    _acos,
)
from waterorderlib_tpu.ops.pallas.slab import (
    clamp_window,
    extract_k_min,
    merge_k_min,
    slab_prep_traj,
    unsort_frames,
)


def _make_kernel(pad: int, seg: int, n_seg: int):
    def kernel(scalars_ref, boxes_ref, starts_ref, ext_t_ref, ang_ref, cnt_ref, dsq_ref):
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

        xr = ext_t_ref[0, 0, pl.ds(row0, r)].reshape(r, 1)
        yr = ext_t_ref[0, 1, pl.ds(row0, r)].reshape(r, 1)
        zr = ext_t_ref[0, 2, pl.ds(row0, r)].reshape(r, 1)

        col = jax.lax.broadcasted_iota(jnp.int32, (r, seg), 1)

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

        rad2deg = jnp.float32(180.0 / np.pi)
        cols = []
        for p in range(N_PAIRS):
            a, b = int(PAIR_A[p]), int(PAIR_B[p])
            cosv = ux[a] * ux[b] + uy[a] * uy[b] + uz[a] * uz[b]
            ang = _acos(jnp.clip(cosv, -1.0, 1.0)) * rad2deg
            pair_ok = oks[a] & oks[b]
            cols.append(jnp.where(pair_ok, ang, -1.0))
        for _ in range(N_PAIRS_PAD - N_PAIRS):
            cols.append(jnp.full((r, 1), -1.0, jnp.float32))
        ang_ref[0, 0, :, :] = jnp.concatenate(cols, axis=1).reshape(r, N_PAIRS_PAD)
        cnt_ref[0, pl.ds(i, 1), :] = count.reshape(1, r)

    return kernel


@partial(jax.jit, static_argnames=("row_tile", "window", "pad", "seg", "unsort"))
def neighbor_pair_angles_traj_chunked(
    pos: jnp.ndarray,
    boxes: jnp.ndarray,
    low_cut: float = 0.0,
    high_cut: float = 3.413,
    margin: float = 4.5,
    row_tile: int = 128,
    window: int = 6144,
    pad: int = 512,
    seg: int = 1536,
    unsort: bool = True,
):
    """Contract matches angles_kernel.neighbor_pair_angles_traj: returns
    (ang (F, N, 128) degrees with -1 invalid slots, count (F, N),
    covered (F,)). `window` is rounded up to a multiple of `seg`."""
    if isinstance(margin, (int, float)) and isinstance(high_cut, (int, float)):
        if margin < high_cut:
            raise ValueError("slab margin must cover the shell cutoff")
    F, n = pos.shape[0], pos.shape[1]
    window = clamp_window(window, n, seg)
    prep = slab_prep_traj(pos, boxes, margin, row_tile, window, pad)
    scalars = jnp.stack(
        [jnp.float32(n), jnp.asarray(low_cut * low_cut, jnp.float32),
         jnp.asarray(high_cut * high_cut, jnp.float32)]
    )
    n_seg = window // seg
    ang, cnt = pl.pallas_call(
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
                # per-tile angle blocks: last two dims (row_tile, 128) meet
                # the (8, 128) divisibility rule, so the (N, 128) angle
                # tensor never sits whole-frame in VMEM
                pl.BlockSpec(
                    (1, 1, row_tile, N_PAIRS_PAD),
                    lambda f, i, s1, s2, s3: (f, i, 0, 0),
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
            jax.ShapeDtypeStruct((F, prep.n_tiles, row_tile, N_PAIRS_PAD), jnp.float32),
            jax.ShapeDtypeStruct((F, prep.n_tiles, row_tile), jnp.float32),
        ),
    )(scalars, boxes.astype(jnp.float32), prep.starts, prep.ext_t)

    ang = ang.reshape(F, -1, N_PAIRS_PAD)[:, :n]
    cnt = cnt.reshape(F, -1)[:, :n]
    if unsort:
        ang = unsort_frames(ang, prep.order0)
        cnt = unsort_frames(cnt, prep.order0)
    return ang, cnt, prep.covered
