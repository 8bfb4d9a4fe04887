"""Pallas TPU kernel: fused psi-6 hexagonal order parameter.

Replaces the psi6 hot path (`getOrderParamPsi`
water_properties.py:393-433 over `nearNeighbors`/`tetraCosAng`
waterlib.f90:710-743/:867-895): one z-slab sweep per row tile extracts the
K=24 nearest in-shell neighbor unit vectors and accumulates
| mean exp(6 i theta) | over all 276 neighbor pairs entirely in-register.

No transcendentals are needed: with c = cos(theta) from the unit-vector dot
product and theta in [0, pi],

    cos(6 theta) = T6(c) = 32 c^6 - 48 c^4 + 18 c^2 - 1
    sin(6 theta) = sin(theta) U5(c) = sqrt(1 - c^2) (32 c^5 - 32 c^3 + 6 c)

which is mathematically identical to the XLA path's
cos/sin(6 * acos(c)) and avoids the unlowerable acos.

Semantics match order.psi6.order_param_psi(sub, pos, box, low, high, k=24):
psi = sqrt(re^2 + im^2) over valid pairs, 0 for centers with < 2 in-shell
neighbors. Exactness certified by `covered` (margin >= high_cut).
"""

from __future__ import annotations

from functools import partial

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
    def kernel(scalars_ref, boxes_ref, starts_ref, ext_t_ref,
               psi_ref, cnt_ref, dsq_ref):
        f = pl.program_id(0)
        i = pl.program_id(1)
        r = cnt_ref.shape[2]
        w = dsq_ref.shape[1]
        low_sq = scalars_ref[1]
        high_sq = scalars_ref[2]
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

        dx = mi(xs - xr, bx)
        dy = mi(ys - yr, by)
        dz = mi(zs - zr, bz)
        dsq = dx * dx + dy * dy + dz * dz
        col = jax.lax.broadcasted_iota(jnp.int32, (r, w), 1)
        valid = (dsq > low_sq) & (dsq <= high_sq)
        count = jnp.sum(valid.astype(jnp.float32), axis=1, keepdims=True)
        dsq_ref[:] = jnp.where(valid, dsq, jnp.inf)

        _, (xjs, yjs, zjs), oks = extract_k_min(dsq_ref, col, [xs, ys, zs], K)
        ux, uy, uz = [], [], []
        for k in range(K):
            vx = mi(xjs[k] - xr, bx)
            vy = mi(yjs[k] - yr, by)
            vz = mi(zjs[k] - zr, bz)
            nrm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
            inv = jnp.where(nrm > 0, 1.0 / jnp.where(nrm > 0, nrm, 1.0), 0.0)
            ux.append(vx * inv)
            uy.append(vy * inv)
            uz.append(vz * inv)

        psi = psi6_epilogue(ux, uy, uz, oks, count, r)
        psi_ref[0, pl.ds(i, 1), :] = psi.reshape(1, r)
        cnt_ref[0, pl.ds(i, 1), :] = count.reshape(1, r)

    return kernel


def psi6_epilogue(ux, uy, uz, oks, count, r):
    """| mean exp(6 i theta) | over all K-choose-2 neighbor pairs from
    per-slot unit vectors (K-lists of (r, 1)). Shared by the monolithic and
    window-chunked psi6 kernels.

    Packs the per-slot (r, 1) vectors into (r, K) matrices: narrow columns
    pad to full 128-lane vregs, so hundreds of separate (r, 1) temporaries
    would blow the scoped-VMEM stack; packed, each pair batch is one
    lane-vectorized op."""
    UX = jnp.concatenate(ux, axis=1)  # (r, K)
    UY = jnp.concatenate(uy, axis=1)
    UZ = jnp.concatenate(uz, axis=1)
    # cast each (r, 1) bool before concatenating (concat-then-cast hits
    # an invalid i1->i32 vreg bitcast in Mosaic)
    okf = [jnp.where(o, 1.0, 0.0) for o in oks]
    OK = jnp.concatenate(okf, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

    re = jnp.zeros((r, 1), jnp.float32)
    im = jnp.zeros((r, 1), jnp.float32)
    npair = jnp.zeros((r, 1), jnp.float32)
    for b in range(1, K):
        # all pairs (a, b) with a < b at once along lanes
        c = UX * ux[b] + UY * uy[b] + UZ * uz[b]  # (r, K)
        c = jnp.clip(c, -1.0, 1.0)
        c2 = c * c
        cos6 = ((32.0 * c2 - 48.0) * c2 + 18.0) * c2 - 1.0
        sin6 = jnp.sqrt(jnp.maximum(1.0 - c2, 0.0)) * (
            ((32.0 * c2 - 32.0) * c2 + 6.0) * c
        )
        pair_ok = OK * okf[b] * jnp.where(lane < b, 1.0, 0.0)
        re = re + jnp.sum(pair_ok * cos6, axis=1, keepdims=True)
        im = im + jnp.sum(pair_ok * sin6, axis=1, keepdims=True)
        npair = npair + jnp.sum(pair_ok, axis=1, keepdims=True)
    denom = jnp.maximum(npair, 1.0)
    psi = jnp.sqrt((re / denom) ** 2 + (im / denom) ** 2)
    return jnp.where(count > 1, psi, 0.0)


@partial(jax.jit, static_argnames=("row_tile", "window", "pad", "unsort"))
def psi6_traj(
    pos: jnp.ndarray,
    boxes: jnp.ndarray,
    low_cut: float = 0.0,
    high_cut: float = 7.0,
    margin: float | None = None,
    row_tile: int = 128,  # 24 unrolled rounds: see lsi_kernel VMEM note
    window: int = 2048,
    pad: int = 512,
    unsort: bool = True,
):
    """psi-6 for a whole trajectory in one kernel launch.

    pos: (F, N, 3); boxes: (F, 3). Returns (psi (F, N), count (F, N),
    covered (F,)). Matches order.psi6.order_param_psi(p, p, b, low, high,
    k=24) per frame wherever covered.
    """
    if margin is None:
        margin = high_cut
    F, n = pos.shape[0], pos.shape[1]
    prep = slab_prep_traj(pos, boxes, margin, row_tile, window, pad)
    scalars = jnp.stack(
        [jnp.float32(n), jnp.asarray(low_cut * low_cut, jnp.float32),
         jnp.asarray(high_cut * high_cut, jnp.float32)]
    )
    out_spec = pl.BlockSpec(
        (1, prep.n_tiles, row_tile), lambda f, i, s1, s2, s3: (f, 0, 0),
        memory_space=pltpu.VMEM,
    )
    psi, cnt = pl.pallas_call(
        _make_kernel(pad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(F, prep.n_tiles),
            in_specs=[
                pl.BlockSpec(
                    (1, 3, prep.ext_t.shape[2]), lambda f, i, s1, s2, s3: (f, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=(out_spec, out_spec),
            scratch_shapes=[pltpu.VMEM((row_tile, prep.w), jnp.float32)],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((F, prep.n_tiles, row_tile), jnp.float32),
            jax.ShapeDtypeStruct((F, prep.n_tiles, row_tile), jnp.float32),
        ),
    )(scalars, boxes.astype(jnp.float32), prep.starts, prep.ext_t)

    psi = psi.reshape(F, -1)[:, :n]
    cnt = cnt.reshape(F, -1)[:, :n]
    if unsort:
        psi = unsort_frames(psi, prep.order0)
        cnt = unsort_frames(cnt, prep.order0)
    return psi, cnt, prep.covered
