"""Pallas TPU kernel: fused 3-body neighbor pair angles.

One kernel replaces the 3-body hot path of the reference
(`allNearNeighbors` waterlib.f90:830-862 + the per-water Python loop issuing
f2py `tetraCosAng` calls, waterlib.f90:867-895 / water_properties.py:210-250):
for each row tile of centers it sweeps a z-slab column window, extracts the
K=16 nearest in-shell neighbor unit vectors by iterative min-extraction, and
emits all 120 pair angles (degrees) per center — the (N x N) distance matrix
and the (N, K, 3) neighbor gather never touch HBM.

Output layout: (F, N, 128) angles with slots ordered (a, b), a < b < 16, in
row-major pair order; slots whose second neighbor index is >= the center's
in-shell neighbor count are invalid and hold -1 (outside the [0, 180]
histogram range, so threshold histograms drop them without a mask). The
per-center shell counts are returned so callers can derive the validity
mask (slot p valid iff PAIR_B[p] < min(count, 16)).

Exactness is certified by `covered` (every tile's window held all slab
candidates at the drift-inflated margin; margin must be >= high_cut).
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

K = 16
N_PAIRS = K * (K - 1) // 2  # 120
N_PAIRS_PAD = 128

# static pair enumeration: slot p -> (PAIR_A[p], PAIR_B[p]), a < b
PAIR_A = np.array([a for a in range(K) for b in range(a + 1, K)], np.int32)
PAIR_B = np.array([b for a in range(K) for b in range(a + 1, K)], np.int32)
# padding slots point at (K-1, K-1): always invalid (b == K-1 needs count > K-1,
# and the (a == b) diagonal is never enumerated, so mark via b = K)
PAIR_B_PADDED = np.concatenate([PAIR_B, np.full(N_PAIRS_PAD - N_PAIRS, K, np.int32)])

# Abramowitz & Stegun 4.4.46 coefficients: |acos_poly - acos| <= 2e-8 rad.
# Mosaic has no acos/atan2 lowering, so the kernel evaluates this instead.
_ACOS_C = (1.5707963050, -0.2145988016, 0.0889789874, -0.0501743046,
           0.0308918810, -0.0170881256, 0.0066700901, -0.0012624911)


def _acos(x):
    """Polynomial arccos for x in [-1, 1] (radians), Pallas-lowerable."""
    ax = jnp.abs(x)
    p = jnp.float32(_ACOS_C[-1])
    for c in _ACOS_C[-2::-1]:
        p = p * ax + jnp.float32(c)
    r = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * p
    return jnp.where(x >= 0, r, jnp.float32(np.pi) - r)


def _make_kernel(pad: int):
    def kernel(scalars_ref, boxes_ref, starts_ref, ext_t_ref, ang_ref, cnt_ref, dsq_ref):
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
        ang_ref[0, pl.ds(i, 1), :, :] = jnp.concatenate(cols, axis=1).reshape(1, r, N_PAIRS_PAD)
        cnt_ref[0, pl.ds(i, 1), :] = count.reshape(1, r)

    return kernel


@partial(jax.jit, static_argnames=("row_tile", "window", "pad", "unsort"))
def neighbor_pair_angles_traj(
    pos: jnp.ndarray,
    boxes: jnp.ndarray,
    low_cut: float = 0.0,
    high_cut: float = 3.413,
    margin: float = 4.5,
    row_tile: int = 128,
    window: int = 1536,
    pad: int = 512,
    unsort: bool = True,
):
    """All 3-body pair angles for a whole trajectory, one kernel launch.

    pos: (F, N, 3); boxes: (F, 3). Requires margin >= high_cut. Returns
    (ang (F, N, 128) degrees (-1 where invalid), count (F, N) in-shell
    neighbor counts, covered (F,) certificate). Matches
    order.angles.neighbor_angles(pos, pos, box, low, high, k=16) per frame:
    the angle MULTISET per center is equal (extraction order may differ on
    exact distance ties), counts are exact, and validity is
    PAIR_B[p] < min(count, 16).
    """
    # margin must cover the shell cutoff; checkable only when both are
    # concrete (they may be tracers under an outer jit)
    if isinstance(margin, (int, float)) and isinstance(high_cut, (int, float)):
        if margin < high_cut:
            raise ValueError("slab margin must cover the shell cutoff")
    F, n = pos.shape[0], pos.shape[1]
    prep = slab_prep_traj(pos, boxes, margin, row_tile, window, pad)
    scalars = jnp.stack(
        [jnp.float32(n), jnp.asarray(low_cut * low_cut, jnp.float32),
         jnp.asarray(high_cut * high_cut, jnp.float32)]
    )
    ang, cnt = pl.pallas_call(
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
            out_specs=(
                pl.BlockSpec(
                    (1, prep.n_tiles, row_tile, N_PAIRS_PAD),
                    lambda f, i, s1, s2, s3: (f, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, prep.n_tiles, row_tile), lambda f, i, s1, s2, s3: (f, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            scratch_shapes=[pltpu.VMEM((row_tile, prep.w), jnp.float32)],
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


def pair_validity(count: jnp.ndarray) -> jnp.ndarray:
    """(..., 128) bool: slot p valid iff PAIR_B[p] < min(count, K)."""
    ck = jnp.minimum(count, K)
    return jnp.asarray(PAIR_B_PADDED) < ck[..., None]
