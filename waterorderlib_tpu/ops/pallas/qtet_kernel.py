"""Pallas TPU kernel: fused tetrahedral-order-parameter pipeline.

One kernel replaces the reference's entire q_tet hot path
(`allNearNeighbors` waterlib.f90:830-862 + per-water argsort-4NN +
`tetraCosAng` waterlib.f90:867-895 + the q formula
water_properties.py:388): for each row tile of waters it computes the
minimum-image displacement/distance block against ALL waters directly in
VMEM, extracts the 4 nearest in-shell neighbors by iterative min-extraction,
and evaluates q — the (N x N) distance matrix never touches HBM.

Memory per grid step (row tile R, N columns): 4 scratch buffers
(dx, dy, dz, dsq) of R x N f32. With R = 128, N = 4096 that is 8 MB of
VMEM. HBM traffic is just the (3, N) coordinate read and the (R,) q write
per tile, so the kernel is VPU-compute-bound instead of HBM-bound.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_N_QBINS = 500  # histogram bins over [0, 1], padded to 512 lanes in-kernel


def _qtet_kernel(scalars_ref, pos_t_ref, out_ref, hist_ref, dx_ref, dy_ref, dz_ref, dsq_ref):
    i = pl.program_id(0)
    r = dx_ref.shape[0]  # row tile size
    n = pos_t_ref.shape[1]  # padded column count
    n_real = scalars_ref[0].astype(jnp.int32)
    low_sq = scalars_ref[1]
    high_sq = scalars_ref[2]
    box_x = scalars_ref[3]
    box_y = scalars_ref[4]
    box_z = scalars_ref[5]

    row0 = i * r
    xs = pos_t_ref[0, :].reshape(1, n)
    ys = pos_t_ref[1, :].reshape(1, n)
    zs = pos_t_ref[2, :].reshape(1, n)
    xr = pos_t_ref[0, pl.ds(row0, r)].reshape(r, 1)
    yr = pos_t_ref[1, pl.ds(row0, r)].reshape(r, 1)
    zr = pos_t_ref[2, pl.ds(row0, r)].reshape(r, 1)

    def mi(d, box_l):
        # coordinates are pre-wrapped into [0, L) by the wrapper, so |d| < L
        # and two compare-selects replace the costlier round()
        d = jnp.where(d > box_l * 0.5, d - box_l, d)
        return jnp.where(d < -box_l * 0.5, d + box_l, d)

    dx = mi(xs - xr, box_x)
    dy = mi(ys - yr, box_y)
    dz = mi(zs - zr, box_z)
    dsq = dx * dx + dy * dy + dz * dz

    col = jax.lax.broadcasted_iota(jnp.int32, (r, n), 1)
    valid = (dsq > low_sq) & (dsq <= high_sq) & (col < n_real)
    count = jnp.sum(valid.astype(jnp.float32), axis=1, keepdims=True)  # (r,1)

    dx_ref[:] = dx
    dy_ref[:] = dy
    dz_ref[:] = dz
    dsq_ref[:] = jnp.where(valid, dsq, jnp.inf)

    big = jnp.int32(n)
    units = []
    oks = []
    for _ in range(4):
        d = dsq_ref[:]
        m = jnp.min(d, axis=1, keepdims=True)  # (r, 1)
        eq = (d == m) & jnp.isfinite(d)
        first_col = jnp.min(jnp.where(eq, col, big), axis=1, keepdims=True)
        first = eq & (col == first_col)
        w = first.astype(jnp.float32)
        vx = jnp.sum(w * dx_ref[:], axis=1, keepdims=True)
        vy = jnp.sum(w * dy_ref[:], axis=1, keepdims=True)
        vz = jnp.sum(w * dz_ref[:], axis=1, keepdims=True)
        ok = jnp.sum(w, axis=1, keepdims=True) > 0
        nrm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
        inv = jnp.where(nrm > 0, 1.0 / jnp.where(nrm > 0, nrm, 1.0), 0.0)
        units.append((vx * inv, vy * inv, vz * inv))
        oks.append(ok)
        dsq_ref[:] = jnp.where(first, jnp.inf, d)

    ssum = jnp.zeros((r, 1), jnp.float32)
    for a in range(4):
        for b in range(a + 1, 4):
            ca, cb = units[a], units[b]
            cosv = ca[0] * cb[0] + ca[1] * cb[1] + ca[2] * cb[2]
            pair_ok = oks[a] & oks[b]
            cosv = jnp.where(pair_ok, jnp.clip(cosv, -1.0, 1.0), -1.0)
            ssum = ssum + (cosv + 1.0 / 3.0) ** 2
    q = 1.0 - 0.375 * ssum  # (r, 1)
    q = jnp.where(count > 0, q, 0.0)
    # the full (n_tiles, r) output block stays resident; each step fills row i
    out_ref[pl.ds(i, 1), :] = q.reshape(1, r)

    # fused q histogram over [0, 1] (np.histogram semantics), accumulated
    # across grid steps in the resident (1, n_hist) output block
    n_hist = hist_ref.shape[1]
    n_bins_f = jnp.float32(_N_QBINS)
    row_in_range = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0) + row0 < n_real
    bin_idx = jnp.floor(q * n_bins_f).astype(jnp.int32)
    bin_idx = jnp.where(q == 1.0, _N_QBINS - 1, bin_idx)
    ok = (q >= 0.0) & (q <= 1.0) & row_in_range
    bins = jax.lax.broadcasted_iota(jnp.int32, (r, n_hist), 1)
    eq = (bin_idx == bins) & ok
    contrib = jnp.sum(eq.astype(jnp.float32), axis=0, keepdims=True)  # (1, n_hist)

    @pl.when(i == 0)
    def _():
        hist_ref[:] = contrib

    @pl.when(i > 0)
    def _():
        hist_ref[:] = hist_ref[:] + contrib


@partial(jax.jit, static_argnames=("row_tile",))
def order_param_q_pallas(
    pos: jnp.ndarray,
    box: jnp.ndarray,
    low_cut: float = 0.0,
    high_cut: float = 10.0,
    row_tile: int = 128,
) -> jnp.ndarray:
    """q for all positions against themselves (the benchmark configuration).

    pos: (N, 3) f32; box: (3,). Returns (q (N,), hist (500,)): per-water q
    matching order.qtet.order_param_q(pos, pos, box, low, high) to f32
    precision, plus the fused histogram of q over [0, 1] (500 bins,
    np.histogram edge semantics) — the full benchmark pipeline in one
    kernel launch.
    """
    n = pos.shape[0]
    n_pad = -(-n // row_tile) * row_tile
    pos = jnp.mod(pos, box[None, :])  # select-mi in-kernel needs [0, L)
    # pad columns with zeros; excluded in-kernel via the n_real scalar
    pos_p = jnp.pad(pos, ((0, n_pad - n), (0, 0)))
    pos_t = jnp.transpose(pos_p).astype(jnp.float32)  # (3, Npad)

    scalars = jnp.array(
        [
            jnp.float32(n),
            jnp.float32(low_cut * low_cut),
            jnp.float32(high_cut * high_cut),
            box[0].astype(jnp.float32),
            box[1].astype(jnp.float32),
            box[2].astype(jnp.float32),
        ],
        dtype=jnp.float32,
    )

    n_tiles = n_pad // row_tile
    n_hist_pad = 512
    out, hist = pl.pallas_call(
        _qtet_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec(
                    (n_tiles, row_tile), lambda i, s: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((1, n_hist_pad), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((row_tile, n_pad), jnp.float32),
                pltpu.VMEM((row_tile, n_pad), jnp.float32),
                pltpu.VMEM((row_tile, n_pad), jnp.float32),
                pltpu.VMEM((row_tile, n_pad), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, row_tile), jnp.float32),
            jax.ShapeDtypeStruct((1, n_hist_pad), jnp.float32),
        ),
    )(scalars, pos_t)
    return out.reshape(-1)[:n], hist[0, :_N_QBINS]


def _qtet_frames_kernel(
    scalars_ref, boxes_ref, pos_t_ref, out_ref, dx_ref, dy_ref, dz_ref, dsq_ref
):
    f = pl.program_id(0)
    i = pl.program_id(1)
    r = dx_ref.shape[0]
    n = pos_t_ref.shape[2]
    n_real = scalars_ref[0].astype(jnp.int32)
    low_sq = scalars_ref[1]
    high_sq = scalars_ref[2]
    box_x = boxes_ref[f, 0]
    box_y = boxes_ref[f, 1]
    box_z = boxes_ref[f, 2]

    row0 = i * r
    xs = pos_t_ref[0, 0, :].reshape(1, n)
    ys = pos_t_ref[0, 1, :].reshape(1, n)
    zs = pos_t_ref[0, 2, :].reshape(1, n)
    xr = pos_t_ref[0, 0, pl.ds(row0, r)].reshape(r, 1)
    yr = pos_t_ref[0, 1, pl.ds(row0, r)].reshape(r, 1)
    zr = pos_t_ref[0, 2, pl.ds(row0, r)].reshape(r, 1)

    def mi(d, box_l):
        # coordinates are pre-wrapped into [0, L) by the wrapper, so |d| < L
        # and two compare-selects replace the costlier round()
        d = jnp.where(d > box_l * 0.5, d - box_l, d)
        return jnp.where(d < -box_l * 0.5, d + box_l, d)

    dx = mi(xs - xr, box_x)
    dy = mi(ys - yr, box_y)
    dz = mi(zs - zr, box_z)
    dsq = dx * dx + dy * dy + dz * dz

    col = jax.lax.broadcasted_iota(jnp.int32, (r, n), 1)
    valid = (dsq > low_sq) & (dsq <= high_sq) & (col < n_real)
    count = jnp.sum(valid.astype(jnp.float32), axis=1, keepdims=True)

    dx_ref[:] = dx
    dy_ref[:] = dy
    dz_ref[:] = dz
    dsq_ref[:] = jnp.where(valid, dsq, jnp.inf)

    big = jnp.int32(n)
    units = []
    oks = []
    for _ in range(4):
        d = dsq_ref[:]
        m = jnp.min(d, axis=1, keepdims=True)
        eq = (d == m) & jnp.isfinite(d)
        first_col = jnp.min(jnp.where(eq, col, big), axis=1, keepdims=True)
        first = eq & (col == first_col)
        w = first.astype(jnp.float32)
        vx = jnp.sum(w * dx_ref[:], axis=1, keepdims=True)
        vy = jnp.sum(w * dy_ref[:], axis=1, keepdims=True)
        vz = jnp.sum(w * dz_ref[:], axis=1, keepdims=True)
        ok = jnp.sum(w, axis=1, keepdims=True) > 0
        nrm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
        inv = jnp.where(nrm > 0, 1.0 / jnp.where(nrm > 0, nrm, 1.0), 0.0)
        units.append((vx * inv, vy * inv, vz * inv))
        oks.append(ok)
        dsq_ref[:] = jnp.where(first, jnp.inf, d)

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


@partial(jax.jit, static_argnames=("row_tile",))
def order_param_q_pallas_frames(
    pos: jnp.ndarray,
    boxes: jnp.ndarray,
    low_cut: float = 0.0,
    high_cut: float = 10.0,
    row_tile: int = 128,
):
    """Whole-trajectory q_tet in ONE kernel launch: grid over
    (frames, row tiles), per-frame boxes from SMEM, global q histogram
    accumulated across every grid step.

    pos: (F, N, 3); boxes: (F, 3). Returns (q (F, N), hist (500,)).
    """
    f_frames, n = pos.shape[0], pos.shape[1]
    n_pad = -(-n // row_tile) * row_tile
    pos = jnp.mod(pos, boxes[:, None, :])  # select-mi in-kernel needs [0, L)
    pos_p = jnp.pad(pos, ((0, 0), (0, n_pad - n), (0, 0)))
    pos_t = jnp.transpose(pos_p, (0, 2, 1)).astype(jnp.float32)  # (F, 3, Npad)

    scalars = jnp.array(
        [jnp.float32(n), jnp.float32(low_cut * low_cut), jnp.float32(high_cut * high_cut)],
        dtype=jnp.float32,
    )
    n_tiles = n_pad // row_tile
    out = pl.pallas_call(
        _qtet_frames_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(f_frames, n_tiles),
            in_specs=[
                pl.BlockSpec(
                    (1, 3, n_pad), lambda f, i, s1, s2: (f, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, n_tiles, row_tile), lambda f, i, s1, s2: (f, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((row_tile, n_pad), jnp.float32),
                pltpu.VMEM((row_tile, n_pad), jnp.float32),
                pltpu.VMEM((row_tile, n_pad), jnp.float32),
                pltpu.VMEM((row_tile, n_pad), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((f_frames, n_tiles, row_tile), jnp.float32),
    )(scalars, boxes.astype(jnp.float32), pos_t)
    q = out.reshape(f_frames, -1)[:, :n]
    # q histogram over [0, 1]: one vectorized pass over the full trajectory
    # is far cheaper than accumulating inside the kernel (which serializes
    # the grid on the shared histogram block)
    from waterorderlib_tpu.ops import histograms as _hist

    hist = _hist.masked_histogram(q, jnp.ones_like(q, bool), _N_QBINS, 0.0, 1.0)
    return q, hist
