"""Pallas TPU kernel: fused general H-bond counting.

Replaces the canonical `generalHbonds` (waterlib.f90:1136-1210 /
water_properties.py:681-719) for the consumers that reduce the boolean
acceptor x donor matrix to row/column sums — which is every driver:
`hbCalc`'s per-molecule folds and `getBoundWrap`'s any-bond tests both need
only per-acceptor and per-donor bond counts. The kernel fuses the heavy-
heavy distance test and the D-H...A angle test and never materializes the
(Na, Nd) matrix in HBM.

The angle test avoids acos: ang >= ang_cut  <=>  cos(ang) <= cos(ang_cut),
with cos(ang) = (u . v_hat) / |u| for u = minimum-image (A - H) and v_hat
the pre-normalized minimum-image (D - H) direction (computed once per donor
outside the kernel).

Criteria match bonds.general_hbonds exactly: heavy-heavy dsq <= dist_cut^2
with dsq > 1e-2 excluded (self pairs), angle at the hydrogen >= ang_cut
(180 = linear).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from waterorderlib_tpu.core import pbc


def _kernel(scalars_ref, acc_t_ref, don_t_ref, donh_t_ref, vhat_t_ref,
            acc_cnt_ref, don_cnt_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    r = acc_cnt_ref.shape[1]
    wd = don_t_ref.shape[1]
    na_real = scalars_ref[0].astype(jnp.int32)
    nd_real = scalars_ref[1].astype(jnp.int32)
    dist_sq = scalars_ref[2]
    cos_cut = scalars_ref[3]
    bx, by, bz = scalars_ref[4], scalars_ref[5], scalars_ref[6]

    row0 = i * r
    col0 = j * wd

    def mi(d, box_l):
        d = jnp.where(d > box_l * 0.5, d - box_l, d)
        return jnp.where(d < -box_l * 0.5, d + box_l, d)

    xa = acc_t_ref[0, pl.ds(row0, r)].reshape(r, 1)
    ya = acc_t_ref[1, pl.ds(row0, r)].reshape(r, 1)
    za = acc_t_ref[2, pl.ds(row0, r)].reshape(r, 1)
    xd = don_t_ref[0, :].reshape(1, wd)
    yd = don_t_ref[1, :].reshape(1, wd)
    zd = don_t_ref[2, :].reshape(1, wd)
    xh = donh_t_ref[0, :].reshape(1, wd)
    yh = donh_t_ref[1, :].reshape(1, wd)
    zh = donh_t_ref[2, :].reshape(1, wd)
    vx = vhat_t_ref[0, :].reshape(1, wd)
    vy = vhat_t_ref[1, :].reshape(1, wd)
    vz = vhat_t_ref[2, :].reshape(1, wd)

    # heavy-heavy distance test
    dxd = mi(xd - xa, bx)
    dyd = mi(yd - ya, by)
    dzd = mi(zd - za, bz)
    dsq = dxd * dxd + dyd * dyd + dzd * dzd
    within = (dsq <= dist_sq) & (dsq > 1.0e-2)

    # angle test at the hydrogen: u = A - H, cos = (u.vhat)/|u| <= cos_cut
    ux = mi(xa - xh, bx)
    uy = mi(ya - yh, by)
    uz = mi(za - zh, bz)
    usq = ux * ux + uy * uy + uz * uz
    t = ux * vx + uy * vy + uz * vz
    ang_ok = t <= cos_cut * jnp.sqrt(usq)

    col = jax.lax.broadcasted_iota(jnp.int32, (r, wd), 1) + col0
    row = jax.lax.broadcasted_iota(jnp.int32, (r, wd), 0) + row0
    bond = (within & ang_ok & (col < nd_real) & (row < na_real)).astype(jnp.float32)

    acc_contrib = jnp.sum(bond, axis=1)  # (r,)
    don_contrib = jnp.sum(bond, axis=0, keepdims=True)  # (1, wd)

    @pl.when(j == 0)
    def _():
        acc_cnt_ref[pl.ds(i, 1), :] = acc_contrib.reshape(1, r)

    @pl.when(j > 0)
    def _():
        acc_cnt_ref[pl.ds(i, 1), :] = acc_cnt_ref[pl.ds(i, 1), :] + acc_contrib.reshape(1, r)

    @pl.when(i == 0)
    def _():
        don_cnt_ref[:, pl.ds(col0, wd)] = don_contrib

    @pl.when(i > 0)
    def _():
        don_cnt_ref[:, pl.ds(col0, wd)] = don_cnt_ref[:, pl.ds(col0, wd)] + don_contrib


@partial(jax.jit, static_argnames=("row_tile", "col_tile"))
def hbond_counts(
    acc_pos: jnp.ndarray,
    don_pos: jnp.ndarray,
    donh_pos: jnp.ndarray,
    box: jnp.ndarray,
    dist_cut: float = 3.5,
    ang_cut: float = 120.0,
    row_tile: int = 256,
    col_tile: int = 2048,
):
    """(acc_counts (Na,), don_counts (Nd,)) of the general H-bond matrix.

    Jittable (usable inside lax.scan over frames). Matches
    jnp.sum(bonds.general_hbonds(...), axis=1) / axis=0 to f32 exactness
    away from the measure-zero angle/distance threshold boundaries.
    """
    na, nd = acc_pos.shape[0], don_pos.shape[0]
    r = min(row_tile, max(8, -(-na // 8) * 8))
    wd = min(col_tile, max(128, -(-nd // 128) * 128))
    na_pad = -(-na // r) * r
    nd_pad = -(-nd // wd) * wd

    box = box.astype(jnp.float32)
    # select-style minimum image in-kernel needs coordinates in [0, L)
    acc_w = jnp.mod(acc_pos, box[None, :])
    don_w = jnp.mod(don_pos, box[None, :])
    donh_w = jnp.mod(donh_pos, box[None, :])
    vden = pbc.minimum_image(don_pos - donh_pos, box)
    vhat = vden / jnp.maximum(jnp.linalg.norm(vden, axis=-1, keepdims=True), 1e-12)

    def padt(a, n_to):
        a = jnp.pad(a, ((0, n_to - a.shape[0]), (0, 0)))
        return jnp.transpose(a).astype(jnp.float32)

    acc_t = padt(acc_w, na_pad)
    don_t = padt(don_w, nd_pad)
    donh_t = padt(donh_w, nd_pad)
    vhat_t = padt(vhat, nd_pad)

    cos_cut = jnp.cos(jnp.radians(jnp.asarray(ang_cut, jnp.float32)))
    scalars = jnp.stack(
        [jnp.float32(na), jnp.float32(nd),
         jnp.asarray(dist_cut * dist_cut, jnp.float32), cos_cut,
         box[0], box[1], box[2]]
    )
    n_i = na_pad // r
    n_j = nd_pad // wd
    acc_cnt, don_cnt = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_i, n_j),
            in_specs=[
                pl.BlockSpec((3, na_pad), lambda i, j, s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, wd), lambda i, j, s: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, wd), lambda i, j, s: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, wd), lambda i, j, s: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((n_i, r), lambda i, j, s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nd_pad), lambda i, j, s: (0, 0), memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_i, r), jnp.float32),
            jax.ShapeDtypeStruct((1, nd_pad), jnp.float32),
        ),
    )(scalars, acc_t, don_t, donh_t, vhat_t)
    return acc_cnt.reshape(-1)[:na], don_cnt[0, :nd]
