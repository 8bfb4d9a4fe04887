"""Pallas TPU kernel: Willard-Chandler coarse-grained density field.

Fused replacement for the hottest grid kernel
(`WillardDensityField`, waterlib.f90:1286-1341, ~2.1e9 truncated-Gaussian
evaluations per frame at 81^3 x 4096): for each tile of grid points, the
minimum-image displacements to ALL atoms, the truncated-shifted Gaussian,
and the gradient (normal) accumulation happen in VMEM; nothing of the
(points x atoms) pair space reaches HBM.

Scalar math matches density.fields.willard_density_points exactly:
g = exp(-r^2 / 2 sigma^2) / (2 pi sigma^2)^{3/2}, density contribution
(g - shift) inside 3 sigma, gradient contribution -d * g / sigma^2.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _willard_kernel(scalars_ref, pos_t_ref, pts_t_ref, dens_ref, nx_ref, ny_ref, nz_ref):
    i = pl.program_id(0)
    r = pts_t_ref.shape[1]  # point tile
    n = pos_t_ref.shape[1]
    sig2 = scalars_ref[0]
    shift = scalars_ref[1]
    peak = scalars_ref[2]
    bx, by, bz = scalars_ref[3], scalars_ref[4], scalars_ref[5]

    gx = pts_t_ref[0, :].reshape(r, 1)
    gy = pts_t_ref[1, :].reshape(r, 1)
    gz = pts_t_ref[2, :].reshape(r, 1)
    ax = pos_t_ref[0, :].reshape(1, n)
    ay = pos_t_ref[1, :].reshape(1, n)
    az = pos_t_ref[2, :].reshape(1, n)

    def mi(d, box_l):
        ib = 1.0 / box_l
        return d - box_l * jnp.round(d * ib)

    dx = mi(gx - ax, bx)
    dy = mi(gy - ay, by)
    dz = mi(gz - az, bz)
    rsq = dx * dx + dy * dy + dz * dz
    inside = rsq < 9.0 * sig2
    g = jnp.exp(-rsq / (2.0 * sig2)) * peak
    gm = jnp.where(inside, g, 0.0)
    dens = jnp.sum(jnp.where(inside, g - shift, 0.0), axis=1)
    scale = -1.0 / sig2
    nx = jnp.sum(dx * gm, axis=1) * scale
    ny = jnp.sum(dy * gm, axis=1) * scale
    nz = jnp.sum(dz * gm, axis=1) * scale
    # rolling 8-row output blocks (index_map i -> i//8): each step fills
    # row i%8, bounding resident output VMEM at 8 rows per array
    row = i % 8
    dens_ref[pl.ds(row, 1), :] = dens.reshape(1, r)
    nx_ref[pl.ds(row, 1), :] = nx.reshape(1, r)
    ny_ref[pl.ds(row, 1), :] = ny.reshape(1, r)
    nz_ref[pl.ds(row, 1), :] = nz.reshape(1, r)


@partial(jax.jit, static_argnames=("point_tile",))
def willard_density_points_pallas(
    pos: jnp.ndarray,
    pts: jnp.ndarray,
    box: jnp.ndarray,
    smoothlen: float = 2.4,
    point_tile: int = 128,
):
    """Truncated-shifted Gaussian density + unit normals at arbitrary points.

    pos: (N, 3) atoms; pts: (P, 3) evaluation points; box: (3,).
    Returns (dens (P,), norms (P, 3)), matching
    density.fields.willard_density_points to f32 precision.
    """
    n = pos.shape[0]
    p = pts.shape[0]
    p_pad = -(-p // point_tile) * point_tile
    n_pad = -(-n // 128) * 128
    # pad atoms far outside every cutoff (they fall outside 3 sigma)
    pos_p = jnp.concatenate(
        [pos, jnp.full((n_pad - n, 3), 1.0e7, pos.dtype)], axis=0
    ) if n_pad > n else pos
    pts_p = jnp.pad(pts, ((0, p_pad - p), (0, 0)))
    pos_t = jnp.transpose(pos_p).astype(jnp.float32)
    pts_t = jnp.transpose(pts_p).astype(jnp.float32)

    sig2 = smoothlen * smoothlen
    peak = 1.0 / (2.0 * np.pi * sig2) ** 1.5
    shift = float(np.exp(-4.5)) * peak
    scalars = jnp.array(
        [sig2, shift, peak, box[0], box[1], box[2]], dtype=jnp.float32
    )

    n_tiles = p_pad // point_tile
    n_tiles_pad = -(-n_tiles // 8) * 8
    outs = pl.pallas_call(
        _willard_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((3, point_tile), lambda i, s: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(
                pl.BlockSpec(
                    (8, point_tile), lambda i, s: (i // 8, 0), memory_space=pltpu.VMEM
                )
                for _ in range(4)
            ),
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_tiles_pad, point_tile), jnp.float32) for _ in range(4)
        ),
    )(scalars, pos_t, pts_t)
    dens, nx, ny, nz = (o.reshape(-1)[:p] for o in outs)
    normvec = jnp.stack([nx, ny, nz], axis=-1)
    nn = jnp.linalg.norm(normvec, axis=-1, keepdims=True)
    return dens, normvec / jnp.where(nn > 0, nn, 1.0)
