"""Pallas TPU kernel: Shrake-Rupley point occlusion as an MXU matmul.

Replaces the (B, P, K) distance tensor of `surface.sasa.
sphere_surface_areas_topk` (the HBM-bound part of SASA — ~131 MB per
256-atom block at P=1000, K=128). Reference: waterlib.f90:90-141,
water_properties.py:59-74, surface_library.py:394-423.

The occlusion test is linear in the unit point: a point c_i + r_i*u_p is
strictly inside sphere j (|c_i + r_i u_p - c_j|^2 < r_j^2) iff

    u_p . delta_j > b_j,   delta_j = c_j - c_i,
    b_j = (|delta_j|^2 + r_i^2 - r_j^2) / (2 r_i)

so the whole (P, K) test per atom is ONE matmul of the static unit-point
matrix against the occluder offsets (MXU) plus a compare and a K-row
reduction, all VMEM-resident — no (B, P, K) tensor ever exists. delta/b
are prepared in XLA (PBC reimaging identical to the XLA path); the kernel
consumes a (K, 8) per-atom block with lanes [dx, dy, dz, b, 0...] and the
unit points as an (8, P) matrix whose rows 3..7 are zero, so the b lane
contributes nothing to the product.

Numerics: the expansion changes rounding at the occlusion boundary, so a
sphere point sitting within ~eps of a sphere surface may flip visibility
vs the quadratic-form path; with P = 10^3 points that moves areas by
O(4 pi r^2 / P) on rare atoms. The parity test bounds the flip count.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from waterorderlib_tpu.core import pbc
from waterorderlib_tpu.ops import pairs


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


def _make_kernel(k: int, pp: int, p_real: int, ba: int):
    def kernel(db_ref, u8_ref, nvis_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, pp), 1)
        real = (lane < p_real).astype(jnp.float32)

        def one_atom(a, _):
            blk = db_ref[a]  # (K, 8): dx dy dz b valid 0 0 0
            # HIGHEST: the MXU's bf16-default product is compared against
            # an exactly-computed threshold b — bf16 rounding flips
            # occlusion-boundary points (measured 0.53 A^2 area error vs
            # the XLA oracle on-chip, round 4, before this fix)
            m = jnp.dot(blk, u8_ref[:], preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            b = blk[:, 3:4]
            valid = blk[:, 4:5] > 0.5
            occ = (m > b) & valid  # (K, PP)
            occ_any = jnp.max(occ.astype(jnp.float32), axis=0, keepdims=True)
            n_occ = jnp.sum(occ_any * real, axis=1, keepdims=True)  # (1, 1)
            row = jnp.concatenate(
                [jnp.float32(p_real) - n_occ, jnp.zeros((1, 7), jnp.float32)],
                axis=1,
            )
            nvis_ref[0, a] = row
            return 0

        jax.lax.fori_loop(0, ba, one_atom, 0)

    return kernel


@partial(jax.jit, static_argnames=("p_real", "ba"))
def _occlusion_pallas(db, u8, p_real, ba=8):
    num, k, _ = db.shape
    n_blk = num // ba
    pp = u8.shape[1]
    nvis = pl.pallas_call(
        _make_kernel(k, pp, p_real, ba),
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((ba, k, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(u8.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ba, 1, 8), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_blk, ba, 1, 8), jnp.float32),
    )(db, u8)
    return nvis.reshape(num, 8)[:, 0]


def sphere_areas_pallas(
    pos: jnp.ndarray,
    radii: jnp.ndarray,
    points: jnp.ndarray,
    box: jnp.ndarray,
    n_exp: int = 10,
    k: int = 128,
    atom_block: int = 256,
):
    """Contract-identical to `surface.sasa.sphere_surface_areas_topk`
    (areas, exposed, ok) up to occlusion-boundary rounding; the `ok`
    certificate (every atom saw at most K in-range candidates) is computed
    identically in XLA."""
    pos = jnp.asarray(pos, jnp.float32)
    radii = jnp.asarray(radii, jnp.float32)
    n = pos.shape[0]
    p_real = int(points.shape[0])
    cutoff = 2.0 * jnp.max(radii)
    nl = pairs.topk_neighbors(
        pos, pos, box, k=k, low_cut=0.0, high_cut=cutoff, row_block=atom_block
    )
    ok = jnp.all(nl.count <= k)
    occ = pos[:, None, :] + pbc.minimum_image(pos[nl.idx] - pos[:, None, :], box)
    delta = occ - pos[:, None, :]  # (N, K, 3)
    dsq = jnp.sum(delta * delta, axis=-1)
    r_i = radii[:, None]
    r_j = radii[nl.idx]
    b = (dsq + r_i * r_i - r_j * r_j) / (2.0 * r_i)  # (N, K)
    db = jnp.zeros((n, k, 8), jnp.float32)
    db = db.at[:, :, 0:3].set(delta)
    db = db.at[:, :, 3].set(jnp.where(nl.valid, b, 3.0e37))
    db = db.at[:, :, 4].set(nl.valid.astype(jnp.float32))
    pad = (-n) % 8
    if pad:
        db = jnp.concatenate([db, jnp.zeros((pad, k, 8), jnp.float32)])
    pp = _pad128(p_real)
    u8 = np.zeros((8, pp), np.float32)
    u8[0:3, :p_real] = np.asarray(points, np.float32).T
    n_vis = _occlusion_pallas(db, jnp.asarray(u8), p_real)[:n]
    areas = 4.0 * jnp.pi * radii**2 * n_vis / p_real
    return areas, n_vis >= n_exp, ok
