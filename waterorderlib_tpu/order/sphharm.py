"""Spherical-harmonic neighborhood coefficients (Steinhardt / Keys-Iacovella-
Glotzer order parameters).

TPU-native replacement for `computeSphericalFourierCoeffs`
(/root/reference/structureLibs/water_properties.py:722-786): for each center,
the complex coefficient vector q_lm = mean over shell neighbors of
Y_lm(theta, phi), for l = minDegree..maxDegree, m = -l..l, packed exactly
like the reference into a (Ns, 1+maxDegree-minDegree, 2*maxDegree+1) complex
array (row l holds its 2l+1 values left-aligned, zero-padded).

The per-center Python loop + scipy.special.sph_harm of the reference becomes
one batched `sph_harm_y` evaluation over the fixed-K neighbor tensor.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from waterorderlib_tpu.core import pbc
from waterorderlib_tpu.ops import pairs


def _sph_harm_table(polar: jnp.ndarray, azim: jnp.ndarray, max_degree: int):
    """All Y_lm(theta, phi) for l = 0..max_degree, m = -l..l, as a dict
    {(l, m): array of polar.shape} (complex64).

    Batched associated-Legendre recursion (Condon-Shortley phase included,
    matching scipy.special.sph_harm):
      P_m^m     = (-1)^m (2m-1)!! (1-x^2)^(m/2)
      P_{m+1}^m = x (2m+1) P_m^m
      P_l^m     = ((2l-1) x P_{l-1}^m - (l+m-1) P_{l-2}^m) / (l-m)
    and Y_l^{-m} = (-1)^m conj(Y_l^m). jax's own sph_harm_y does not
    broadcast over an (l, m) table, hence this implementation.
    """
    x = jnp.cos(polar)
    sroot = jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))
    # legendre[m][l] with l >= m
    p: dict[tuple[int, int], jnp.ndarray] = {}
    for m in range(max_degree + 1):
        if m == 0:
            pmm = jnp.ones_like(x)
        else:
            dfact = float(np.prod(np.arange(1, 2 * m, 2)))  # (2m-1)!!
            pmm = ((-1.0) ** m) * dfact * sroot**m
        p[(m, m)] = pmm
        if m + 1 <= max_degree:
            p[(m + 1, m)] = x * (2 * m + 1) * pmm
        for l in range(m + 2, max_degree + 1):
            p[(l, m)] = ((2 * l - 1) * x * p[(l - 1, m)] - (l + m - 1) * p[(l - 2, m)]) / (l - m)

    out: dict[tuple[int, int], jnp.ndarray] = {}
    for l in range(max_degree + 1):
        for m in range(0, l + 1):
            lognorm = 0.5 * (
                np.log(2 * l + 1) - np.log(4 * np.pi)
                + float(
                    np.sum(np.log(np.arange(1, l - m + 1)))
                    - np.sum(np.log(np.arange(1, l + m + 1)))
                )
            )
            norm = float(np.exp(lognorm))
            ylm = norm * p[(l, m)] * jnp.exp(1j * m * azim)
            out[(l, m)] = ylm.astype(jnp.complex64)
            if m > 0:
                out[(l, -m)] = (((-1.0) ** m) * jnp.conj(ylm)).astype(jnp.complex64)
    return out


@partial(jax.jit, static_argnames=("min_degree", "max_degree", "k", "row_block"))
def spherical_fourier_coeffs(
    sub: jnp.ndarray,
    pos: jnp.ndarray,
    box: jnp.ndarray,
    low_cut: float = 0.0,
    high_cut: float = 3.413,
    min_degree: int = 0,
    max_degree: int = 12,
    k: int = 16,
    row_block: int = pairs.DEFAULT_ROW_BLOCK,
):
    """Returns (coeffs (Ns, L, 2*max_degree+1) complex64, counts (Ns,))."""
    neigh = pairs.topk_neighbors(
        sub, pos, box, k=k, low_cut=low_cut, high_cut=high_cut, row_block=row_block
    )
    rel = pbc.minimum_image(pos[neigh.idx] - sub[:, None, :], box)  # (Ns, K, 3)
    r = jnp.linalg.norm(rel, axis=-1)
    safe_r = jnp.where(r > 0, r, 1.0)
    polar = jnp.arccos(jnp.clip(rel[..., 2] / safe_r, -1.0, 1.0))  # (Ns, K)
    azim = jnp.arctan2(rel[..., 1], rel[..., 0])

    n_l = 1 + max_degree - min_degree
    width = 2 * max_degree + 1
    table = _sph_harm_table(polar, azim, max_degree)  # {(l,m): (Ns, K)}
    w = neigh.valid.astype(jnp.float32)
    denom = jnp.maximum(neigh.count, 1)
    rows = []
    for l in range(min_degree, max_degree + 1):
        cols = [jnp.sum(table[(l, m)] * w, axis=-1) / denom for m in range(-l, l + 1)]
        cols += [jnp.zeros_like(cols[0])] * (width - (2 * l + 1))
        rows.append(jnp.stack(cols, axis=-1))  # (Ns, width)
    coeffs = jnp.stack(rows, axis=1)  # (Ns, n_l, width)
    return coeffs, neigh.count


def steinhardt_ql(coeffs: jnp.ndarray, min_degree: int = 0) -> jnp.ndarray:
    """Rotationally invariant q_l = sqrt(4 pi / (2l+1) * sum_m |q_lm|^2)
    per center from the packed coefficient array. Returns (Ns, L)."""
    mag_sq = jnp.sum(jnp.abs(coeffs) ** 2, axis=-1)  # (Ns, L)
    l_vals = jnp.arange(coeffs.shape[1]) + min_degree
    return jnp.sqrt(4.0 * jnp.pi / (2.0 * l_vals + 1.0) * mag_sq)
