"""Spherical-harmonic neighborhood coefficients (Steinhardt / Keys-Iacovella-
Glotzer order parameters).

TPU-native replacement for `computeSphericalFourierCoeffs`
(/root/reference/structureLibs/water_properties.py:722-786): for each center,
the complex coefficient vector q_lm = mean over shell neighbors of
Y_lm(theta, phi), for l = minDegree..maxDegree, m = -l..l, packed exactly
like the reference into a (Ns, 1+maxDegree-minDegree, 2*maxDegree+1) complex
array (row l holds its 2l+1 values left-aligned, zero-padded).

The per-center Python loop + scipy.special.sph_harm of the reference becomes
one batched associated-Legendre recursion over the fixed-K neighbor tensor.
The device computation is entirely REAL float32 (this TPU backend does not
implement complex arithmetic); real/imaginary parts are assembled into the
complex result on the host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from waterorderlib_tpu.core import pbc
from waterorderlib_tpu.ops import pairs


def _legendre_norms(max_degree: int) -> dict[tuple[int, int], float]:
    norms = {}
    for l in range(max_degree + 1):
        for m in range(0, l + 1):
            lognorm = 0.5 * (
                np.log(2 * l + 1) - np.log(4 * np.pi)
                + float(
                    np.sum(np.log(np.arange(1, l - m + 1)))
                    - np.sum(np.log(np.arange(1, l + m + 1)))
                )
            )
            norms[(l, m)] = float(np.exp(lognorm))
    return norms


def _sph_harm_table_real(polar: jnp.ndarray, azim: jnp.ndarray, max_degree: int):
    """All Y_lm for l = 0..max_degree, m = -l..l, as {(l, m): (re, im)} pairs
    of float32 arrays of polar.shape (Condon-Shortley phase, matching
    scipy.special.sph_harm):
      P_m^m     = (-1)^m (2m-1)!! (1-x^2)^(m/2)
      P_{m+1}^m = x (2m+1) P_m^m
      P_l^m     = ((2l-1) x P_{l-1}^m - (l+m-1) P_{l-2}^m) / (l-m)
      Y_l^{-m}  = (-1)^m conj(Y_l^m)
    """
    x = jnp.cos(polar)
    sroot = jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))
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

    norms = _legendre_norms(max_degree)
    out: dict[tuple[int, int], tuple[jnp.ndarray, jnp.ndarray]] = {}
    for l in range(max_degree + 1):
        for m in range(0, l + 1):
            base = norms[(l, m)] * p[(l, m)]
            re = base * jnp.cos(m * azim)
            im = base * jnp.sin(m * azim)
            out[(l, m)] = (re, im)
            if m > 0:
                sgn = (-1.0) ** m
                out[(l, -m)] = (sgn * re, -sgn * im)
    return out


@partial(jax.jit, static_argnames=("min_degree", "max_degree", "k", "row_block"))
def spherical_fourier_coeffs_real(
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
    """Device core: returns (re (Ns, L, W), im (Ns, L, W), counts (Ns,))
    as float32, with W = 2*max_degree + 1 and rows left-aligned."""
    neigh = pairs.topk_neighbors(
        sub, pos, box, k=k, low_cut=low_cut, high_cut=high_cut, row_block=row_block
    )
    rel = pbc.minimum_image(pos[neigh.idx] - sub[:, None, :], box)  # (Ns, K, 3)
    r = jnp.linalg.norm(rel, axis=-1)
    safe_r = jnp.where(r > 0, r, 1.0)
    polar = jnp.arccos(jnp.clip(rel[..., 2] / safe_r, -1.0, 1.0))  # (Ns, K)
    azim = jnp.arctan2(rel[..., 1], rel[..., 0])

    width = 2 * max_degree + 1
    table = _sph_harm_table_real(polar, azim, max_degree)
    w = neigh.valid.astype(jnp.float32)
    denom = jnp.maximum(neigh.count, 1)
    re_rows, im_rows = [], []
    for l in range(min_degree, max_degree + 1):
        re_cols, im_cols = [], []
        for m in range(-l, l + 1):
            re, im = table[(l, m)]
            re_cols.append(jnp.sum(re * w, axis=-1) / denom)
            im_cols.append(jnp.sum(im * w, axis=-1) / denom)
        zeros = jnp.zeros_like(re_cols[0])
        re_cols += [zeros] * (width - (2 * l + 1))
        im_cols += [zeros] * (width - (2 * l + 1))
        re_rows.append(jnp.stack(re_cols, axis=-1))
        im_rows.append(jnp.stack(im_cols, axis=-1))
    return jnp.stack(re_rows, axis=1), jnp.stack(im_rows, axis=1), neigh.count


def spherical_fourier_coeffs(
    sub, pos, box,
    low_cut: float = 0.0,
    high_cut: float = 3.413,
    min_degree: int = 0,
    max_degree: int = 12,
    k: int = 16,
    row_block: int = pairs.DEFAULT_ROW_BLOCK,
):
    """Reference-shaped API: returns (coeffs (Ns, L, W) complex64 as a host
    numpy array, counts (Ns,)). The complex assembly happens on host because
    this TPU backend lacks complex arithmetic."""
    re, im, counts = spherical_fourier_coeffs_real(
        jnp.asarray(sub), jnp.asarray(pos), jnp.asarray(box),
        low_cut, high_cut, min_degree, max_degree, k, row_block,
    )
    coeffs = np.asarray(re).astype(np.complex64)
    coeffs.imag = np.asarray(im)
    return coeffs, counts


def steinhardt_ql(coeffs, min_degree: int = 0) -> np.ndarray:
    """Rotationally invariant q_l = sqrt(4 pi / (2l+1) * sum_m |q_lm|^2)
    per center from the packed coefficient array (host numpy). (Ns, L)."""
    coeffs = np.asarray(coeffs)
    mag_sq = np.sum(np.abs(coeffs) ** 2, axis=-1)
    l_vals = np.arange(coeffs.shape[1]) + min_degree
    return np.sqrt(4.0 * np.pi / (2.0 * l_vals + 1.0) * mag_sq)
