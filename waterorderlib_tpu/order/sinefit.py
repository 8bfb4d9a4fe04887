"""Sine-series expansion of angle distributions and reference-distribution
fitting.

Replaces `findSineCoeffs`, `distFromCoeffs` and `fitDist`
(/root/reference/structureLibs/water_properties.py:435-575). The coefficient
transform and series evaluation are jnp (device, vmappable over frames); the
constrained SLSQP / brute-force fit stays host scipy (it is a tiny
optimization over a handful of parameters).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy import optimize


def find_sine_coeffs(all_angs, n_order: int = 180, normalize: bool = False):
    """Sine coefficients of an angle sample over period [0, pi]
    (wp:435-457). Angles with any value > pi are assumed degrees. Returns
    (n_order, 2): column 0 is k, column 1 the coefficient."""
    angs = jnp.asarray(all_angs)
    angs = jnp.where(jnp.max(angs) > jnp.pi, angs * jnp.pi / 180.0, angs)
    k = jnp.arange(1, n_order + 1)
    coeff = jnp.sqrt(2.0 / jnp.pi) * jnp.sum(
        jnp.sin(k[:, None] * angs[None, :]), axis=1
    )
    if normalize:
        coeff = coeff / angs.shape[0]
    return jnp.stack([k.astype(coeff.dtype), coeff], axis=1)


def dist_from_coeffs(coeffs, ang_vals=None, n_order: int = 60):
    """Normalized distribution from sine coefficients (wp:460-482).
    ang_vals in degrees (default 0..180 step 0.01)."""
    if ang_vals is None:
        ang_vals = np.arange(0.0, 180.0, 0.01)
    ang_vals = jnp.asarray(ang_vals)
    rad = ang_vals * jnp.pi / 180.0
    coeffs = jnp.asarray(coeffs)[:n_order]
    k = jnp.arange(1, n_order + 1)
    adist = jnp.sum(coeffs[:, None] * jnp.sin(k[:, None] * rad[None, :]), axis=0)
    odd = (k % 2) != 0
    normfac = jnp.sum(jnp.where(odd, coeffs * 2.0 / k, 0.0))
    return adist / (normfac * (ang_vals[1] - ang_vals[0]))


def fit_dist(ref_dists: np.ndarray, dist: np.ndarray, brute_ns: int = 200):
    """Fit `dist` as a convex combination of reference distributions
    (wp:485-575): SLSQP from multiple starts with sum-to-one constraint and
    [0,1] bounds, then a brute-force grid scan whose minimum is returned.
    Returns (fit_params, res_sq, res_signed)."""
    ref_dists = np.asarray(ref_dists, float)
    dist = np.asarray(dist, float)
    tolf = 1.0e-12
    n_ref = ref_dists.shape[0]
    init = np.vstack([np.eye(n_ref), np.ones(n_ref) / n_ref])

    def func_min(vals, *withcon):
        f = np.sum((np.dot(vals, ref_dists) - dist) ** 2)
        if withcon:
            f = f + (np.sum(vals) - 1.0) ** 2
        return f

    def jac(vals):
        return np.dot(ref_dists, 2.0 * (np.dot(vals, ref_dists) - dist))

    cons = (
        {"type": "eq", "fun": lambda x: np.sum(x) - 1.0, "jac": lambda x: np.ones(len(x))},
    )
    bnds = [(0.0, 1.0)] * n_ref
    res_sq = np.zeros((ref_dists.shape[1], init.shape[0]))
    for i, params in enumerate(init):
        if n_ref == 1:
            info = optimize.minimize(
                func_min, params, jac=jac, method="SLSQP", bounds=bnds,
                options={"ftol": tolf},
            )
        else:
            info = optimize.minimize(
                func_min, params, jac=jac, method="SLSQP", constraints=cons,
                bounds=bnds, options={"ftol": tolf},
            )
        res_sq[:, i] = (np.dot(info.x, ref_dists) - dist) ** 2

    if n_ref == 1:
        brute = optimize.brute(
            func_min, tuple(bnds), Ns=brute_ns, finish=None, full_output=True, disp=False
        )
    else:
        brute = optimize.brute(
            func_min, tuple(bnds), args=(1,), Ns=brute_ns, finish=None,
            full_output=True, disp=False,
        )
    fit_params = np.atleast_1d(brute[0])
    res_signed = np.dot(fit_params, ref_dists) - dist
    return fit_params, res_sq, res_signed
