"""On-device histograms with numpy-compatible bin semantics.

Every reference driver ends in `np.histogram(vals, bins=N, range=[lo, hi])`
over a ragged concatenated value list (e.g. orderParam_lib.py:1494-1497).
Here values come with validity masks instead of ragged shapes, and the
histogram is a fixed-shape scatter-add that runs inside jit, vmaps over
populations/frames, and sums across shards with `psum`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_bins",))
def masked_histogram(
    values: jnp.ndarray,
    mask: jnp.ndarray,
    n_bins: int,
    lo: float,
    hi: float,
) -> jnp.ndarray:
    """Histogram of `values[mask]` over [lo, hi] with np.histogram semantics:
    n_bins equal bins, left-inclusive, the final bin right-inclusive; values
    outside [lo, hi] are dropped."""
    width = (hi - lo) / n_bins
    idx = jnp.floor((values - lo) / width).astype(jnp.int32)
    idx = jnp.where(values == hi, n_bins - 1, idx)
    ok = mask & (values >= lo) & (values <= hi)
    idx = jnp.where(ok, jnp.clip(idx, 0, n_bins - 1), n_bins)
    flat_idx = idx.reshape(-1)
    flat_ok = ok.reshape(-1).astype(jnp.float32)
    if flat_idx.shape[0] * n_bins <= (1 << 26):
        # compare-reduce path: a (M, n_bins) equality matrix reduced over M
        # is pure VPU work and far faster on TPU than a scatter-add
        bins = jax.lax.broadcasted_iota(jnp.int32, (1, n_bins), 1)
        eq = (flat_idx[:, None] == bins).astype(jnp.float32)
        return jnp.sum(eq * flat_ok[:, None], axis=0)
    return jnp.zeros(n_bins + 1, jnp.float32).at[flat_idx].add(flat_ok)[:n_bins]


def bin_centers(n_bins: int, lo: float, hi: float):
    """Midpoints 0.5*(edges[:-1]+edges[1:]) as the drivers print them."""
    import numpy as np

    edges = np.linspace(lo, hi, n_bins + 1)
    return 0.5 * (edges[:-1] + edges[1:])


def masked_mean_var(values: jnp.ndarray, mask: jnp.ndarray, axis=-1):
    """(mean, population variance) over masked entries; NaN when empty,
    matching np.mean/np.var on an empty selection."""
    m = mask.astype(values.dtype)
    n = jnp.sum(m, axis=axis)
    safe_n = jnp.maximum(n, 1.0)
    mean = jnp.sum(values * m, axis=axis) / safe_n
    var = jnp.sum(m * (values - jnp.expand_dims(mean, axis)) ** 2, axis=axis) / safe_n
    nan = jnp.float32(jnp.nan)
    return jnp.where(n > 0, mean, nan), jnp.where(n > 0, var, nan)
