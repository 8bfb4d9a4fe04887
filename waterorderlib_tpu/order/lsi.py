"""Local structure index (LSI) of Shiratani & Sasai.

TPU-native replacement for `getLSI`
(/root/reference/structureLibs/water_properties.py:252-311): per center,
take all neighbors in the (low, high] shell plus the single nearest neighbor
beyond `high` (searched in (high, high+3.7]), sort the minimum-image
distances, and return the population variance of the consecutive gaps.

Reference quirks reproduced deliberately:
- the "next" neighbor beyond the shell is chosen by argmin of the *raw*
  (non-imaged) distance (wp:289-291), even though its membership mask and
  its contribution to the distance list use minimum-image distances;
- centers need >= 2 in-shell neighbors AND >= 1 next-shell neighbor,
  otherwise no LSI value is produced (we return valid=False for them).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from waterorderlib_tpu.core import pbc
from waterorderlib_tpu.ops import pairs


class LSIResult(NamedTuple):
    lsi: jnp.ndarray  # (Ns,) LSI values (0 where invalid)
    valid: jnp.ndarray  # (Ns,) mask of centers with a defined LSI
    count: jnp.ndarray  # (Ns,) in-shell neighbor count (= number of gaps)


@partial(jax.jit, static_argnames=("k", "row_block"))
def lsi(
    sub: jnp.ndarray,
    pos: jnp.ndarray,
    box: jnp.ndarray,
    low_cut: float = 0.0,
    high_cut: float = 3.7,
    k: int = 16,
    row_block: int = pairs.DEFAULT_ROW_BLOCK,
) -> LSIResult:
    near = pairs.topk_neighbors(
        sub, pos, box, k=k, low_cut=low_cut, high_cut=high_cut, row_block=row_block
    )
    nxt = pairs.topk_neighbors(
        sub, pos, box, k=k, low_cut=high_cut, high_cut=high_cut + 3.7, row_block=row_block
    )
    # Reference picks the next-shell member minimizing the RAW distance
    # (wp:289-291) but then uses its minimum-image distance in the list.
    nxt_pos = pos[nxt.idx]  # (Ns, K, 3)
    raw_d = jnp.linalg.norm(nxt_pos - sub[:, None, :], axis=-1)
    raw_d = jnp.where(nxt.valid, raw_d, jnp.inf)
    pick = jnp.argmin(raw_d, axis=-1)  # (Ns,)
    picked_pos = jnp.take_along_axis(nxt_pos, pick[:, None, None], axis=1)[:, 0, :]
    next_dist = pbc.distance(sub, picked_pos, box)
    has_next = nxt.count > 0

    # Combined sorted distance list: near distances are already ascending
    # (+inf padded); appending the next-shell distance and re-sorting puts it
    # exactly after the in-shell entries.
    combined = jnp.concatenate(
        [near.dist, jnp.where(has_next, next_dist, jnp.inf)[:, None]], axis=-1
    )
    combined = jnp.sort(combined, axis=-1)  # (Ns, K+1)
    gaps = combined[..., 1:] - combined[..., :-1]  # (Ns, K)
    n_gaps = near.count  # c near + 1 next -> c gaps
    slot = jnp.arange(k)[None, :]
    gap_ok = slot < n_gaps[:, None]
    gaps = jnp.where(gap_ok, gaps, 0.0)
    denom = jnp.maximum(n_gaps, 1)
    mean = jnp.sum(gaps, axis=-1) / denom
    var = jnp.sum(jnp.where(gap_ok, (gaps - mean[:, None]) ** 2, 0.0), axis=-1) / denom
    ok = (near.count > 1) & has_next
    return LSIResult(jnp.where(ok, var, 0.0), ok, jnp.where(ok, n_gaps, 0))
