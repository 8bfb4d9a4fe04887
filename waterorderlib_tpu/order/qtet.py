"""Errington-Debenedetti tetrahedral order parameter q.

TPU-native replacement for `getOrderParamq`
(/root/reference/structureLibs/water_properties.py:344-391). The reference
loops over waters in Python, calling f2py `reimage`/`tetracosang` per center;
here the 4-nearest-neighbor search is a blocked on-device top-k and the
6 pair angles are computed for all centers at once.

Padding semantics match the reference exactly (wp:379-384): with c neighbors
inside the (low, high] shell, the 6 angle slots are filled with the
C(min(c,4),2) real angles among the min(c,4) nearest neighbors and padded to
6 with 180-degree angles (cos = -1); centers with c = 0 get q = 0 (which is
also the value the all-180 padding yields, so one uniform rule applies).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from waterorderlib_tpu.core import pbc
from waterorderlib_tpu.ops import pairs

_PAIR_I, _PAIR_J = jnp.triu_indices(4, k=1)  # the 6 neighbor pairs


def q_from_neighbors(
    sub: jnp.ndarray, neigh: pairs.NeighborList, pos: jnp.ndarray, box: jnp.ndarray
) -> jnp.ndarray:
    """q per center given a (Ns, >=4) NeighborList (ascending distance)."""
    idx4 = neigh.idx[..., :4]
    ok4 = neigh.valid[..., :4]
    npos = pos[idx4]  # (Ns, 4, 3)
    rel = pbc.minimum_image(npos - sub[..., None, :], box)
    norm = jnp.linalg.norm(rel, axis=-1)
    unit = rel / jnp.where(norm > 0, norm, 1.0)[..., None]
    cosmat = jnp.einsum("...id,...jd->...ij", unit, unit, precision=jax.lax.Precision.HIGHEST)
    cos_pairs = cosmat[..., _PAIR_I, _PAIR_J]  # (Ns, 6)
    pair_ok = ok4[..., _PAIR_I] & ok4[..., _PAIR_J]
    cos_pairs = jnp.where(pair_ok, cos_pairs, -1.0)
    q = 1.0 - (3.0 / 8.0) * jnp.sum((cos_pairs + 1.0 / 3.0) ** 2, axis=-1)
    return jnp.where(neigh.count > 0, q, 0.0)


@partial(jax.jit, static_argnames=("row_block",))
def order_param_q(
    sub: jnp.ndarray,
    pos: jnp.ndarray,
    box: jnp.ndarray,
    low_cut: float = 0.0,
    high_cut: float = 10.0,
    row_block: int = pairs.DEFAULT_ROW_BLOCK,
) -> jnp.ndarray:
    """q for each row of `sub` against candidate positions `pos`.

    Matches getOrderParamq(subPos, Pos, BoxDims, lowCut, highCut); returns
    (Ns,) float values in [-3, 1] (1 = perfect tetrahedron).
    """
    neigh = pairs.topk_neighbors(
        sub, pos, box, k=4, low_cut=low_cut, high_cut=high_cut, row_block=row_block
    )
    return q_from_neighbors(sub, neigh, pos, box)
