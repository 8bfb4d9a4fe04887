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
def order_param_q_fused(
    sub: jnp.ndarray,
    pos: jnp.ndarray,
    box: jnp.ndarray,
    low_cut: float = 0.0,
    high_cut: float = 10.0,
    row_block: int = pairs.DEFAULT_ROW_BLOCK,
) -> jnp.ndarray:
    """Fused q computation: distance block -> iterative 4-minimum extraction
    -> pair angles, in one pass per row block.

    Numerically identical to order_param_q but avoids the sort-based
    lax.top_k and the separate neighbor gather: for k = 4 rounds, the row
    minimum of the masked distance block is located, its displacement vector
    extracted with a one-hot reduction, and the slot masked out. This is
    O(4N) VPU work per row instead of an O(N log N) sort, and the
    displacement tensor is consumed in-place — the hot path of the
    benchmark (replaces waterlib.f90:830-862 + water_properties.py:364-388).
    """
    n = pos.shape[0]
    low_sq = low_cut * low_cut
    high_sq = high_cut * high_cut

    def one_block(rows):
        disp = pbc.minimum_image(pos[None, :, :] - rows[:, None, :], box)  # (B,N,3)
        dsq = jnp.sum(disp * disp, axis=-1)  # (B, N)
        valid = (dsq > low_sq) & (dsq <= high_sq)
        count = jnp.sum(valid, axis=-1)
        d = jnp.where(valid, dsq, jnp.inf)
        col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        vecs = []
        oks = []
        for _ in range(4):
            m = jnp.min(d, axis=1, keepdims=True)  # (B,1)
            eq = (d == m) & jnp.isfinite(d)
            # first occurrence on ties
            first_col = jnp.min(jnp.where(eq, col, n), axis=1, keepdims=True)
            first = eq & (col == first_col)
            w = first.astype(disp.dtype)
            v = jnp.einsum("bn,bnd->bd", w, disp)
            vecs.append(v)
            oks.append(jnp.any(first, axis=1))
            d = jnp.where(first, jnp.inf, d)
        v4 = jnp.stack(vecs, axis=1)  # (B, 4, 3)
        ok4 = jnp.stack(oks, axis=1)  # (B, 4)
        norm = jnp.linalg.norm(v4, axis=-1)
        unit = v4 / jnp.where(norm > 0, norm, 1.0)[..., None]
        cosmat = jnp.einsum(
            "bid,bjd->bij", unit, unit, precision=jax.lax.Precision.HIGHEST
        )
        cos_pairs = cosmat[:, _PAIR_I, _PAIR_J]
        pair_ok = ok4[:, _PAIR_I] & ok4[:, _PAIR_J]
        cos_pairs = jnp.where(pair_ok, cos_pairs, -1.0)
        q = 1.0 - (3.0 / 8.0) * jnp.sum((cos_pairs + 1.0 / 3.0) ** 2, axis=-1)
        return jnp.where(count > 0, q, 0.0)

    block = min(row_block, max(1, sub.shape[0]))
    padded, ns = pairs._pad_rows(sub, block)
    q = jax.lax.map(one_block, pairs._block_rows(padded, block))
    return q.reshape(-1)[:ns]


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
