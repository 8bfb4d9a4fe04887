"""Golden tests for the blocked pair engine vs the numpy oracle."""

import numpy as np
import jax.numpy as jnp

from waterorderlib_tpu.ops import pairs
from reference import refimpl


def test_neighbor_mask_matches(small_box):
    pos, box = small_box
    got = np.asarray(pairs.neighbor_mask(jnp.asarray(pos, jnp.float32), jnp.asarray(pos, jnp.float32), jnp.asarray(box, jnp.float32), 0.0, 3.413))
    want = refimpl.all_near_neighbors(pos, box, 0.0, 3.413)
    # f32 vs f64 can flip pairs that sit exactly on the cutoff; allow <=0.1% mismatch
    mismatch = np.mean(got != want)
    assert mismatch < 1e-3, mismatch


def test_neighbor_mask_subset(small_box):
    pos, box = small_box
    sub = pos[:37]
    got = np.asarray(pairs.neighbor_mask(jnp.asarray(sub, jnp.float32), jnp.asarray(pos, jnp.float32), jnp.asarray(box, jnp.float32), 1.0, 4.0))
    want = refimpl.near_neighbors(sub, pos, box, 1.0, 4.0)
    assert np.mean(got != want) < 1e-3


def test_topk_neighbors(small_box):
    pos, box = small_box
    posj = jnp.asarray(pos, jnp.float32)
    boxj = jnp.asarray(box, jnp.float32)
    nl = pairs.topk_neighbors(posj, posj, boxj, k=6, low_cut=0.0, high_cut=3.7, row_block=64)
    nn = refimpl.all_near_neighbors(pos, box, 0.0, 3.7)
    dsq = refimpl.dist_sq_matrix(pos, pos, box)
    for i in range(len(pos)):
        c = int(nn[i].sum())
        assert int(nl.count[i]) == c
        want_d = np.sort(np.sqrt(dsq[i][nn[i]]))[: min(c, 6)]
        got_d = np.asarray(nl.dist[i][np.asarray(nl.valid[i])])
        np.testing.assert_allclose(got_d, want_d, atol=1e-4)
        # indices actually point at atoms at those distances
        got_idx = np.asarray(nl.idx[i][np.asarray(nl.valid[i])])
        np.testing.assert_allclose(
            np.sqrt(dsq[i][got_idx]), got_d, atol=1e-4
        )


def test_topk_unbounded_cutoff(small_box):
    pos, box = small_box
    posj = jnp.asarray(pos[:16], jnp.float32)
    allj = jnp.asarray(pos, jnp.float32)
    nl = pairs.topk_neighbors(posj, allj, jnp.asarray(box, jnp.float32), k=4)
    assert bool(np.all(np.asarray(nl.valid)))
    assert int(np.asarray(nl.count).min()) == len(pos) - 1


def test_distance_histogram_cross(small_box):
    pos, box = small_box
    a, b = pos[:50], pos[50:]
    got = np.asarray(
        pairs.distance_histogram(
            jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32),
            jnp.asarray(box, jnp.float32), 0.1, 90, same=False, row_block=16,
        )
    )
    want = refimpl.radial_dist_counts(b, a, box, 0.1, 90, same=False)
    assert abs(got.sum() - want.sum()) <= want.sum() * 1e-3
    # at most a few boundary-bin flips from f32 rounding
    assert np.abs(got - want).sum() <= 6


def test_distance_histogram_same(small_box):
    pos, box = small_box
    got = np.asarray(
        pairs.distance_histogram(
            jnp.asarray(pos, jnp.float32), jnp.asarray(pos, jnp.float32),
            jnp.asarray(box, jnp.float32), 0.1, 93, same=True, row_block=100,
        )
    )
    want = refimpl.radial_dist_counts(pos, pos, box, 0.1, 93, same=True)
    assert got.sum() == want.sum()
    assert np.abs(got - want).sum() <= 6


def test_radial_dist_normalization(small_box):
    pos, box = small_box
    g = np.asarray(
        pairs.radial_dist_same(jnp.asarray(pos, jnp.float32), jnp.asarray(box, jnp.float32), 0.1, 90, bulk_dens=1.0)
    )
    want = refimpl.radial_dist(pos, pos, box, 0.1, 90, bulk_dens=1.0, same=True)
    np.testing.assert_allclose(g, want, atol=2e-2)


def test_solvent_shells():
    solute = np.zeros((1, 3))
    solvent = np.array([[1.0, 0, 0], [3.0, 0, 0], [9.0, 0, 0]])
    first, second = pairs.solvent_shells(jnp.asarray(solute), jnp.asarray(solvent), 2.0, 5.0)
    assert list(np.asarray(first)) == [True, False, False]
    assert list(np.asarray(second)) == [False, True, False]


def test_triplet_histogram_3d():
    # bin widths chosen so no value sits on a bin edge
    pos = np.array([[0.0, 0, 0], [2.0, 0, 0], [0.0, 2.0, 0]])
    box = np.array([100.0, 100.0, 100.0])
    h = np.asarray(
        pairs.triplet_histogram_3d(
            jnp.asarray(pos, jnp.float32), jnp.asarray(box, jnp.float32),
            0.75, 6, 37.0, 5,
        )
    )
    # center 0: d=2,2 -> bin ceil(2/.75)-1=2; angle 90 -> ceil(90/37)-1=2
    assert h[2, 2, 2] == 1
    # centers 1 and 2 (symmetric): d=2 (bin 2), d=2.828 (bin 3), angle 45
    assert h[2, 3, 1] == 2
    assert h.sum() == 3
