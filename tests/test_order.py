"""Golden tests for order parameters (q_tet, 3-body angles, LSI, psi6)."""

import numpy as np
import jax.numpy as jnp

from waterorderlib_tpu.order import qtet, angles, lsi, psi6
from reference import refimpl


def _j(x):
    return jnp.asarray(x, jnp.float32)


def test_q_perfect_tetrahedron():
    verts = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]], float) * 1.5
    pos = np.vstack([[0.0, 0.0, 0.0], verts])
    box = np.array([100.0, 100.0, 100.0])
    q = np.asarray(qtet.order_param_q(_j(pos[:1]), _j(pos), _j(box), high_cut=5.0))
    assert np.isclose(q[0], 1.0, atol=1e-5)


def test_q_matches_reference(small_box):
    pos, box = small_box
    want = refimpl.order_param_q(pos, pos, box, low=0.0, high=10.0)
    # f64 parity of this kernel is ~4e-14 (verified); at f32 the angle
    # arithmetic carries ~1e-3 absolute noise into q.
    got = np.asarray(qtet.order_param_q(_j(pos), _j(pos), _j(box), high_cut=10.0, row_block=64))
    np.testing.assert_allclose(got, want, atol=8e-3)


def test_q_padding_rules():
    # 2 neighbors at right angle -> 1 real angle + 5 pads of 180 deg
    pos = np.array([[0.0, 0, 0], [2.0, 0, 0], [0, 2.0, 0]])
    box = np.array([100.0, 100.0, 100.0])
    want = refimpl.order_param_q(pos[:1], pos, box, high=5.0)
    got = np.asarray(qtet.order_param_q(_j(pos[:1]), _j(pos), _j(box), high_cut=5.0))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # isolated center -> q = 0
    got0 = np.asarray(qtet.order_param_q(_j(pos[:1]), _j(pos[:1]), _j(box), high_cut=5.0))
    assert got0[0] == 0.0


def test_neighbor_angles_match_reference(small_box):
    pos, box = small_box
    want_angs, want_counts = refimpl.get_cos_angs(pos, pos, box, 0.0, 3.413)
    aset = angles.neighbor_angles(_j(pos), _j(pos), _j(box), 0.0, 3.413, k=16, row_block=64)
    got_counts = np.asarray(aset.count)
    np.testing.assert_array_equal(got_counts, want_counts.astype(int))
    got = np.sort(np.asarray(aset.ang)[np.asarray(aset.valid)])
    # f64 parity of this kernel is ~1e-13 deg (verified); f32 positions move
    # near-colinear angles by up to ~0.1 deg.
    np.testing.assert_allclose(got, np.sort(want_angs), atol=0.15)


def test_tetrahedral_metrics_match(small_box):
    pos, box = small_box
    want_angs, _ = refimpl.get_cos_angs(pos, pos, box, 0.0, 3.413)
    hist_w, _, frac_w, avg_w, var_w, ent_w = refimpl.tetrahedral_metrics(want_angs)
    aset = angles.neighbor_angles(_j(pos), _j(pos), _j(box), 0.0, 3.413, k=16, row_block=64)
    m = angles.tetrahedral_metrics(aset)
    assert int(np.asarray(m.n_angles)) == len(want_angs)
    # histograms may differ by a couple of boundary flips at f32
    assert np.abs(np.asarray(m.hist) - hist_w).sum() <= 24
    assert np.isclose(float(m.frac_tet), frac_w, atol=3e-3)
    assert np.isclose(float(m.avg_cos), avg_w, atol=1e-3)
    assert np.isclose(float(m.var_cos), var_w, atol=1e-3)
    assert np.isclose(float(m.entropy), ent_w, atol=5e-3)


def test_lsi_matches_reference(small_box):
    pos, box = small_box
    want_vals, want_valid, want_counts = refimpl.lsi(pos, pos, box)
    res = lsi.lsi(_j(pos), _j(pos), _j(box), k=24, row_block=64)
    got_valid = np.asarray(res.valid)
    np.testing.assert_array_equal(got_valid, want_valid)
    np.testing.assert_array_equal(np.asarray(res.count)[got_valid], want_counts[want_valid])
    np.testing.assert_allclose(np.asarray(res.lsi)[got_valid], want_vals, atol=1e-4)


def test_psi6_matches_reference(small_box):
    pos, box = small_box
    # use a modest cutoff so neighbor counts stay below K
    want = refimpl.order_param_psi(pos, pos, box, low=0.0, high=4.5)
    # f64 parity ~1e-15 (verified); f32 tolerance below
    got = np.asarray(psi6.order_param_psi(_j(pos), _j(pos), _j(box), high_cut=4.5, k=32, row_block=64))
    np.testing.assert_allclose(got, want, atol=6e-3)


def test_psi6_hexagonal_lattice():
    # perfect hexagonal arrangement -> psi6 = 1
    theta = np.arange(6) * np.pi / 3
    ring = np.stack([np.cos(theta), np.sin(theta), np.zeros(6)], axis=1) * 2.0
    pos = np.vstack([[0.0, 0.0, 0.0], ring])
    box = np.array([100.0, 100.0, 100.0])
    got = np.asarray(psi6.order_param_psi(_j(pos[:1]), _j(pos), _j(box), high_cut=2.5, k=8))
    assert np.isclose(got[0], 1.0, atol=1e-4)
