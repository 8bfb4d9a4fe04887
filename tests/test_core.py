"""Golden tests for core PBC/geometry primitives."""

import numpy as np
import jax.numpy as jnp

from waterorderlib_tpu.core import pbc, geometry
from reference import refimpl


def test_minimum_image_matches_reference(rng):
    disp = rng.uniform(-30, 30, (64, 3))
    box = np.array([10.0, 12.0, 8.0])
    got = np.asarray(pbc.minimum_image(jnp.asarray(disp), jnp.asarray(box)))
    want = refimpl.minimum_image(disp, box)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert np.all(np.abs(got) <= box / 2 + 1e-5)


def test_minimum_image_nonperiodic_axis():
    disp = np.array([[7.0, -9.0, 4.0]])
    box = np.array([5.0, -1.0, 5.0])  # y axis non-periodic
    got = np.asarray(pbc.minimum_image(jnp.asarray(disp), jnp.asarray(box)))
    np.testing.assert_allclose(got, [[2.0, -9.0, -1.0]], atol=1e-6)


def test_reimage(rng):
    pos = rng.uniform(0, 10, (32, 3))
    ref = np.array([5.0, 5.0, 5.0])
    box = np.array([10.0, 10.0, 10.0])
    got = np.asarray(pbc.reimage(jnp.asarray(pos), jnp.asarray(ref), jnp.asarray(box)))
    want = refimpl.reimage(pos, ref, box)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_cos_angle_right_angle():
    p1 = jnp.array([1.0, 0.0, 0.0])
    p2 = jnp.array([0.0, 0.0, 0.0])
    p3 = jnp.array([0.0, 1.0, 0.0])
    assert np.isclose(float(geometry.cos_angle_deg(p1, p2, p3)), 90.0, atol=1e-4)
    # degenerate -> 0 (reference CosAngle3 convention)
    assert float(geometry.cos_angle_deg(p2, p2, p3)) == 0.0


def test_pair_angles_tetrahedron():
    # perfect tetrahedron vertices around origin: all angles = 109.471 deg
    verts = jnp.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]], jnp.float32)
    box = jnp.array([100.0, 100.0, 100.0])
    ang = geometry.pair_angles_deg(jnp.zeros(3), verts, box)
    iu = np.triu_indices(4, k=1)
    np.testing.assert_allclose(np.asarray(ang)[iu], 109.4712, atol=1e-3)


def test_water_orientation():
    # water in the xy plane, dipole along +x
    o = jnp.array([[0.0, 0.0, 0.0]])
    h = jnp.array([[0.8, 0.6, 0.0], [0.8, -0.6, 0.0]])
    box = jnp.array([50.0, 50.0, 50.0])
    dip, plane = geometry.water_orientation(o, h, jnp.array([1.0, 0.0, 0.0]), box)
    assert np.isclose(float(dip[0]), 0.0, atol=1e-3)
    assert np.isclose(float(plane[0]), 90.0, atol=1e-3)
    dipvec = geometry.water_dipoles(o, h, box)
    np.testing.assert_allclose(np.asarray(dipvec[0]), [1.0, 0.0, 0.0], atol=1e-5)


def test_squared_displacement_unwraps():
    box = jnp.array([10.0, 10.0, 10.0])
    prev = jnp.array([[9.5, 0.0, 0.0]])
    pos = jnp.array([[0.5, 0.0, 0.0]])  # crossed the boundary: +1 in x
    ref = jnp.array([[9.5, 0.0, 0.0]])
    sd, new = geometry.squared_displacement(pos, prev, ref, box)
    np.testing.assert_allclose(np.asarray(new), [[10.5, 0.0, 0.0]], atol=1e-5)
    np.testing.assert_allclose(np.asarray(sd), [[1.0, 0.0, 0.0]], atol=1e-5)


def test_sphere_points_unit_norm():
    pts = geometry.sphere_points(100)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0, atol=1e-8)
    # roughly uniform: centroid near origin
    assert np.linalg.norm(pts.mean(axis=0)) < 0.05


def test_centroid_rg():
    pos = jnp.array([[0.0, 0, 0], [2.0, 0, 0]])
    w = jnp.array([1.0, 1.0])
    assert np.allclose(np.asarray(geometry.centroid(pos)), [1, 0, 0])
    assert np.isclose(float(geometry.rg_weights(pos, w)), 1.0)
