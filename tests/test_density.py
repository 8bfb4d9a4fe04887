"""Golden tests for density/grid kernels."""

import numpy as np
import jax.numpy as jnp

from waterorderlib_tpu.density import fields


def _j(x):
    return jnp.asarray(x, jnp.float32)


def test_willard_single_gaussian():
    # one atom: density at distance 0 = peak - shift; at 3 sigma = 0
    box = np.array([100.0, 100.0, 100.0])
    pos = np.array([[50.0, 50.0, 50.0]])
    sig = 2.4
    pts = np.array([[50.0, 50.0, 50.0], [50.0 + 3 * sig + 0.01, 50.0, 50.0]])
    dens, norms = fields.willard_density_points(_j(pos), _j(pts), _j(box), sig)
    peak = 1.0 / (2 * np.pi * sig**2) ** 1.5
    shift = np.exp(-4.5) * peak
    assert np.isclose(float(dens[0]), peak - shift, rtol=1e-4)
    assert float(dens[1]) == 0.0


def test_willard_normal_direction():
    # two points offset from the atom: normal points from point toward atom
    # (direction of increasing density)
    box = np.array([100.0, 100.0, 100.0])
    pos = np.array([[50.0, 50.0, 50.0]])
    pts = np.array([[53.0, 50.0, 50.0]])
    dens, norms = fields.willard_density_points(_j(pos), _j(pts), _j(box), 2.4)
    assert float(norms[0, 0]) < -0.99  # unit vector along -x


def test_willard_field_matches_points():
    rs = np.random.RandomState(0)
    box = np.array([12.0, 12.0, 12.0])
    pos = rs.uniform(0, 12, (30, 3))
    g = np.linspace(0, 12, 7)[:-1]
    dens_f, norms_f = fields.willard_density_field(
        _j(pos), _j(g), _j(g), _j(g), _j(box), 2.4, nx=6, ny=6, nz=6
    )
    pts = fields.make_grid(g, g, g)
    dens_p, norms_p = fields.willard_density_points(_j(pos), _j(pts), _j(box), 2.4)
    np.testing.assert_allclose(np.asarray(dens_f).ravel(), np.asarray(dens_p), atol=1e-6)


def test_density_field_counts():
    # single atom sitting exactly on one grid point
    box = np.array([10.0, 10.0, 10.0])
    pos = np.array([[2.0, 2.0, 2.0]])
    g = np.arange(0.0, 10.0, 2.0)
    dens = fields.density_field(_j(pos), _j(g), _j(g), _j(g), _j(box), nx=5, ny=5, nz=5)
    dens = np.asarray(dens)
    assert np.isclose(dens[1, 1, 1], 1.0 / 8.0)  # count 1 / binwidth^3
    assert dens.sum() * 8 >= 1.0  # inclusive edges may multi-count boundaries


def test_probe_grid():
    box = np.array([20.0, 20.0, 20.0])
    pos = np.array([[1.0, 0.0, 0.0], [19.5, 0.0, 0.0], [5.0, 5.0, 5.0]])
    grid = np.array([[0.0, 0.0, 0.0]])
    # PBC: atom at 19.5 is only 0.5 away through the boundary
    counts = fields.probe_grid(_j(pos), _j(grid), _j(box), 1.1)
    assert int(counts[0]) == 2


def test_bin_on_grid_inscribed_sphere():
    edges = np.arange(0.0, 4.1, 1.0)  # 4 cells, width 1, centers at .5,...
    # one point at a cell center (inside inscribed sphere), one at a corner
    pos = np.array([[0.5, 0.5, 0.5], [0.99, 0.99, 0.99]])
    hist = fields.bin_on_grid(_j(pos), _j(edges), _j(edges), _j(edges), 5, 5, 5)
    hist = np.asarray(hist)
    assert hist[0, 0, 0] == 1  # corner point is outside the inscribed sphere
    assert hist.sum() == 1


def test_interface_water():
    box = np.array([50.0, 50.0, 50.0])
    # flat "interface": two points on z=10 plane with +z normals
    grid = np.array([[10.0, 10.0, 10.0], [20.0, 10.0, 10.0]])
    norm = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    wat = np.array([[10.0, 10.0, 12.0], [20.0, 10.0, 8.0], [20.0, 10.0, 25.0]])
    res = fields.interface_water(_j(wat), _j(grid), _j(norm), _j(box), cutoff=5.0)
    np.testing.assert_array_equal(np.asarray(res.wat_close), [0, 1, 1])
    np.testing.assert_allclose(np.asarray(res.wat_dists), [2.0, -2.0, 15.0], atol=1e-5)
    assert int(res.num_water) == 2
    assert int(np.asarray(res.surf_close)[0]) == 0
