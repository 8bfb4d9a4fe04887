"""Tests for DOFs, spherical harmonics, sine fits, orientation, legacy
H-bonds, PDB export, plane RDF, and the MSD driver."""

import numpy as np
import jax.numpy as jnp

from waterorderlib_tpu.core import dof
from waterorderlib_tpu.order import sphharm, sinefit, orientation
from waterorderlib_tpu.hbonds import legacy
from waterorderlib_tpu.ops import pairs
from waterorderlib_tpu.io.synthetic import make_water_box
from waterorderlib_tpu.io.pdb import write_pdb, write_labeled_snapshot
from waterorderlib_tpu.drivers import msd as msd_mod


def test_one_body_dofs():
    o = jnp.array([1.0, 2.0, 3.0])
    h1 = jnp.array([1.8, 2.6, 3.0])
    h2 = jnp.array([1.8, 1.4, 3.0])
    v = np.asarray(dof.one_body_dofs(o, h1, h2))
    np.testing.assert_allclose(v[:3], [1, 2, 3], atol=1e-6)
    # dipole along +x: azimuth 0, polar 90 deg
    assert np.isclose(v[3], 0.0, atol=1e-6)
    assert np.isclose(v[4], np.pi / 2, atol=1e-6)


def test_two_body_dofs_distance():
    o1 = jnp.zeros(3)
    h11 = jnp.array([0.76, 0.59, 0.0])
    h12 = jnp.array([-0.76, 0.59, 0.0])
    o2 = jnp.array([0.0, 3.0, 0.0])
    h21 = jnp.array([0.76, 3.59, 0.0])
    h22 = jnp.array([-0.76, 3.59, 0.0])
    v = np.asarray(dof.two_body_dofs(o1, h11, h12, o2, h21, h22))
    assert np.isclose(v[0], 3.0, atol=1e-6)
    # water 1 dipole +y = O1->O2 direction: theta1 = 0
    assert np.isclose(v[1], 0.0, atol=1e-3)
    # water 2 dipole +y opposes O2->O1 (-y): theta2 = pi
    assert np.isclose(v[2], np.pi, atol=1e-3)


def test_three_body_dofs_angle():
    o1 = jnp.zeros(3)
    h11 = jnp.array([0.76, 0.59, 0.0]); h12 = jnp.array([-0.76, 0.59, 0.0])
    o2 = jnp.array([3.0, 0.0, 0.0])
    h21 = jnp.array([3.76, 0.59, 0.0]); h22 = jnp.array([2.24, 0.59, 0.0])
    o3 = jnp.array([0.0, 3.0, 0.0])
    h31 = jnp.array([0.76, 3.59, 0.0]); h32 = jnp.array([-0.76, 3.59, 0.0])
    v = np.asarray(dof.three_body_dofs(o1, h11, h12, o2, h21, h22, o3, h31, h32))
    assert np.isclose(v[0], 3.0, atol=1e-6)
    assert np.isclose(v[1], np.pi / 2, atol=1e-5)  # 90-degree O2-O1-O3


def test_distance_metrics_zero_and_positive():
    v6 = jnp.asarray(np.random.RandomState(0).uniform(0.1, 1.0, 6))
    assert float(dof.distance_metric_1b(v6, v6)) == 0.0
    v12 = jnp.asarray(np.random.RandomState(1).uniform(0.1, 1.0, 12))
    v12b = v12.at[0].add(0.3)
    assert float(dof.distance_metric_2b(v12, v12b)) > 0
    v18 = jnp.asarray(np.random.RandomState(2).uniform(0.1, 1.0, 18))
    assert np.isclose(float(dof.distance_metric_3b(v18, v18)), 0.0)


def test_spherical_coeffs_symmetric_shell():
    # perfect octahedral shell: l=0 coefficient = Y00 = 1/sqrt(4pi), l=1 ~ 0
    shell = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]], float
    ) * 2.0
    pos = np.vstack([[0.0, 0.0, 0.0], shell])
    box = jnp.array([100.0, 100.0, 100.0])
    coeffs, counts = sphharm.spherical_fourier_coeffs(
        jnp.asarray(pos[:1], jnp.float32), jnp.asarray(pos, jnp.float32), box,
        high_cut=3.0, min_degree=0, max_degree=4, k=8,
    )
    c = np.asarray(coeffs)
    assert int(counts[0]) == 6
    assert np.isclose(abs(c[0, 0, 0]), 1.0 / np.sqrt(4 * np.pi), atol=1e-5)
    assert np.all(np.abs(c[0, 1, :3]) < 1e-5)  # l=1 vanishes by symmetry
    ql = np.asarray(sphharm.steinhardt_ql(coeffs, min_degree=0))
    assert ql.shape == (1, 5)
    # octahedral q4 is the textbook sqrt(7/12) ~ 0.7637
    assert np.isclose(ql[0, 4], np.sqrt(7.0 / 12.0), atol=1e-4)


def test_sine_coeffs_roundtrip():
    rs = np.random.RandomState(3)
    angs = rs.uniform(20, 160, 20000)  # degrees
    coeffs = np.asarray(sinefit.find_sine_coeffs(angs, n_order=60, normalize=True))
    assert coeffs.shape == (60, 2)
    dist = np.asarray(sinefit.dist_from_coeffs(coeffs[:, 1], n_order=60))
    width = 0.01
    # the reference's normalization (wp:480-481) makes the curve integrate
    # to (180/pi)/width over degrees, not 1 -- match that convention
    assert np.isclose(np.sum(dist) * width, (180.0 / np.pi) / width, rtol=2e-2)
    # shape sanity: the sample is uniform on [20,160] deg, so the middle of
    # the distribution should be roughly flat and positive
    assert dist[8000] > 0 and dist[12000] > 0


def test_fit_dist_recovers_mixture():
    x = np.linspace(0, np.pi, 100)
    ref = np.vstack([np.sin(x) ** 2, np.cos(x) ** 2])
    target = 0.7 * ref[0] + 0.3 * ref[1]
    params, res_sq, res_signed = sinefit.fit_dist(ref, target, brute_ns=51)
    np.testing.assert_allclose(params, [0.7, 0.3], atol=0.05)


def test_water_orientation_bin_z():
    top, traj = make_water_box(27, n_frames=1, seed=31)
    o_inds, h_inds, _ = top.get_wat_inds()
    pos = traj.positions[0]
    plane_h, dip_h = orientation.water_orientation_bin_z(
        pos[o_inds], pos[h_inds], traj.boxes[0]
    )
    assert np.asarray(dip_h).sum() > 0
    assert np.asarray(plane_h).shape[0] == 500


def test_binned_volume_pofn():
    rs = np.random.RandomState(5)
    pos = rs.uniform(0, 10, (200, 3))
    edges = np.arange(0.0, 10.1, 2.0)
    counts = orientation.binned_volume_pofn(pos, (edges, edges, edges), np.arange(0, 12))
    assert counts.sum() == 125  # one entry per spatial cell


def test_legacy_wat_hbonds_detects():
    # two waters, donor H of water1 pointing at O of water2
    box = np.array([50.0, 50.0, 50.0])
    w1 = np.array([[0.0, 0, 0], [0.9572, 0, 0], [-0.24, 0.93, 0]])
    w2 = np.array([[2.8, 0.0, 0.0], [3.5, 0.6, 0.0], [3.5, -0.6, 0.0]])
    all_pos = np.vstack([w1, w2])
    n, acc, don = (np.asarray(x) for x in legacy.wat_hbonds(
        jnp.asarray(all_pos), jnp.asarray(all_pos), jnp.asarray(box), 2.1, 30.0
    ))
    assert int(n) >= 2  # found from both donor and acceptor sides
    assert don[1] >= 1  # H1 of water 1 donates
    assert acc[3] >= 1  # O of water 2 accepts


def test_legacy_pep_wat_wrapper():
    box = np.array([50.0, 50.0, 50.0])
    wat = np.array([[0.0, 0, 0], [0.9572, 0, 0], [-0.24, 0.93, 0]])
    acc = np.array([[2.8, 0.0, 0.0]])
    don = np.array([[5.0, 5.0, 5.0], [5.9572, 5.0, 5.0]])
    all_pos = np.vstack([wat, acc, don])
    n, bonds_per, accs, dons = legacy.pep_wat_hbonds(
        all_pos, np.array([3]), np.array([4, 5]), np.array([0, 1, 2])
    )
    assert n == 1 and bonds_per[0] == 1
    assert "3|" in accs and "1|" in dons


def test_radial_dist_plane():
    box = jnp.array([100.0, 100.0, 100.0])
    plane = jnp.array([[0.0, 0, 0], [1.0, 0, 0], [0.0, 1.0, 0]], jnp.float32)
    pts = jnp.array([[0.5, 0.5, 1.0], [0.5, 0.5, 20.0]], jnp.float32)
    counts = np.asarray(pairs.radial_dist_plane(plane, pts, box, 1.0, 10))
    assert counts.sum() == 1  # the z=20 point is outside the +-5 slab


def test_msd_driver(tmp_path):
    top, traj = make_water_box(27, n_frames=8, seed=33)
    msd, diff = msd_mod.msd_calc(top, traj, output_dir=str(tmp_path))
    assert msd[0] == 0.0
    assert np.all(msd >= 0)
    assert (tmp_path / "msd.txt").exists()


def test_pdb_writer(tmp_path):
    top, traj = make_water_box(3, n_frames=1, seed=34)
    p = str(tmp_path / "snap.pdb")
    wat_inds, _, _ = top.get_wat_inds()
    write_labeled_snapshot(
        p, top, traj.positions[0], traj.boxes[0],
        bound_inds=wat_inds[:1], wrap_inds=wat_inds[1:2],
    )
    text = open(p).read()
    assert "BND" in text and "WRP" in text and "CRYST1" in text
    assert text.count("ATOM") == 9


def test_spherical_coeffs_scipy_oracle_l12():
    """Full l<=12 table vs scipy.special.sph_harm on random geometry — the
    batched m-column Legendre recursion must match the serial oracle."""
    import scipy.special as sps

    rs = np.random.RandomState(7)
    n = 40
    box_l = 12.0
    pos = rs.uniform(0, box_l, (n, 3)).astype(np.float32)
    box = jnp.array([box_l] * 3, jnp.float32)
    max_l = 12
    coeffs, counts = sphharm.spherical_fourier_coeffs(
        jnp.asarray(pos), jnp.asarray(pos), box,
        high_cut=5.0, min_degree=0, max_degree=max_l, k=48,
    )
    # host oracle on the same neighbor sets
    from waterorderlib_tpu.ops import pairs as _pairs
    from waterorderlib_tpu.core import pbc as _pbc

    nl = _pairs.topk_neighbors(jnp.asarray(pos), jnp.asarray(pos), box, k=48,
                               low_cut=0.0, high_cut=5.0)
    assert int(np.asarray(nl.count).max()) <= 48  # every shell neighbor kept
    rel = np.asarray(_pbc.minimum_image(pos[np.asarray(nl.idx)] - pos[:, None, :], box))
    valid = np.asarray(nl.valid)
    for i in range(0, n, 7):
        rr = rel[i][valid[i]]
        r = np.linalg.norm(rr, axis=-1)
        polar = np.arccos(np.clip(rr[:, 2] / r, -1, 1))
        azim = np.arctan2(rr[:, 1], rr[:, 0])
        if hasattr(sps, "sph_harm_y"):  # scipy >= 1.15
            oracle = lambda m, l, az, po: sps.sph_harm_y(l, m, po, az)
        else:
            oracle = sps.sph_harm
        for l in (0, 3, 7, 12):
            for m in range(-l, l + 1):
                want = np.mean(oracle(m, l, azim, polar))
                got = coeffs[i, l, l + m]
                assert abs(got - want) < 5e-4, (i, l, m, got, want)
