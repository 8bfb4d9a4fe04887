"""End-to-end tests for the RDF and chemical-potential drivers."""

import numpy as np

from waterorderlib_tpu.io.synthetic import make_water_box
from waterorderlib_tpu.drivers import rdf, chempot


def test_rdf_calc_water_only(tmp_path):
    top, traj = make_water_box(40, n_frames=10, seed=21)
    n1_ww, t_param = rdf.rdf_calc(top, traj, totbins=80, n_chunks=5, output_dir=str(tmp_path))
    assert n1_ww[0] > 0
    data = np.loadtxt(tmp_path / "rdf.txt")
    assert data.shape == (80, 7)
    # g(r) should vanish inside the hard core (jittered-lattice fixture can
    # put oxygens as close as ~0.7 A, so only the innermost bins are empty)
    core = data[data[:, 0] < 0.5]
    assert np.all(core[:, 1] == 0)
    coord = np.loadtxt(tmp_path / "coord.txt")
    assert coord.shape == (78, 7)
    # coordination (integral of a nonnegative integrand) grows with r,
    # modulo tiny Simpson end-correction wiggle
    assert np.all(np.diff(coord[:, 1]) >= -1e-3)


def test_rdf_calc_with_solute(tmp_path):
    top, traj = make_water_box(40, n_frames=5, seed=22, solute_elements=["C", "O"])
    n1_ww, n1_sw, t_param = rdf.rdf_calc(
        top, traj, totbins=60, n_chunks=5, output_dir=str(tmp_path)
    )
    assert np.isfinite(n1_sw[0])
    assert np.isfinite(t_param[0])


def test_chem_pot_bulk(tmp_path):
    top, traj = make_water_box(40, n_frames=2, seed=23)
    mu, avg_n, avg_n2 = chempot.chem_pot_calc(
        top, traj, n_insertions=4096, probe_radius=2.0, output_dir=str(tmp_path), seed=1
    )
    assert mu > 0  # some insertions must overlap in a dense box
    assert avg_n > 0 and avg_n2 >= avg_n
    h = np.loadtxt(tmp_path / "HS-solute_overlap_hist.txt")
    assert h[:, 1].sum() == 2 * 4096


def test_chem_pot_probe_radius_monotonic(tmp_path):
    # larger probe -> more overlaps -> larger mu
    top, traj = make_water_box(40, n_frames=1, seed=24)
    mu_small, *_ = chempot.chem_pot_calc(
        top, traj, n_insertions=2048, probe_radius=1.0, output_dir=str(tmp_path), seed=2
    )
    mu_large, *_ = chempot.chem_pot_calc(
        top, traj, n_insertions=2048, probe_radius=2.5, output_dir=str(tmp_path), seed=2
    )
    assert mu_large > mu_small


def test_chem_pot_shell(tmp_path):
    top, traj = make_water_box(40, n_frames=1, seed=25, solute_elements=["C", "C"])
    mu, avg_n, _ = chempot.chem_pot_calc(
        top, traj, keyword=True, n_insertions=4096, probe_radius=2.0,
        output_dir=str(tmp_path), seed=3,
    )
    assert np.isfinite(avg_n)
    h = np.loadtxt(tmp_path / "HS-solute_overlap_hist_Shell.txt")
    # rejection resampling: exactly n_ins accepted insertions per frame
    # (orderParam_lib.py:1720-1732 semantics)
    assert h[:, 1].sum() == 4096


def test_celllist_histogram_bit_matches_triangular():
    """The large-N cell-list histogram must produce bit-identical counts to
    the triangular sweep (same minimum-image arithmetic, same bins)."""
    import jax.numpy as jnp
    from waterorderlib_tpu.ops import pairs
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    rs = np.random.RandomState(0)
    n = 5000
    box_l = (n / 0.033456) ** (1.0 / 3.0)
    base = np.asarray(water_oxygen_lattice(n, box_l, seed=1), np.float32)
    pos = ((base + rs.normal(scale=0.6, size=base.shape)) % box_l).astype(np.float32)
    box = jnp.array([box_l] * 3, jnp.float32)
    c_tri = np.asarray(pairs.distance_histogram(
        jnp.asarray(pos), jnp.asarray(pos), box, 0.1, 150, same=True))
    c_cell = np.asarray(pairs.distance_histogram_celllist(
        jnp.asarray(pos), box, 0.1, 150))
    np.testing.assert_array_equal(c_tri, c_cell)


def test_celllist_rejects_small_boxes():
    import jax.numpy as jnp
    import pytest
    from waterorderlib_tpu.ops import pairs

    rs = np.random.RandomState(1)
    pos = rs.uniform(0, 20.0, (500, 3)).astype(np.float32)
    with pytest.raises(ValueError):
        # range 15 A needs >= 45 A of box
        pairs.distance_histogram_celllist(
            jnp.asarray(pos), jnp.array([20.0] * 3, jnp.float32), 0.1, 150)


def test_celllist_cap_retry_on_dense_cluster():
    """A dense cluster overflows the initial per-cell cap; the wrapper must
    retry with a larger cap and still match the triangular sweep."""
    import jax.numpy as jnp
    from waterorderlib_tpu.ops import pairs

    rs = np.random.RandomState(2)
    box_l = 60.0
    pos = rs.uniform(0, box_l, (4000, 3)).astype(np.float32)
    # pack 800 atoms into one corner cell
    pos[:800] = rs.uniform(0, 10.0, (800, 3)).astype(np.float32)
    box = jnp.array([box_l] * 3, jnp.float32)
    c_tri = np.asarray(pairs.distance_histogram(
        jnp.asarray(pos), jnp.asarray(pos), box, 0.1, 100, same=True))
    c_cell = np.asarray(pairs.distance_histogram_celllist(
        jnp.asarray(pos), box, 0.1, 100))
    np.testing.assert_array_equal(c_tri, c_cell)
