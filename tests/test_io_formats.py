"""Tests for AMBER PRMTOP parsing, DCD round-trip, and surface grids."""

import numpy as np

from waterorderlib_tpu.io import dcd
from waterorderlib_tpu.io.amber import load_prmtop
from waterorderlib_tpu.io.synthetic import make_water_box

PRMTOP = """%VERSION  VERSION_STAMP = V0001.000
%FLAG POINTERS
%FORMAT(10I8)
       6       2       2       1       0       0       0       0       0       0
       0       2       0       0       0       0       0       0       0       0
       0       0       0       0       0       0       0       0       0       0
       0
%FLAG ATOM_NAME
%FORMAT(20a4)
O   H1  H2  O   H1  H2
%FLAG MASS
%FORMAT(5E16.8)
  1.60000000E+01  1.00800000E+00  1.00800000E+00  1.60000000E+01  1.00800000E+00
  1.00800000E+00
%FLAG ATOMIC_NUMBER
%FORMAT(10I8)
       8       1       1       8       1       1
%FLAG RESIDUE_LABEL
%FORMAT(20a4)
WAT WAT
%FLAG RESIDUE_POINTER
%FORMAT(10I8)
       1       4
%FLAG BONDS_INC_HYDROGEN
%FORMAT(10I8)
       0       3       1       0       6       1       9      12       1
       9      15       1
"""


def test_prmtop_parse(tmp_path):
    p = tmp_path / "top.prmtop"
    p.write_text(PRMTOP)
    top = load_prmtop(str(p))
    assert top.n_atoms == 6
    o, h, len_wat = top.get_wat_inds()
    np.testing.assert_array_equal(o, [0, 3])
    np.testing.assert_array_equal(h, [1, 2, 4, 5])
    assert len_wat == 3
    np.testing.assert_array_equal(
        top.bonds, [[0, 1], [0, 2], [3, 4], [3, 5]]
    )
    hbO, _ = top.get_hb_inds(np.array([], int), o)
    assert len(hbO[1]) == 4  # each O duplicated per H


def test_dcd_roundtrip(tmp_path):
    top, traj = make_water_box(8, n_frames=5, seed=12)
    p = str(tmp_path / "t.dcd")
    dcd.write_dcd(p, traj)
    t2 = dcd.read_dcd(p)
    np.testing.assert_allclose(t2.positions, traj.positions, atol=0)
    np.testing.assert_allclose(t2.boxes, traj.boxes, atol=0)
    t3 = dcd.read_dcd(p, stride=2)
    assert t3.n_frames == 3


def test_dcd_garbage_raises(tmp_path):
    p = tmp_path / "g.dcd"
    p.write_bytes(b"definitely not a dcd" * 5)
    import pytest

    with pytest.raises(Exception):
        dcd.read_dcd(str(p))


def test_surface_grids_sphere_solute():
    from waterorderlib_tpu.surface.grids import sasa_grid, density_voxel
    from waterorderlib_tpu.surface.mesh import mesh_area

    # a single atom of radius 2 at the center: SASA mesh ~ sphere of r=2
    heavy = np.array([[10.0, 10.0, 10.0]])
    box = np.array([20.0, 20.0, 20.0])
    verts, faces = sasa_grid(heavy, box, np.array([2.0]), n_bins=24)
    assert len(faces) > 50
    r = np.linalg.norm(verts - heavy[0], axis=1)
    np.testing.assert_allclose(r, 2.0, atol=0.6)
    area = mesh_area(verts, faces)
    assert abs(area - 4 * np.pi * 4.0) / (4 * np.pi * 4.0) < 0.25

    top, traj = make_water_box(27, n_frames=1, seed=13, solute_elements=["C"])
    wat_inds, _, _ = top.get_wat_inds()
    sol_inds, *_ = top.get_sol_inds()
    dens = density_voxel(
        traj.positions[0][sol_inds], traj.positions[0][wat_inds], traj.boxes[0]
    )
    assert dens.shape == (10, 10, 10)
    assert dens.sum() >= 0


def test_density_grid_mesh_around_solute():
    from waterorderlib_tpu.surface.grids import density_grid

    top, traj = make_water_box(64, n_frames=1, seed=14, solute_elements=["C", "C"])
    wat_inds, _, _ = top.get_wat_inds()
    sol_inds, *_ = top.get_sol_inds()
    verts, faces = density_grid(
        traj.positions[0][sol_inds].astype(float),
        traj.positions[0][wat_inds].astype(float),
        traj.boxes[0].astype(float),
        level=0.03, n_bins=33,  # within this small fixture's density range
    )
    # an isosurface exists at a level inside the field's range
    assert len(faces) > 0
