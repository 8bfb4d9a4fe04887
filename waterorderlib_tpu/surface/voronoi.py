"""Voronoi tessellation analyses (host-side, Qhull via scipy).

Replaces `voronoi_volumes` (/root/reference/structureLibs/orderParam_lib.py:920-962)
and `voronoi_contacts` (/root/reference/structureLibs/surface_library.py:245-307).

Qhull is not XLA-expressible, so these stay host calls by design (SURVEY.md
§7.6): the driver layer batches device work and crosses to host once per
frame for the tessellation. The boundary treatment matches the reference's
mirror trick: each point in the lower/upper half of the box is reflected
across the nearer face in each axis, which closes the cells of all original
points without a full periodic tessellation.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import ConvexHull, Voronoi


def mirror_points(points: np.ndarray, box_l: float) -> np.ndarray:
    """Original points followed by their single-axis reflections
    (orderParam_lib.py:926-950)."""
    points = np.asarray(points, float)
    refl = []
    for point in points:
        for ax in range(3):
            r = point.copy()
            r[ax] = -point[ax] if point[ax] < 0.5 * box_l else 2.0 * box_l - point[ax]
            refl.append(r)
    return np.vstack([points, np.asarray(refl)])


def voronoi_volumes(points: np.ndarray, box_l: float, num: int):
    """Per-point Voronoi cell (volume, area); open cells -> inf
    (orderParam_lib.py:920-962)."""
    pts = mirror_points(np.asarray(points, float), box_l)
    v = Voronoi(pts)
    vol = np.zeros(num)
    area = np.zeros(num)
    for i, reg_num in enumerate(v.point_region[:num]):
        indices = v.regions[reg_num]
        if -1 in indices:
            vol[i] = np.inf
            area[i] = np.inf
        else:
            hull = ConvexHull(v.vertices[indices], qhull_options="QJ")
            vol[i] = hull.volume
            area[i] = hull.area
    return vol, area


def _face_area(vertices: np.ndarray) -> float:
    """Area of a shared Voronoi face given its vertices (>= 3).

    For >= 4 vertices the reference uses ConvexHull(...).area (the area of
    the 3-D hull of the coplanar points = 2x the polygon area, a known quirk
    it relies on); for exactly 3 it uses the plain triangle area
    (surface_library.py:295-303)."""
    if len(vertices) >= 4:
        return ConvexHull(vertices, qhull_options="QJ").area
    a, b, c = vertices
    return 0.5 * float(np.linalg.norm(np.cross(b - a, c - a)))


def voronoi_contacts(points: np.ndarray, box_l: float, num: int):
    """Pairwise shared-face contact areas + per-point cell area/volume
    (surface_library.py:245-307). Returns (contacts (num, num),
    atom_area (1, num), wat_area (1, num), atom_vol (1, num))."""
    pts = mirror_points(np.asarray(points, float), box_l)
    v = Voronoi(pts)
    contacts = np.zeros((num, num))
    atom_area = np.zeros((1, num))
    atom_vol = np.zeros((1, num))
    wat_area = np.zeros((1, num))
    regions = [np.array(v.regions[v.point_region[i]]) for i in range(num)]
    for i in range(num):
        hull = ConvexHull(v.vertices[regions[i]], qhull_options="QJ")
        atom_area[:, i] = hull.area
        atom_vol[:, i] = hull.volume
        for j in range(i + 1, num):
            co = np.intersect1d(regions[i], regions[j])
            if len(co) >= 3:
                contacts[i, j] = contacts[j, i] = _face_area(v.vertices[co])
    # exposed (non-contact) area; the 2x matches the reference's use of
    # hull.area for shared faces (surface_library.py:306). Computed after the
    # pair loop so contacts[i, j<i] are included.
    for i in range(num):
        wat_area[:, i] = 2.0 * atom_area[:, i] - np.sum(contacts[i, :])
    return contacts, atom_area, wat_area, atom_vol


def local_connections(conn_mat: np.ndarray, atom_names: list[str]):
    """Contact-graph degree + local element concentrations
    (surface_library.py:309-350). Returns (connNum, connNumC, connNumO,
    connNumN, connNumS, concPhobic), each (1, N)."""
    n = conn_mat.shape[0]
    conn_num = (conn_mat != 0).sum(axis=1).reshape(1, n).astype(float)
    counts = {e: np.zeros((1, n)) for e in "CONS"}
    for i in range(n):
        inds = np.where(conn_mat[i, :] != 0)[0]
        names = [atom_names[k] for k in inds] + [atom_names[i]]
        for nm in names:
            if nm in counts:
                counts[nm][:, i] += 1
    conc = {e: counts[e] / (1.0 + conn_num) for e in counts}
    conc_phobic = conc["C"] + conc["S"]
    return conn_num, counts["C"], counts["O"], counts["N"], counts["S"], conc_phobic


def vdw_assign(
    topology,
    non_sol_names=("SOL", "NA", "CL", "WAT"),
    vdw_c: float = 1.70,
    vdw_n: float = 1.55,
    vdw_o: float = 1.52,
    vdw_s: float = 1.80,
):
    """Per-atom vdW radii by element for non-solvent residues
    (surface_library.py:56-75). Returns (radii list, element letters)."""
    table = {"C": vdw_c, "N": vdw_n, "O": vdw_o, "S": vdw_s}
    vdw, names = [], []
    for i in range(topology.n_atoms):
        if str(topology.res_names[i]) in non_sol_names:
            continue
        el = str(topology.elements[i])
        if el in table:
            vdw.append(table[el])
            names.append(el)
    return vdw, names


def get_bonds(topology, prot_inds):
    """Per-atom counts of bonded C/O/N/S partners
    (surface_library.py:78-117). Returns (numC, numO, numN, numS), each
    shaped (1, len(prot_inds))."""
    prot_set = {int(i) for i in prot_inds}
    partners = topology.bond_partners()
    out = {e: np.zeros((1, len(prot_inds))) for e in "CONS"}
    count = 0
    for i in range(topology.n_atoms):
        if i not in prot_set:
            continue
        for j in partners[i]:
            el = str(topology.names[j])[0]
            if el in out:
                out[el][:, count] += 1
        count += 1
    return out["C"], out["O"], out["N"], out["S"]
