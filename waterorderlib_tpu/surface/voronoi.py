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


def mirror_points(
    points: np.ndarray, box_l: float, margin: float | None = None
) -> np.ndarray:
    """Original points followed by their single-axis reflections
    (orderParam_lib.py:926-950).

    With `margin`, only reflections whose source lies within `margin` of the
    mirrored face are emitted — a reflection of a deeper point sits further
    than `margin` outside the box and (for cells of radius <= margin/2)
    cannot cut any original cell; see the certificate in `voronoi_volumes`.
    """
    points = np.asarray(points, float)
    near = points.copy()
    hi = points >= 0.5 * box_l
    near[hi] = 2.0 * box_l - points[hi]
    near[~hi] = -points[~hi]  # reflected coordinate across the nearer face
    refl = []
    for ax in range(3):
        r = points.copy()
        r[:, ax] = near[:, ax]
        if margin is not None:
            depth = np.minimum(points[:, ax], box_l - points[:, ax])
            r = r[depth <= margin]
        refl.append(r)
    return np.vstack([points] + refl)


def _ridge_geometry(v: Voronoi, num: int):
    """Vectorized per-ridge face geometry for the first `num` generators.

    A Voronoi face between generators i and j lies on their perpendicular
    bisector plane, so the distance from either generator to the face is
    |p_i - p_j| / 2 and the cell decomposes exactly into pyramids:
    vol = sum faces A * d/2 / 3, area = sum faces A. This replaces the
    reference's per-region ConvexHull('QJ') loop (orderParam_lib.py:959-960)
    with the same mathematics evaluated in closed form (no joggle, ~50x
    faster); values agree with the hulls to the joggle noise (~1e-9 rel).

    Returns (pi, pj, areas, nverts, rmax) arrays over closed ridges touching
    the first `num` cells: generator index pair, exact polygon area, vertex
    count per face, and the max vertex distance to the nearer generator
    (the two generators are equidistant from every face vertex, so one
    number serves both sides — it bounds the cell circumradius).
    """
    rp = np.asarray(v.ridge_points)
    keep = [
        r
        for r in range(len(rp))
        if (rp[r, 0] < num or rp[r, 1] < num) and -1 not in v.ridge_vertices[r]
    ]
    pi_all, pj_all, area_all, nv_all, rmax_all = [], [], [], [], []
    by_len: dict[int, list[int]] = {}
    for r in keep:
        by_len.setdefault(len(v.ridge_vertices[r]), []).append(r)
    for L, idxs in by_len.items():
        idxs = np.asarray(idxs)
        V = v.vertices[np.asarray([v.ridge_vertices[r] for r in idxs])]  # (G, L, 3)
        p1 = v.points[rp[idxs, 0]]
        p2 = v.points[rp[idxs, 1]]
        rmax_all.append(
            np.sqrt(np.max(np.sum((V - p1[:, None, :]) ** 2, axis=-1), axis=1))
        )
        n = p2 - p1
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        c = V.mean(axis=1)
        r0 = V - c[:, None, :]
        # in-plane basis seeded from the farthest vertex (robust to slivers)
        far = np.argmax(np.einsum("glk,glk->gl", r0, r0), axis=1)
        seed = np.take_along_axis(r0, far[:, None, None], axis=1)[:, 0, :]
        e1 = seed - np.einsum("gk,gk->g", seed, n)[:, None] * n
        e1 /= np.maximum(np.linalg.norm(e1, axis=-1, keepdims=True), 1e-300)
        e2 = np.cross(n, e1)
        x = np.einsum("glk,gk->gl", r0, e1)
        y = np.einsum("glk,gk->gl", r0, e2)
        order = np.argsort(np.arctan2(y, x), axis=1)
        xs = np.take_along_axis(x, order, axis=1)
        ys = np.take_along_axis(y, order, axis=1)
        xn = np.roll(xs, -1, axis=1)
        yn = np.roll(ys, -1, axis=1)
        areas = 0.5 * np.abs(np.sum(xs * yn - xn * ys, axis=1))
        pi_all.append(rp[idxs, 0])
        pj_all.append(rp[idxs, 1])
        area_all.append(areas)
        nv_all.append(np.full(len(idxs), L))
    if not pi_all:
        z = np.zeros(0)
        return z.astype(int), z.astype(int), z, z.astype(int), z
    return (
        np.concatenate(pi_all),
        np.concatenate(pj_all),
        np.concatenate(area_all),
        np.concatenate(nv_all),
        np.concatenate(rmax_all),
    )


def _open_cells(v: Voronoi, num: int) -> np.ndarray:
    return np.array(
        [-1 in v.regions[v.point_region[i]] for i in range(num)], bool
    )


def _tessellate_certified(points: np.ndarray, box_l: float, num: int):
    """Voronoi of the mirrored point set with certified boundary-shell
    pruning.

    First tessellate with only the reflections of points within `2*m` of a
    face (m = 2.5x the mean point spacing; realized MD all-atom cell
    circumradii peak at ~2.1x spacing, so the certificate holds with margin
    while still pruning most reflections on production boxes, where
    2m << box). Pruning can only ENLARGE cells,
    and a pruned reflection lies > 2m outside the box, i.e. > 2m from every
    interior point, so it cannot cut a cell whose circumradius is <= m.
    If every realized cell radius among the first `num` is <= m (and none
    is open), the pruned tessellation is therefore exact; otherwise redo
    with the full reference mirror set. Dense MD boxes always certify; the
    fallback covers dilute/degenerate inputs.
    """
    points = np.asarray(points, float)
    m = 2.5 * (box_l**3 / max(len(points), 1)) ** (1.0 / 3.0)
    if 2.0 * m < 0.5 * box_l:
        v = Voronoi(mirror_points(points, box_l, margin=2.0 * m))
        geo = _ridge_geometry(v, num)
        pi, pj, _, _, rmax = geo
        r_cell = np.zeros(num)
        for side in (pi, pj):
            sel = side < num
            np.maximum.at(r_cell, side[sel], rmax[sel])
        if not _open_cells(v, num).any() and np.all(r_cell <= m):
            return v, geo
    v = Voronoi(mirror_points(points, box_l))
    return v, _ridge_geometry(v, num)


def voronoi_volumes(points: np.ndarray, box_l: float, num: int):
    """Per-point Voronoi cell (volume, area); open cells -> inf
    (orderParam_lib.py:920-962). Closed-form face geometry (see
    `_ridge_geometry`) instead of the reference's per-region hulls, over a
    certified boundary-pruned tessellation."""
    v, (pi, pj, areas, _, _) = _tessellate_certified(
        np.asarray(points, float), box_l, num
    )
    is_open = _open_cells(v, num)
    d_half = 0.5 * np.linalg.norm(v.points[pi] - v.points[pj], axis=-1)
    vol = np.zeros(num)
    area = np.zeros(num)
    for side in (pi, pj):
        m = side < num
        np.add.at(area, side[m], areas[m])
        np.add.at(vol, side[m], areas[m] * d_half[m] / 3.0)
    vol[is_open] = np.inf
    area[is_open] = np.inf
    return vol, area


def voronoi_contacts(points: np.ndarray, box_l: float, num: int):
    """Pairwise shared-face contact areas + per-point cell area/volume
    (surface_library.py:245-307). Returns (contacts (num, num),
    atom_area (1, num), wat_area (1, num), atom_vol (1, num)).

    Faces are enumerated from Qhull's ridge list and measured in closed form
    (`_ridge_geometry`) instead of the reference's O(num^2) shared-vertex
    scan with a ConvexHull per face. The reference's doubled-area quirk is
    reproduced exactly: a >= 4-vertex shared face contributes
    ConvexHull(...).area of the coplanar points = 2x the polygon area, a
    3-vertex face the plain triangle area (surface_library.py:295-303).
    Cells here are closed by the mirror construction; any open cell (can
    only arise from degenerate inputs) falls back to the reference-style
    per-region hull for that row."""
    v, (pi, pj, areas, nverts, _) = _tessellate_certified(
        np.asarray(points, float), box_l, num
    )
    contacts = np.zeros((num, num))
    atom_area = np.zeros((1, num))
    atom_vol = np.zeros((1, num))
    wat_area = np.zeros((1, num))

    d_half = 0.5 * np.linalg.norm(v.points[pi] - v.points[pj], axis=-1)
    for side in (pi, pj):
        m = side < num
        np.add.at(atom_area[0], side[m], areas[m])
        np.add.at(atom_vol[0], side[m], areas[m] * d_half[m] / 3.0)
    both = (pi < num) & (pj < num)
    quirk = np.where(nverts[both] >= 4, 2.0, 1.0)
    contacts[pi[both], pj[both]] = quirk * areas[both]
    contacts[pj[both], pi[both]] = quirk * areas[both]

    is_open = _open_cells(v, num)
    for i in np.where(is_open)[0]:  # degenerate fallback, reference-style
        indices = v.regions[v.point_region[i]]
        hull = ConvexHull(v.vertices[indices], qhull_options="QJ")
        atom_area[:, i] = hull.area
        atom_vol[:, i] = hull.volume

    wat_area[0] = 2.0 * atom_area[0] - contacts[:num].sum(axis=1)
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
