"""Device-side Voronoi cells via fixed-shape plane-triple enumeration.

TPU-first replacement for the host Qhull tessellation behind
`voronoi_volumes` (/root/reference/structureLibs/orderParam_lib.py:920-962)
and `voronoi_contacts` (/root/reference/structureLibs/surface_library.py:245-307),
planned in SURVEY.md §7.6. The host path (surface/voronoi.py) remains the
oracle and the fallback for uncertified atoms.

Design (no Qhull, no raggedness — everything is fixed-shape jnp):

1. The reference's mirror construction is kept verbatim: the candidate set
   is the original points plus their single-axis reflections across the
   nearer box face (orderParam_lib.py:926-950). A point's own reflection
   yields a bisector exactly on the box face, so every cell is closed.
2. For each of the first `num` points, take the K nearest candidates
   (`ops.pairs.topk_neighbors` with PBC disabled — the mirrored set lives in
   open space). The cell of a point is the intersection of the half-spaces
   x·r_k <= |r_k|^2/2 over relative candidate positions r_k.
3. Every Voronoi vertex is the intersection of 3 bisector planes: enumerate
   all C(K,3) plane triples, solve each 3x3 system in closed form (Cramer
   via cross products), and keep vertices inside all K half-spaces.
4. Every cell edge lies on the intersection line of 2 planes: for each of
   the C(K,2) pairs, the edge endpoints are the extreme valid vertices
   along the line direction r_i x r_j.
5. Face polygons are never ordered: each face's vector area is accumulated
   from locally-oriented edge triangles (apex at the face's plane point
   r_f/2). The orientation of an edge shared with face j is fixed by
   requiring the polygon interior to lie away from plane j — a purely local
   sign test, so no sorting anywhere.
6. Per-atom exactness certificate: the cell is provably unaffected by any
   candidate beyond the K-th iff d_K >= 2*R_cell (R_cell = max vertex
   distance). Additional guards reject degenerate vertices (>= 4 coincident
   planes, e.g. perfect lattices) and non-closed surfaces (sum of face
   vector areas must vanish). Uncertified atoms fall back to a per-atom
   host half-space intersection, then to the full host tessellation.

Complexity per atom is O(C(K,3)*K) dense fused arithmetic — at K=32 about
1.4 MFLOP, so a 12k-atom frame is ~17 GFLOP of vectorizable work instead of
a serial Qhull run.
"""

from __future__ import annotations

import itertools
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from waterorderlib_tpu.ops import pairs as ops_pairs

# A "box" so large that minimum-image wrapping is a no-op: the mirrored
# candidate set must be searched in open space.
_NO_PBC_BOX = 3.0e18
# Far parking distance for unused candidate slots (mirror set is always
# >= 3 points, so slots only go unused for tiny inputs).
_FAR = 1.0e6


@lru_cache(maxsize=8)
def _tables(k: int):
    """Static index tables for K planes: triples, pairs, triples-per-pair,
    and pairs-per-face (+ the opposing face of each pair)."""
    tri = np.array(list(itertools.combinations(range(k), 3)), np.int32)
    prs = np.array(list(itertools.combinations(range(k), 2)), np.int32)
    pair_id = {(int(i), int(j)): p for p, (i, j) in enumerate(prs)}
    pair_tri = np.zeros((len(prs), k - 2), np.int32)
    fill = np.zeros(len(prs), np.int64)
    for t, (a, b, c) in enumerate(tri):
        for ij in ((a, b), (a, c), (b, c)):
            p = pair_id[(int(ij[0]), int(ij[1]))]
            pair_tri[p, fill[p]] = t
            fill[p] += 1
    face_pairs = np.zeros((k, k - 1), np.int32)
    face_other = np.zeros((k, k - 1), np.int32)
    cnt = np.zeros(k, np.int64)
    for p, (i, j) in enumerate(prs):
        face_pairs[i, cnt[i]] = p
        face_other[i, cnt[i]] = j
        cnt[i] += 1
        face_pairs[j, cnt[j]] = p
        face_other[j, cnt[j]] = i
        cnt[j] += 1
    return tri, prs, pair_tri, face_pairs, face_other


@lru_cache(maxsize=8)
def _park_directions(k: int) -> np.ndarray:
    """Distinct unit directions (golden spiral) to park unused slots on, so
    parked planes are never near-parallel (which would break the det test)."""
    i = np.arange(k) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / k)
    theta = np.pi * (1.0 + 5.0**0.5) * i
    return np.stack(
        [np.cos(theta) * np.sin(phi), np.sin(theta) * np.sin(phi), np.cos(phi)], -1
    )


def mirror_points_device(points: jnp.ndarray, box_l) -> jnp.ndarray:
    """points followed by their nearer-face reflections per axis — the
    reference's boundary treatment (orderParam_lib.py:926-950) with no
    margin pruning (fixed shape: exactly 4P candidates)."""
    box_l = jnp.asarray(box_l, points.dtype)
    hi = points >= 0.5 * box_l
    near = jnp.where(hi, 2.0 * box_l - points, -points)
    out = [points]
    for ax in range(3):
        out.append(points.at[:, ax].set(near[:, ax]))
    return jnp.concatenate(out, axis=0)


def _cell_moments(rel_all, slot_ok, k: int, eps: float):
    """Moments of one Voronoi cell.

    rel_all: (K_search, 3) relative candidate positions (nearest first);
    slot_ok: (K_search,) False for padding slots. The cell is built from the
    first `k` bisector planes; the remaining planes are only CHECKED — if
    any of them cuts the built cell, `extra_cut` is set and the cell is not
    certifiable. Returns a dict of per-cell quantities: vol, area,
    face_area (k,), face_nverts (k,), r_cell, flags.
    """
    tri, prs, pair_tri, face_pairs, face_other = _tables(k)
    dtype = rel_all.dtype
    ks = rel_all.shape[0]
    park = jnp.asarray(_park_directions(ks), dtype) * jnp.asarray(_FAR, dtype)
    rel_all = jnp.where(slot_ok[:, None], rel_all, park)
    rel = rel_all[:k]

    s_all = 0.5 * jnp.sum(rel_all * rel_all, axis=-1)  # (K_search,)
    s = s_all[:k]
    # representative squared-distance scale for tolerances (real slots only)
    s_scale = jnp.min(jnp.where(slot_ok, s_all, jnp.inf))
    s_scale = jnp.where(jnp.isfinite(s_scale), s_scale, jnp.asarray(1.0, dtype))
    tol = jnp.asarray(eps, dtype) * s_scale

    ra, rb, rc = rel[tri[:, 0]], rel[tri[:, 1]], rel[tri[:, 2]]
    sa, sb, sc = s[tri[:, 0]], s[tri[:, 1]], s[tri[:, 2]]
    cbc = jnp.cross(rb, rc)
    cca = jnp.cross(rc, ra)
    cab = jnp.cross(ra, rb)
    det = jnp.sum(ra * cbc, axis=-1)  # (C,)
    nrm = lambda v: jnp.sqrt(jnp.sum(v * v, axis=-1))
    scale3 = nrm(ra) * nrm(rb) * nrm(rc)
    ok_det = jnp.abs(det) > jnp.asarray(eps, dtype) * scale3
    num = sa[:, None] * cbc + sb[:, None] * cca + sc[:, None] * cab
    X = num / jnp.where(ok_det, det, 1.0)[:, None]  # (C, 3)

    # HIGHEST: TPU matmuls otherwise run bf16 multiplicands, which wrecks
    # the slack tolerances (observed: certificate rate 0% on TPU, 86% on CPU)
    slack = s_all[None, :] - jnp.matmul(
        X, rel_all.T, precision=jax.lax.Precision.HIGHEST
    )  # (C, K_search); >= 0 inside
    inside = jnp.min(slack[:, :k], axis=-1) >= -tol
    vert_ok = ok_det & inside  # (C,)
    vnorm = nrm(X)
    r_cell = jnp.max(jnp.where(vert_ok, vnorm, 0.0))
    # does any beyond-build plane cut the built cell?
    extra_cut = jnp.any(vert_ok[:, None] & (slack[:, k:] < -tol))

    # edges: extreme valid vertices along each pair's intersection line
    Xv = X[pair_tri]  # (P, K-2, 3)
    okv = vert_ok[pair_tri]  # (P, K-2)
    tdir = jnp.cross(rel[prs[:, 0]], rel[prs[:, 1]])  # (P, 3)
    u = jnp.einsum("pvk,pk->pv", Xv, tdir, precision=jax.lax.Precision.HIGHEST)
    big = jnp.asarray(3.0e37, dtype)
    i_lo = jnp.argmin(jnp.where(okv, u, big), axis=-1)
    i_hi = jnp.argmax(jnp.where(okv, u, -big), axis=-1)
    take = lambda i: jnp.take_along_axis(Xv, i[:, None, None], axis=1)[:, 0, :]
    v1, v2 = take(i_lo), take(i_hi)  # (P, 3)
    edge_ok = jnp.sum(okv, axis=-1) >= 2  # (P,)

    # per-face vector areas from locally oriented edge triangles
    V1 = v1[face_pairs]  # (K, K-1, 3)
    V2 = v2[face_pairs]
    eok = edge_ok[face_pairs]  # (K, K-1)
    rj = rel[face_other]  # (K, K-1, 3)
    tvec = V2 - V1

    # Mirror candidates make face-plane vertices exactly degenerate (a
    # candidate and its mirror partner are equidistant from any point on the
    # box face), so several plane pairs can carry the SAME geometric edge of
    # a face. Deduplicate per face on a 5-scalar segment signature
    # (midpoint, length, |direction . g|); keep zero-length point-touch
    # "edges" out via the length gate.
    len_scale = jnp.sqrt(2.0 * s_scale)  # ~ nearest-candidate distance
    len_tol = jnp.sqrt(jnp.asarray(eps, dtype)) * len_scale
    tlen = nrm(tvec)
    eok = eok & (tlen > len_tol)
    gvec = jnp.asarray([0.5377671, 0.78316498, 0.31233937], dtype)
    mid = 0.5 * (V1 + V2)  # (K, K-1, 3)
    sig = jnp.concatenate(
        [mid, tlen[..., None], jnp.abs(jnp.sum(tvec * gvec, axis=-1))[..., None]],
        axis=-1,
    )  # (K, K-1, 5)
    diff = jnp.max(
        jnp.abs(sig[:, :, None, :] - sig[:, None, :, :]), axis=-1
    )  # (K, K-1, K-1)
    dup = diff <= len_tol
    ne = eok.shape[1]
    earlier = np.tril(np.ones((ne, ne), bool), -1)  # j' < j
    taken = dup & earlier[None, :, :] & eok[:, None, :]
    eok = eok & ~jnp.any(taken, axis=-1)

    orient = jnp.einsum(
        "fek,fek->fe", jnp.cross(rel[:, None, :], tvec), rj,
        precision=jax.lax.Precision.HIGHEST,
    )  # >0 means v1->v2 is the wrong way round for face f
    sign = jnp.where(orient > 0, -1.0, 1.0).astype(dtype)
    q = 0.5 * rel  # a point on each face's plane
    civ = 0.5 * jnp.cross(V1 - q[:, None, :], V2 - q[:, None, :])
    w = jnp.where(eok, sign, 0.0)
    vec_area = jnp.sum(civ * w[:, :, None], axis=1)  # (K, 3)
    r_len = nrm(rel)
    nhat = rel / r_len[:, None]
    raw_area = jnp.sum(vec_area * nhat, axis=-1)  # (K,) signed
    # a real face has a closed polygon: >= 3 edges
    nedges_raw = jnp.sum(eok, axis=-1)  # (K,) edge count == vertex count
    face_real = (nedges_raw >= 3) & (raw_area > tol)
    face_area = jnp.where(face_real, raw_area, 0.0)
    face_nverts = jnp.where(face_real, nedges_raw, 0)

    area = jnp.sum(face_area)
    vol = jnp.sum(face_area * r_len) / 6.0  # sum A_f * (|r_f|/2) / 3
    closure = nrm(jnp.sum(jnp.where(face_real[:, None], vec_area, 0.0), axis=0))
    # the vector areas of a closed surface sum to zero; the tolerance scales
    # with eps because degenerate-edge endpoints carry conditioning noise
    closure_tol = jnp.maximum(
        jnp.asarray(100.0 * eps, dtype), jnp.asarray(1e-6, dtype)
    )
    closed = closure <= closure_tol * jnp.maximum(area, jnp.asarray(1e-6, dtype))
    # phantom "faces" (a plane touching the cell only along an edge or a
    # vertex) keep < 3 edges and carry junk signed areas; they are excluded
    # from the cell, so only >=3-edge faces can veto via negativity
    any_negative = jnp.any(
        (nedges_raw >= 3) & (raw_area < -jnp.sqrt(tol) * jnp.maximum(area, 1.0))
    )
    ok_shape = closed & ~any_negative & (vol > 0) & ~extra_cut
    return {
        "vol": vol,
        "area": area,
        "face_area": face_area,
        "face_nverts": face_nverts.astype(jnp.int32),
        "r_cell": r_cell,
        "ok_shape": ok_shape,
        "closure_err": closure,
        "extra_cut": extra_cut,
        "neg_face": any_negative,
    }


@partial(jax.jit, static_argnames=("k", "k_search", "row_block", "eps"))
def _cells_blocked(centers, ext, box, k, k_search, row_block, eps):
    nl = ops_pairs.topk_neighbors(
        centers, ext, box, k=k_search, low_cut=0.0, high_cut=jnp.inf,
        row_block=row_block,
    )
    rel_all = ext[nl.idx] - centers[:, None, :]  # (num, K_search, 3)

    def one_block(args):
        rel, ok = args
        return jax.vmap(lambda r, o: _cell_moments(r, o, k, eps))(rel, ok)

    ns = centers.shape[0]
    pad = (-ns) % row_block
    if pad:
        rel_all = jnp.concatenate(
            [rel_all, jnp.zeros((pad, k_search, 3), rel_all.dtype)], axis=0
        )
        valid = jnp.concatenate(
            [nl.valid, jnp.zeros((pad, k_search), bool)], axis=0
        )
    else:
        valid = nl.valid
    blocks = (
        rel_all.reshape(-1, row_block, k_search, 3),
        valid.reshape(-1, row_block, k_search),
    )
    out = jax.lax.map(one_block, blocks)
    unblk = lambda x: x.reshape((-1,) + x.shape[2:])[:ns]
    out = {kk: unblk(v) for kk, v in out.items()}
    out["nbr_dist"] = nl.dist
    out["nbr_idx"] = nl.idx
    out["nbr_valid"] = nl.valid
    return out


def voronoi_cells_device(
    points,
    box_l: float,
    num: int,
    k: int = 32,
    k_search: int = 64,
    row_block: int = 256,
    eps: float | None = None,
    centers_idx=None,
):
    """Per-cell Voronoi moments for the first `num` points on device.

    The cell is built from the `k` nearest candidates' bisector planes; the
    certificate draws on `k_search >= k` candidates: exactness requires that
    planes k..k_search provably do not cut the built cell AND that no point
    beyond the k_search-th could (d_{k_search} >= 2 * R_cell).

    Returns a dict of jnp arrays: vol (num,), area (num,), face_area
    (num, k), face_nverts (num, k), nbr_idx (num, k_search) indices into the
    mirrored candidate set (original point = idx % P), r_cell (num,), and
    certified (num,) — True where the cell is provably exact.
    """
    pts = jnp.asarray(points)
    if eps is None:
        eps = 1e-10 if pts.dtype == jnp.float64 else 1e-4
    if k_search < k:
        raise ValueError(f"k_search={k_search} must be >= k={k}")
    ext = mirror_points_device(pts, box_l)
    if centers_idx is None:
        centers = pts[:num]
    else:
        centers = pts[jnp.asarray(centers_idx)]
    box = jnp.asarray([_NO_PBC_BOX] * 3, pts.dtype)
    nc = int(centers.shape[0])
    out = _cells_blocked(
        centers, ext, box, k, k_search, min(row_block, max(1, nc)), float(eps)
    )
    d_far = out["nbr_dist"][:, -1]  # +inf when fewer than K candidates exist
    out["certified"] = out["ok_shape"] & (d_far >= 2.0 * out["r_cell"])
    return out


def _host_cell(rel: np.ndarray):
    """Host fallback for one cell: half-space intersection of the bisector
    planes of `rel` (K2, 3) relative candidates around the origin.

    Returns (vol, area, face_areas (K2,), face_nverts (K2,), r_cell).
    """
    from scipy.spatial import ConvexHull, HalfspaceIntersection

    n = rel / np.linalg.norm(rel, axis=-1, keepdims=True)
    d = 0.5 * np.linalg.norm(rel, axis=-1)
    halfspaces = np.hstack([n, -d[:, None]])  # n.x - d <= 0
    hs = HalfspaceIntersection(halfspaces, np.zeros(3))
    verts = hs.intersections
    hull = ConvexHull(verts)
    r_cell = float(np.max(np.linalg.norm(verts, axis=-1)))
    # per-face areas: group hull facets by the generating half-space
    face_area = np.zeros(len(rel))
    face_verts: list[set] = [set() for _ in range(len(rel))]
    centroids = verts[hull.simplices].mean(axis=1)
    plane_off = centroids @ n.T - d[None, :]  # (S, K2)
    owner = np.argmax(plane_off, axis=1)  # nearest plane contains the facet
    for s, simplex in enumerate(hull.simplices):
        a, b, c = verts[simplex]
        face_area[owner[s]] += 0.5 * np.linalg.norm(np.cross(b - a, c - a))
        face_verts[owner[s]].update(int(v) for v in simplex)
    nverts = np.array([len(fv) for fv in face_verts])
    return float(hull.volume), float(hull.area), face_area, nverts, r_cell


DEFAULT_TIERS = ((32, 64), (48, 96))


def voronoi_volumes_hybrid(
    points: np.ndarray,
    box_l: float,
    num: int,
    tiers=DEFAULT_TIERS,
    row_block: int = 256,
    fallback_k: int = 96,
):
    """Drop-in for `surface.voronoi.voronoi_volumes`: device cells where
    certified (escalating through (k, k_search) tiers), per-atom host
    half-space cells otherwise.

    Returns (vol (num,), area (num,), n_certified) — open cells -> inf as in
    the reference (impossible here for in-box points: the mirror set always
    closes them, matching orderParam_lib.py:920-962 semantics).
    """
    points = np.asarray(points)
    k0, ks0 = tiers[0]
    out = voronoi_cells_device(
        points, box_l, num, k=k0, k_search=ks0, row_block=row_block
    )
    vol = np.asarray(out["vol"], np.float64).copy()
    area = np.asarray(out["area"], np.float64).copy()
    cert = np.asarray(out["certified"]).copy()
    for k2, ks2 in tiers[1:]:
        bad_idx = np.where(~cert)[0]
        if not len(bad_idx):
            break
        out2 = voronoi_cells_device(
            points, box_l, num, k=k2, k_search=ks2,
            row_block=min(row_block, max(1, len(bad_idx))), centers_idx=bad_idx,
        )
        c2 = np.asarray(out2["certified"])
        fixed = bad_idx[c2]
        vol[fixed] = np.asarray(out2["vol"], np.float64)[c2]
        area[fixed] = np.asarray(out2["area"], np.float64)[c2]
        cert[fixed] = True
    bad = np.where(~cert)[0]
    if len(bad):
        ext = np.asarray(mirror_points_device(jnp.asarray(points), box_l))
        for i in bad:
            vol[i], area[i], *_ = _host_cell_best(ext, points[i], fallback_k)
    return vol, area, int(cert.sum())


def _host_cell_best(ext: np.ndarray, center: np.ndarray, k2: int):
    """Host cell of `center` against its k2 nearest mirrored candidates,
    doubling k2 until the far-candidate certificate holds."""
    d = np.linalg.norm(ext - center[None, :], axis=-1)
    order = np.argsort(d)
    order = order[d[order] > 1e-12]  # drop self
    while True:
        sel = order[: min(k2, len(order))]
        rel = ext[sel] - center[None, :]
        vol, area, fa, nv, r_cell = _host_cell(rel)
        if len(sel) == len(order) or d[order[min(k2, len(order)) - 1]] >= 2 * r_cell:
            return vol, area, fa, nv, sel
        k2 *= 2


def _scatter_contact_rows(contacts, out, rows_idx, keep_mask, P, num):
    """Scatter one device tier's face areas into contact-matrix rows.

    rows_idx: original center index per device row; keep_mask: which device
    rows to scatter (certified ones)."""
    face_area = np.asarray(out["face_area"], np.float64)[keep_mask]
    face_nverts = np.asarray(out["face_nverts"])[keep_mask]
    nbr_idx = np.asarray(out["nbr_idx"])[keep_mask, : face_area.shape[1]]
    rows = rows_idx[keep_mask][:, None].repeat(face_area.shape[1], 1)
    orig = nbr_idx % P  # mirror image -> source point
    is_real = (nbr_idx < P) & (orig < num) & (face_area > 0)
    quirk = np.where(face_nverts >= 4, 2.0, 1.0)
    np.add.at(contacts, (rows[is_real], orig[is_real]), (quirk * face_area)[is_real])


def voronoi_contacts_hybrid(
    points: np.ndarray,
    box_l: float,
    num: int,
    tiers=DEFAULT_TIERS,
    row_block: int = 256,
    fallback_k: int = 96,
):
    """Drop-in for `surface.voronoi.voronoi_contacts`: (contacts (num, num),
    atom_area (1, num), wat_area (1, num), atom_vol (1, num), n_certified).

    Reproduces the reference's doubled-area quirk: faces with >= 4 vertices
    contribute 2x their polygon area to the contact matrix, 3-vertex faces
    1x (surface_library.py:295-303).
    """
    points = np.asarray(points)
    P = len(points)
    k0, ks0 = tiers[0]
    out = voronoi_cells_device(
        points, box_l, num, k=k0, k_search=ks0, row_block=row_block
    )
    cert = np.asarray(out["certified"]).copy()
    vol = np.asarray(out["vol"], np.float64).copy()
    area = np.asarray(out["area"], np.float64).copy()
    contacts = np.zeros((num, num))
    _scatter_contact_rows(contacts, out, np.arange(num), cert, P, num)

    for k2, ks2 in tiers[1:]:
        bad_idx = np.where(~cert)[0]
        if not len(bad_idx):
            break
        out2 = voronoi_cells_device(
            points, box_l, num, k=k2, k_search=ks2,
            row_block=min(row_block, max(1, len(bad_idx))), centers_idx=bad_idx,
        )
        c2 = np.asarray(out2["certified"])
        fixed = bad_idx[c2]
        vol[fixed] = np.asarray(out2["vol"], np.float64)[c2]
        area[fixed] = np.asarray(out2["area"], np.float64)[c2]
        _scatter_contact_rows(contacts, out2, bad_idx, c2, P, num)
        cert[fixed] = True

    bad = np.where(~cert)[0]
    if len(bad):
        ext = np.asarray(mirror_points_device(jnp.asarray(points), box_l))
        for i in bad:
            vol[i], area[i], fa, nv, sel = _host_cell_best(
                ext, points[i], fallback_k
            )
            o = sel % P
            keep = (sel < P) & (o < num) & (fa > 1e-12)
            np.add.at(
                contacts[i], o[keep], (np.where(nv >= 4, 2.0, 1.0) * fa)[keep]
            )
    # symmetrize from the better-certified side (device cells agree to fp
    # tolerance; fallback rows are authoritative for their own row)
    contacts = np.maximum(contacts, contacts.T)
    atom_area = area[None, :num].copy()
    atom_vol = vol[None, :num].copy()
    wat_area = (2.0 * atom_area - contacts[:num].sum(axis=1)[None, :]).copy()
    return contacts, atom_area, wat_area, atom_vol, int(cert.sum())
