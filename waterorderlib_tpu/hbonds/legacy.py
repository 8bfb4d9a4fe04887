"""Legacy geometric H-bond kernels (peptide-surface pulling analyses).

Vectorized replacements for the reference's self-described "legacy" kernels
`FindHbonds` (/root/reference/fortran/waterlib.f90:427-512), `BBHbonds`
(:517-563), `WatHbonds` (:570-679) and their Python wrappers `PepWatHBonds`
/`BBHBonds`/`WatHBonds`
(/root/reference/structureLibs/water_properties.py:77-207). The canonical
criterion lives in hbonds.bonds.general_hbonds — these use the older
acceptor-to-hydrogen convention: |A - H| < distCut and the angle between
(A - H) and the covalent (X -> H) bond below angCut degrees.

Reproduced quirks:
- FindHbonds/BBHbonds apply *no* PBC imaging (ref comment :424-426);
  WatHbonds images each A...H vector but not the covalent bonds;
- water donor search short-circuits: if H1 of a water bonds to a given
  acceptor, H2 is not tested against that same acceptor (the Fortran
  `cycle`, :481, :622, :656).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from waterorderlib_tpu.core import pbc


def _cos_ah(bond_vec, cov_vec):
    """cos(angle) between A-H vector(s) and covalent bond vector(s)."""
    num = jnp.sum(bond_vec * cov_vec, axis=-1)
    den = jnp.sqrt(
        jnp.sum(bond_vec * bond_vec, axis=-1) * jnp.sum(cov_vec * cov_vec, axis=-1)
    )
    return num / jnp.maximum(den, 1e-30)


@jax.jit
def find_hbonds(pep_acc, pep_don, wat_pos, dist_cut=2.1, ang_cut=30.0):
    """waterlib.f90:427-512. wat_pos: (3*Nw, 3) as O,H1,H2 per water;
    pep_don: (2*Nd, 3) as heavy,H pairs. Returns
    (n_bonds, wat_acc (3Nw,), wat_don (3Nw,), pep_acc_out (Na,),
    pep_don_out (2Nd,)) per-atom H-bond counts, matching the Fortran
    outputs. No PBC."""
    cos_cut = jnp.cos(jnp.radians(ang_cut))
    d2cut = dist_cut * dist_cut
    o = wat_pos[0::3]
    h1 = wat_pos[1::3]
    h2 = wat_pos[2::3]
    vw1 = h1 - o
    vw2 = h2 - o

    # waters donate to peptide acceptors (Nw, Na)
    def don_bonds(h, vw):
        bv = pep_acc[None, :, :] - h[:, None, :]
        d2 = jnp.sum(bv * bv, axis=-1)
        cos = _cos_ah(bv, vw[:, None, :])
        return (d2 < d2cut) & (cos > cos_cut)

    b1 = don_bonds(h1, vw1)
    b2 = don_bonds(h2, vw2) & ~b1  # H2 skipped when H1 already bonded (cycle)

    # peptide donates to water oxygens (Nd, Nw)
    don_heavy = pep_don[0::2]
    don_h = pep_don[1::2]
    bv = o[None, :, :] - don_h[:, None, :]
    d2 = jnp.sum(bv * bv, axis=-1)
    vp = (don_h - don_heavy)[:, None, :]
    bp = (d2 < d2cut) & (_cos_ah(bv, vp) > cos_cut)

    n_bonds = jnp.sum(b1) + jnp.sum(b2) + jnp.sum(bp)
    nw3 = wat_pos.shape[0]
    wat_don = jnp.zeros(nw3, jnp.int32)
    wat_don = wat_don.at[1::3].set(jnp.sum(b1, axis=1).astype(jnp.int32))
    wat_don = wat_don.at[2::3].set(jnp.sum(b2, axis=1).astype(jnp.int32))
    wat_acc = jnp.zeros(nw3, jnp.int32).at[0::3].set(jnp.sum(bp, axis=0).astype(jnp.int32))
    pep_acc_out = (jnp.sum(b1, axis=0) + jnp.sum(b2, axis=0)).astype(jnp.int32)
    pep_don_out = jnp.zeros(pep_don.shape[0], jnp.int32).at[1::2].set(
        jnp.sum(bp, axis=1).astype(jnp.int32)
    )
    return n_bonds, wat_acc, wat_don, pep_acc_out, pep_don_out


@jax.jit
def bb_hbonds(pep_acc, pep_don, dist_cut=2.1, ang_cut=30.0):
    """waterlib.f90:517-563: backbone-backbone H-bonds, no PBC. Returns
    (n_bonds, acc_counts (Na,), don_counts (2Nd,))."""
    cos_cut = jnp.cos(jnp.radians(ang_cut))
    d2cut = dist_cut * dist_cut
    heavy = pep_don[0::2]
    hpos = pep_don[1::2]
    bv = pep_acc[None, :, :] - hpos[:, None, :]  # (Nd, Na, 3)
    d2 = jnp.sum(bv * bv, axis=-1)
    vp = (hpos - heavy)[:, None, :]
    bonded = (d2 < d2cut) & (_cos_ah(bv, vp) > cos_cut)
    don_out = jnp.zeros(pep_don.shape[0], jnp.int32).at[1::2].set(
        jnp.sum(bonded, axis=1).astype(jnp.int32)
    )
    return jnp.sum(bonded), jnp.sum(bonded, axis=0).astype(jnp.int32), don_out


@jax.jit
def wat_hbonds(wat_pos, all_wat_pos, box, dist_cut=2.1, ang_cut=30.0):
    """waterlib.f90:570-679: in-set waters vs all waters, A...H vectors
    imaged, covalent bonds not. Returns (n_bonds, wat_acc (3Nw,),
    wat_don (3Nw,)) counts over the in-set atoms."""
    cos_cut = jnp.cos(jnp.radians(ang_cut))
    d2cut = dist_cut * dist_cut
    o = wat_pos[0::3]
    h1 = wat_pos[1::3]
    h2 = wat_pos[2::3]
    all_o = all_wat_pos[0::3]
    all_h1 = all_wat_pos[1::3]
    all_h2 = all_wat_pos[2::3]
    n_set = wat_pos.shape[0]
    n_set_mol = o.shape[0]

    def don(h, cov_base):
        bv = pbc.minimum_image(all_o[None, :, :] - h[:, None, :], box)
        d2 = jnp.sum(bv * bv, axis=-1)
        cov = (h - cov_base)[:, None, :]
        return (d2 < d2cut) & (_cos_ah(bv, cov) > cos_cut)

    b1 = don(h1, o)  # (Nset, NallMol)
    b2 = don(h2, o) & ~b1

    def acc(all_h):
        bv = pbc.minimum_image(o[:, None, :] - all_h[None, :, :], box)
        d2 = jnp.sum(bv * bv, axis=-1)
        cov = (all_h - all_o)[None, :, :]
        return (d2 < d2cut) & (_cos_ah(bv, cov) > cos_cut)

    a1 = acc(all_h1)  # (Nset, NallMol)
    a2 = acc(all_h2) & ~a1

    n_bonds = jnp.sum(b1) + jnp.sum(b2) + jnp.sum(a1) + jnp.sum(a2)
    wat_don = jnp.zeros(n_set, jnp.int32)
    wat_don = wat_don.at[1::3].set(jnp.sum(b1, axis=1).astype(jnp.int32))
    wat_don = wat_don.at[2::3].set(jnp.sum(b2, axis=1).astype(jnp.int32))
    # in-set molecules also get donor credit when they appear in the "all"
    # set as acceptee's donors (ref :699-703 only credits j <= NwatPos);
    # acc counts go to the in-set oxygen
    wat_acc = jnp.zeros(n_set, jnp.int32).at[0::3].set(
        (jnp.sum(a1, axis=1) + jnp.sum(a2, axis=1)).astype(jnp.int32)
    )
    # donor credit for in-set waters acting as the "all" hydrogens: the
    # first NsetMol columns of a1/a2 are the in-set waters themselves
    wat_don = wat_don.at[1::3].add(jnp.sum(a1[:, :n_set_mol], axis=0).astype(jnp.int32))
    wat_don = wat_don.at[2::3].add(jnp.sum(a2[:, :n_set_mol], axis=0).astype(jnp.int32))
    # acceptor credit for in-set waters receiving from in-set donors
    wat_acc = wat_acc.at[0::3].add(jnp.sum(b1[:, :n_set_mol], axis=0).astype(jnp.int32))
    wat_acc = wat_acc.at[0::3].add(jnp.sum(b2[:, :n_set_mol], axis=0).astype(jnp.int32))
    return n_bonds, wat_acc, wat_don


def _index_string(counts, inds):
    out = []
    for j, val in enumerate(np.asarray(counts)):
        out += int(val) * [int(inds[j])]
    return "".join(str(e) + "|" for e in out)


def pep_wat_hbonds(all_pos, pep_acc_inds, pep_don_inds, wat_inds, dist_cut=2.1, ang_cut=30.0):
    """Wrapper matching PepWatHBonds (wp:77-126): returns
    (NBonds, bondsPer (per water), acceptors string, donors string)."""
    all_pos = np.asarray(all_pos)
    n, wat_acc, wat_don, pep_acc, pep_don = (
        np.asarray(x)
        for x in find_hbonds(
            jnp.asarray(all_pos[pep_acc_inds]),
            jnp.asarray(all_pos[pep_don_inds]),
            jnp.asarray(all_pos[wat_inds]),
            dist_cut, ang_cut,
        )
    )
    bonds_wat = (wat_acc + wat_don).reshape(-1, 3).sum(axis=1).astype(float)
    acceptors = _index_string(pep_acc, pep_acc_inds) + _index_string(wat_acc, wat_inds)
    donors = _index_string(pep_don, pep_don_inds) + _index_string(wat_don, wat_inds)
    return int(n), bonds_wat, acceptors, donors


def bb_hbonds_wrapper(all_pos, pep_acc_inds, pep_don_inds, dist_cut=2.1, ang_cut=30.0):
    """Wrapper matching BBHBonds (wp:129-161): (NBonds, acceptors, donors)."""
    all_pos = np.asarray(all_pos)
    n, acc, don = (
        np.asarray(x)
        for x in bb_hbonds(
            jnp.asarray(all_pos[pep_acc_inds]), jnp.asarray(all_pos[pep_don_inds]),
            dist_cut, ang_cut,
        )
    )
    return int(n), _index_string(acc, pep_acc_inds), _index_string(don, pep_don_inds)


def wat_hbonds_wrapper(all_pos, wat_inds, all_wat_inds, box, dist_cut=2.1, ang_cut=30.0):
    """Wrapper matching WatHBonds (wp:164-207): returns
    (NBonds, bondsPer, acceptors string, donors string)."""
    all_pos = np.asarray(all_pos)
    n, wat_acc, wat_don = (
        np.asarray(x)
        for x in wat_hbonds(
            jnp.asarray(all_pos[wat_inds]), jnp.asarray(all_pos[all_wat_inds]),
            jnp.asarray(box), dist_cut, ang_cut,
        )
    )
    bonds_wat = (wat_acc + wat_don).reshape(-1, 3).sum(axis=1).astype(float)
    acceptors = _index_string(wat_acc, wat_inds)
    donors = _index_string(wat_don, wat_inds)
    return int(n), bonds_wat, acceptors, donors
