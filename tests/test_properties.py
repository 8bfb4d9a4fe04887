"""Property tests (SURVEY §4b): every analysis must be invariant under
rigid translation, periodic re-wrapping, and atom permutation (values
permute, statistics unchanged)."""

import numpy as np
import jax.numpy as jnp

from waterorderlib_tpu.io.synthetic import water_oxygen_lattice
from waterorderlib_tpu.order import qtet, lsi as lsi_mod, psi6 as psi6_mod
from waterorderlib_tpu.order import angles as angles_mod
from waterorderlib_tpu.ops import pairs
from waterorderlib_tpu.hbonds.bonds import general_hbonds

N = 96
BOX = (N / 0.033456) ** (1.0 / 3.0)


def _pos(seed=0):
    return water_oxygen_lattice(N, BOX, seed=seed).astype(np.float32)


def _box():
    return jnp.asarray([BOX] * 3, jnp.float32)


def _variants(pos, seed=1):
    """(label, transformed positions) that must leave physics unchanged."""
    rs = np.random.RandomState(seed)
    shift = rs.uniform(-BOX, BOX, 3).astype(np.float32)
    wrap_offsets = rs.randint(-2, 3, (N, 3)).astype(np.float32) * BOX
    return [
        ("translated", np.mod(pos + shift, BOX)),
        ("rewrapped", pos + wrap_offsets),
    ]


def test_q_translation_wrap_permutation_invariance():
    pos = _pos()
    box = _box()
    q0 = np.asarray(qtet.order_param_q(pos, pos, box, 0.0, 10.0, row_block=N))
    for label, p2 in _variants(pos):
        q2 = np.asarray(qtet.order_param_q(p2, p2, box, 0.0, 10.0, row_block=N))
        np.testing.assert_allclose(q2, q0, atol=5e-5, err_msg=label)
    perm = np.random.RandomState(2).permutation(N)
    qp = np.asarray(qtet.order_param_q(pos[perm], pos[perm], box, 0.0, 10.0, row_block=N))
    np.testing.assert_allclose(qp, q0[perm], atol=5e-5)


def test_three_body_histogram_invariance():
    pos = _pos(3)
    box = _box()

    def hist(p):
        aset = angles_mod.neighbor_angles(p, p, box, 0.0, 3.413, k=16, row_block=N)
        return np.asarray(angles_mod.angle_histogram(aset))

    h0 = hist(pos)
    for label, p2 in _variants(pos, seed=4):
        np.testing.assert_allclose(hist(p2), h0, atol=2, err_msg=label)
    perm = np.random.RandomState(5).permutation(N)
    np.testing.assert_allclose(hist(pos[perm]), h0, atol=2)


def test_rdf_histogram_invariance():
    pos = _pos(6)
    box = _box()
    h0 = np.asarray(pairs.distance_histogram(pos, pos, box, 0.2, 60, same=True))
    for label, p2 in _variants(pos, seed=7):
        h2 = np.asarray(pairs.distance_histogram(p2, p2, box, 0.2, 60, same=True))
        np.testing.assert_allclose(h2, h0, atol=2, err_msg=label)
    perm = np.random.RandomState(8).permutation(N)
    hp = np.asarray(pairs.distance_histogram(pos[perm], pos[perm], box, 0.2, 60, same=True))
    np.testing.assert_allclose(hp, h0, atol=2)


def test_psi6_translation_invariance():
    # LSI is deliberately NOT translation invariant: the reference picks the
    # next-shell neighbor by RAW (non-imaged) distance of the stored
    # coordinates (water_properties.py:289-291), a quirk we reproduce — so
    # rewrapping can legitimately change the pick. psi6 has no such quirk.
    pos = _pos(9)
    box = _box()
    p0 = np.asarray(psi6_mod.order_param_psi(pos, pos, box, 0.0, 7.0, k=24, row_block=N))
    for label, p2 in _variants(pos, seed=10):
        psi2 = np.asarray(psi6_mod.order_param_psi(p2, p2, box, 0.0, 7.0, k=24, row_block=N))
        np.testing.assert_allclose(psi2, p0, atol=1e-4, err_msg=label)


def test_lsi_raw_distance_quirk_reproduced():
    """The LSI next-shell pick depends on stored (unwrapped) coordinates —
    shifting by a box length can change it, exactly as in the reference."""
    pos = _pos(9)
    box = _box()
    l0 = lsi_mod.lsi(pos, pos, box, 0.0, 3.7, k=24, row_block=N)
    # a pure in-box rigid rotation-free shift with NO rewrapping preserves
    # raw distances, so LSI must be unchanged
    l2 = lsi_mod.lsi(pos + np.float32(0.0), pos + np.float32(0.0), box, 0.0, 3.7, k=24, row_block=N)
    np.testing.assert_allclose(np.asarray(l2.lsi), np.asarray(l0.lsi), atol=0)


def test_hbond_counts_translation_invariance():
    pos = _pos(11)
    box = _box()
    donh = np.mod(pos + np.float32(0.7), BOX)
    m0 = np.asarray(general_hbonds(pos, pos, donh, box, 3.5, 120.0))
    rs = np.random.RandomState(12)
    shift = rs.uniform(-BOX, BOX, 3).astype(np.float32)
    m2 = np.asarray(
        general_hbonds(
            jnp.asarray(np.mod(pos + shift, BOX)),
            jnp.asarray(np.mod(pos + shift, BOX)),
            jnp.asarray(np.mod(donh + shift, BOX)),
            box, 3.5, 120.0,
        )
    )
    np.testing.assert_array_equal(m2, m0)
