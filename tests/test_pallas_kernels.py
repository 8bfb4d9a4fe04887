"""Parity tests for Pallas TPU kernels (run on TPU; skipped elsewhere,
including the CPU mesh used by the rest of the suite)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

needs_tpu = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu",), reason="Pallas TPU kernel needs a TPU"
)


@needs_tpu
def test_qtet_pallas_matches_xla():
    from waterorderlib_tpu.ops.pallas.qtet_kernel import order_param_q_pallas
    from waterorderlib_tpu.order import qtet
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    n = 512
    box_len = (n / 0.033456) ** (1.0 / 3.0)
    pos = jnp.asarray(water_oxygen_lattice(n, box_len, seed=7), jnp.float32)
    box = jnp.asarray([box_len] * 3, dtype=jnp.float32)
    qp, hist = order_param_q_pallas(pos, box, 0.0, 10.0)
    qp = np.asarray(qp)
    qr = np.asarray(qtet.order_param_q(pos, pos, box, 0.0, 10.0, row_block=n))
    np.testing.assert_allclose(qp, qr, atol=1e-5)
    # fused histogram matches a host histogram of the same q values
    want_h, _ = np.histogram(qr, bins=500, range=(0.0, 1.0))
    assert np.abs(np.asarray(hist) - want_h).sum() <= 4  # boundary-bin flips


@needs_tpu
def test_qtet_pallas_nondivisible_n():
    from waterorderlib_tpu.ops.pallas.qtet_kernel import order_param_q_pallas
    from waterorderlib_tpu.order import qtet
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    n = 300  # not a multiple of the row tile
    box_len = (n / 0.033456) ** (1.0 / 3.0)
    pos = jnp.asarray(water_oxygen_lattice(n, box_len, seed=8), jnp.float32)
    box = jnp.asarray([box_len] * 3, dtype=jnp.float32)
    qp = np.asarray(order_param_q_pallas(pos, box, 0.0, 10.0, row_tile=128)[0])
    qr = np.asarray(qtet.order_param_q(pos, pos, box, 0.0, 10.0, row_block=n))
    assert qp.shape == (n,)
    np.testing.assert_allclose(qp, qr, atol=1e-5)


@needs_tpu
def test_qtet_sorted_matches_brute():
    from waterorderlib_tpu.ops.pallas.qtet_sorted import order_param_q_pallas_sorted
    from waterorderlib_tpu.ops.pallas.qtet_kernel import order_param_q_pallas_frames
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    n, f = 1024, 2
    box_len = (n / 0.033456) ** (1.0 / 3.0)
    rs = np.random.RandomState(3)
    base = water_oxygen_lattice(n, box_len, seed=3)
    pos = jnp.asarray(
        np.stack([np.mod(base + rs.normal(scale=0.1, size=base.shape), box_len)
                  for _ in range(f)]), jnp.float32)
    boxes = jnp.asarray(np.tile(np.array([box_len] * 3, np.float32), (f, 1)))
    q_s, ok, covered = order_param_q_pallas_sorted(pos, boxes, window=896, pad=256)
    q_b, _ = order_param_q_pallas_frames(pos, boxes)
    assert bool(np.all(np.asarray(covered)))
    ok_np = np.asarray(ok)
    assert ok_np.mean() > 0.999
    np.testing.assert_allclose(
        np.asarray(q_s)[ok_np], np.asarray(q_b)[ok_np], atol=1e-5
    )


@needs_tpu
def test_tet_order_calc_pallas_path(tmp_path):
    """The driver routes through the fused kernel on TPU when nw >= 2*row_block;
    population statistics must match the XLA path."""
    from waterorderlib_tpu.io.synthetic import make_water_box
    from waterorderlib_tpu.drivers.orderparams import tet_order_calc

    top, traj = make_water_box(600, n_frames=4, seed=91)
    wat_inds, _, _ = top.get_wat_inds()
    sub = [[wat_inds[:50]] for _ in range(4)]
    a1, v1 = tet_order_calc(top, traj, sub_inds=sub, n_pops=1,
                            output_dir=str(tmp_path), row_block=256)  # pallas
    a2, v2 = tet_order_calc(top, traj, sub_inds=sub, n_pops=1,
                            output_dir=str(tmp_path), row_block=600)  # xla
    np.testing.assert_allclose(a1[0], a2[0], atol=1e-5)
    np.testing.assert_allclose(v1[0], v2[0], atol=1e-5)


@needs_tpu
def test_willard_pallas_matches_xla():
    from waterorderlib_tpu.ops.pallas.willard_kernel import willard_density_points_pallas
    from waterorderlib_tpu.density import fields
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    n = 512
    box_len = (n / 0.033456) ** (1.0 / 3.0)
    pos = jnp.asarray(water_oxygen_lattice(n, box_len, seed=21), jnp.float32)
    box = jnp.asarray([box_len] * 3, dtype=jnp.float32)
    rs = np.random.RandomState(2)
    pts = jnp.asarray(rs.uniform(0, box_len, (1000, 3)), jnp.float32)
    d_p, n_p = willard_density_points_pallas(pos, pts, box, 2.4)
    d_x, n_x = fields.willard_density_points(pos, pts, box, 2.4, row_block=1000)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(n_p), np.asarray(n_x), atol=1e-4)


@needs_tpu
def test_qtet_traj_kernel_certified():
    from waterorderlib_tpu.ops.pallas.qtet_sorted import order_param_q_pallas_traj
    from waterorderlib_tpu.ops.pallas.qtet_kernel import order_param_q_pallas_frames
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    n, f = 1024, 3
    box_len = (n / 0.033456) ** (1.0 / 3.0)
    rs = np.random.RandomState(5)
    base = water_oxygen_lattice(n, box_len, seed=5)
    pos = jnp.asarray(
        np.stack([np.mod(base + rs.normal(scale=0.1, size=base.shape), box_len)
                  for _ in range(f)]), jnp.float32)
    boxes = jnp.asarray(np.tile(np.array([box_len] * 3, np.float32), (f, 1)))
    q_s, ok, covered = order_param_q_pallas_traj(pos, boxes, window=896, pad=256)
    q_b, _ = order_param_q_pallas_frames(pos, boxes)
    assert bool(np.all(np.asarray(covered)))
    ok_np = np.asarray(ok)
    assert ok_np.mean() > 0.999
    np.testing.assert_allclose(np.asarray(q_s)[ok_np], np.asarray(q_b)[ok_np], atol=1e-5)


@needs_tpu
def test_qtet2_kernels_match_oracle():
    """v2 single-scratch kernels (brute + certified slab) vs the XLA path."""
    from waterorderlib_tpu.ops.pallas import qtet2
    from waterorderlib_tpu.order import qtet
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    n, f = 1024, 3
    box_len = (n / 0.033456) ** (1.0 / 3.0)
    rs = np.random.RandomState(11)
    base = water_oxygen_lattice(n, box_len, seed=11)
    pos = jnp.asarray(
        np.stack([np.mod(base + rs.normal(scale=0.1, size=base.shape), box_len)
                  for _ in range(f)]), jnp.float32)
    boxes = jnp.asarray(np.tile(np.array([box_len] * 3, np.float32), (f, 1)))
    q_ref = np.stack([
        np.asarray(qtet.order_param_q(pos[t], pos[t], boxes[t], 0.0, 10.0, row_block=512))
        for t in range(f)
    ])
    q_b = np.asarray(qtet2.order_param_q_frames(pos, boxes, 0.0, 10.0, row_tile=256))
    np.testing.assert_allclose(q_b, q_ref, atol=1e-5)
    q_c = np.asarray(qtet2.order_param_q_certified(pos, boxes, 0.0, 10.0))
    np.testing.assert_allclose(q_c, q_ref, atol=1e-5)


@needs_tpu
def test_qtet2_certified_falls_back_on_sparse_box():
    """A dilute box (4th neighbor beyond margin) must fail certification and
    still return exact q via the brute fallback."""
    from waterorderlib_tpu.ops.pallas import qtet2
    from waterorderlib_tpu.order import qtet

    n, f = 512, 2
    box_len = 200.0  # very dilute: 4-NN distances far beyond margin=4.5
    rs = np.random.RandomState(13)
    pos = jnp.asarray(rs.uniform(0, box_len, (f, n, 3)), jnp.float32)
    boxes = jnp.asarray(np.tile(np.array([box_len] * 3, np.float32), (f, 1)))
    q_ref = np.stack([
        np.asarray(qtet.order_param_q(pos[t], pos[t], boxes[t], 0.0, 50.0, row_block=512))
        for t in range(f)
    ])
    q_c = np.asarray(qtet2.order_param_q_certified(pos, boxes, 0.0, 50.0))
    np.testing.assert_allclose(q_c, q_ref, atol=1e-5)


@needs_tpu
def test_threebody_kernel_matches_xla():
    """Fused 3-body kernel: per-center valid-angle multisets + counts match
    order.angles.neighbor_angles."""
    from waterorderlib_tpu.ops.pallas import angles_kernel
    from waterorderlib_tpu.order import angles as angles_mod
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    n, f = 1024, 2
    box_len = (n / 0.033456) ** (1.0 / 3.0)
    rs = np.random.RandomState(17)
    base = water_oxygen_lattice(n, box_len, seed=17)
    pos = jnp.asarray(
        np.stack([np.mod(base + rs.normal(scale=0.1, size=base.shape), box_len)
                  for _ in range(f)]), jnp.float32)
    boxes = jnp.asarray(np.tile(np.array([box_len] * 3, np.float32), (f, 1)))
    ang, cnt, covered = angles_kernel.neighbor_pair_angles_traj(
        pos, boxes, 0.0, 3.413, window=896, pad=256
    )
    assert bool(np.all(np.asarray(covered)))
    valid = np.asarray(angles_kernel.pair_validity(cnt))
    ang = np.asarray(ang)
    cnt = np.asarray(cnt)
    for t in range(f):
        aset = angles_mod.neighbor_angles(pos[t], pos[t], boxes[t], 0.0, 3.413, k=16)
        np.testing.assert_array_equal(cnt[t], np.asarray(aset.count))
        ref_ang = np.asarray(aset.ang)
        ref_val = np.asarray(aset.valid)
        for i in range(0, n, 97):  # sample centers
            got = np.sort(ang[t, i][valid[t, i]])
            want = np.sort(ref_ang[i][ref_val[i]])
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, atol=5e-3)  # acos f32


@needs_tpu
def test_three_body_calc_pallas_path(tmp_path):
    """Driver routes through the fused 3-body kernel on TPU; statistics and
    the histogram artifact must match the XLA path."""
    from waterorderlib_tpu.io.synthetic import make_water_box
    from waterorderlib_tpu.drivers.orderparams import three_body_calc

    top, traj = make_water_box(600, n_frames=3, seed=23)
    (tmp_path / "p").mkdir()
    (tmp_path / "x").mkdir()
    r1 = three_body_calc(top, traj, output_dir=str(tmp_path / "p"), row_block=256)
    h1 = np.loadtxt(tmp_path / "p" / "3bDistribution_0.txt")
    r2 = three_body_calc(top, traj, output_dir=str(tmp_path / "x"), row_block=600)
    h2 = np.loadtxt(tmp_path / "x" / "3bDistribution_0.txt")
    assert np.abs(h1[:, 1] - h2[:, 1]).sum() <= 8  # acos boundary-bin flips
    for a, b in zip(r1, r2):
        np.testing.assert_allclose(a[0], b[0], atol=1e-3)


@needs_tpu
def test_lsi_kernel_matches_xla():
    from waterorderlib_tpu.ops.pallas import lsi_kernel
    from waterorderlib_tpu.order import lsi as lsi_mod
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    n, f = 1024, 2
    box_len = (n / 0.033456) ** (1.0 / 3.0)
    rs = np.random.RandomState(29)
    base = water_oxygen_lattice(n, box_len, seed=29)
    pos = jnp.asarray(
        np.stack([np.mod(base + rs.normal(scale=0.1, size=base.shape), box_len)
                  for _ in range(f)]), jnp.float32)
    boxes = jnp.asarray(np.tile(np.array([box_len] * 3, np.float32), (f, 1)))
    # pad must span the drift-inflated margin (7.4 A + drift) in z — the
    # round-2 pad certificate rejects shallower boundary slabs
    v, ok, cnt, covered = lsi_kernel.lsi_traj(pos, boxes, 0.0, 3.7, window=1024, pad=512)
    assert bool(np.all(np.asarray(covered)))
    for t in range(f):
        ref = lsi_mod.lsi(pos[t], pos[t], boxes[t], 0.0, 3.7, k=24, row_block=512)
        np.testing.assert_array_equal(np.asarray(ok[t]), np.asarray(ref.valid))
        np.testing.assert_allclose(np.asarray(v[t]), np.asarray(ref.lsi), atol=2e-5)
        np.testing.assert_array_equal(np.asarray(cnt[t]), np.asarray(ref.count))


def test_lsi_split_interpret_matches_xla():
    """The split-shell LSI kernel (narrow in-shell extraction + wide
    next-shell min) matches the XLA reference in interpret mode on any
    backend, and its count certificate covers the liquid fixture."""
    from jax.experimental.pallas import tpu as pltpu

    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice
    from waterorderlib_tpu.ops.pallas import lsi_slab2
    from waterorderlib_tpu.order import lsi as lsi_mod

    n, f = 1024, 2
    box_len = (n / 0.033456) ** (1.0 / 3.0)
    rs = np.random.RandomState(29)
    base = water_oxygen_lattice(n, box_len, seed=29)
    pos = jnp.asarray(
        np.stack([np.mod(base + rs.normal(scale=0.1, size=base.shape), box_len)
                  for _ in range(f)]), jnp.float32)
    boxes = jnp.asarray(np.tile(np.array([box_len] * 3, np.float32), (f, 1)))
    with pltpu.force_tpu_interpret_mode():
        v, ok, cnt, covered = lsi_slab2.lsi_traj_split(
            pos, boxes, 0.0, 3.7, window_narrow=768, window_wide=1024,
            pad=512, seg=256,
        )
    assert bool(np.all(np.asarray(covered)))
    for t in range(f):
        ref = lsi_mod.lsi(pos[t], pos[t], boxes[t], 0.0, 3.7, k=24,
                          row_block=512)
        np.testing.assert_array_equal(np.asarray(ok[t]), np.asarray(ref.valid))
        np.testing.assert_allclose(np.asarray(v[t]), np.asarray(ref.lsi),
                                   atol=2e-5)
        np.testing.assert_array_equal(np.asarray(cnt[t]),
                                      np.asarray(ref.count))


def test_lsi_split_count_certificate_vetoes():
    """A row with more than K_IN in-shell neighbors must flip the frame's
    covered flag (the count certificate) instead of returning silently
    wrong values."""
    from jax.experimental.pallas import tpu as pltpu

    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice
    from waterorderlib_tpu.ops.pallas import lsi_slab2

    n = 512
    box_len = (n / 0.033456) ** (1.0 / 3.0)
    rs = np.random.RandomState(7)
    base = water_oxygen_lattice(n, box_len, seed=7)
    pos = np.mod(base + rs.normal(scale=0.1, size=base.shape), box_len)
    # a 16-member cluster inside one 3.7 A shell around pos[0]
    cluster = pos[0] + rs.normal(scale=1.2, size=(16, 3))
    pos[-16:] = np.clip(cluster, 0.0, box_len - 1e-3)
    pos = jnp.asarray(pos[None], jnp.float32)
    boxes = jnp.asarray(np.array([[box_len] * 3], np.float32))
    with pltpu.force_tpu_interpret_mode():
        v, ok, cnt, covered = lsi_slab2.lsi_traj_split(
            pos, boxes, 0.0, 3.7, window_narrow=512, window_wide=512,
            pad=256, seg=256,
        )
    assert not bool(np.asarray(covered)[0])


@needs_tpu
def test_lsi_split_on_tpu_matches_xla():
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice
    from waterorderlib_tpu.ops.pallas import lsi_slab2
    from waterorderlib_tpu.order import lsi as lsi_mod

    n, f = 4096, 2
    box_len = (n / 0.033456) ** (1.0 / 3.0)
    rs = np.random.RandomState(31)
    base = water_oxygen_lattice(n, box_len, seed=31)
    pos = jnp.asarray(
        np.stack([np.mod(base + rs.normal(scale=0.35, size=base.shape),
                         box_len) for _ in range(f)]), jnp.float32)
    boxes = jnp.asarray(np.tile(np.array([box_len] * 3, np.float32), (f, 1)))
    v, ok, cnt, covered = lsi_slab2.lsi_traj_split(
        pos, boxes, 0.0, 3.7, window_narrow=1536, window_wide=3072,
        pad=512, seg=768,
    )
    assert bool(np.all(np.asarray(covered)))
    for t in range(f):
        ref = lsi_mod.lsi(pos[t], pos[t], boxes[t], 0.0, 3.7, k=24,
                          row_block=512)
        np.testing.assert_array_equal(np.asarray(ok[t]), np.asarray(ref.valid))
        np.testing.assert_allclose(np.asarray(v[t]), np.asarray(ref.lsi),
                                   atol=2e-5)


@needs_tpu
def test_lsi_calc_pallas_path(tmp_path):
    from waterorderlib_tpu.io.synthetic import make_water_box
    from waterorderlib_tpu.drivers.orderparams import lsi_calc

    top, traj = make_water_box(600, n_frames=3, seed=31)
    (tmp_path / "p").mkdir()
    (tmp_path / "x").mkdir()
    a1, v1 = lsi_calc(top, traj, output_dir=str(tmp_path / "p"), row_block=256, max_neighbors=24)
    a2, v2 = lsi_calc(top, traj, output_dir=str(tmp_path / "x"), row_block=600, max_neighbors=24)
    np.testing.assert_allclose(a1[0], a2[0], atol=1e-5)
    h1 = np.loadtxt(tmp_path / "p" / "lsiDistribution_0.txt")
    h2 = np.loadtxt(tmp_path / "x" / "lsiDistribution_0.txt")
    assert np.abs(h1[:, 1] - h2[:, 1]).sum() <= 4


@needs_tpu
def test_hbond_counts_kernel_matches_xla():
    from waterorderlib_tpu.ops.pallas.hbond_kernel import hbond_counts
    from waterorderlib_tpu.hbonds.bonds import general_hbonds
    from waterorderlib_tpu.io.synthetic import make_water_box

    top, traj = make_water_box(400, n_frames=1, seed=37)
    wat_inds, wat_h, _ = top.get_wat_inds()
    p = jnp.asarray(traj.positions[0])
    box = jnp.asarray(traj.boxes[0])
    acc = p[wat_inds]
    don = jnp.repeat(p[wat_inds], 2, axis=0)
    donh = p[wat_h]
    mat = np.asarray(general_hbonds(acc, don, donh, box, 3.5, 120.0))
    a_cnt, d_cnt = hbond_counts(acc, don, donh, box, 3.5, 120.0)
    np.testing.assert_allclose(np.asarray(a_cnt), mat.sum(axis=1), atol=0)
    np.testing.assert_allclose(np.asarray(d_cnt), mat.sum(axis=0), atol=0)
    # non-water geometry: asymmetric acceptor/donor sets
    sol = p[wat_inds[:37]] + jnp.float32(0.3)
    solh = sol + jnp.float32(0.8)
    mat2 = np.asarray(general_hbonds(acc, sol, solh, box, 3.0, 150.0))
    a2, d2 = hbond_counts(acc, sol, solh, box, 3.0, 150.0)
    np.testing.assert_allclose(np.asarray(a2), mat2.sum(axis=1), atol=0)
    np.testing.assert_allclose(np.asarray(d2), mat2.sum(axis=0), atol=0)


@needs_tpu
def test_willard_grid_kernel_matches_xla():
    """z-slab Willard grid kernel vs the XLA field, incl. an off-box grid
    origin (density_grid spans the solute extent +- half a box)."""
    from waterorderlib_tpu.ops.pallas.willard_grid import willard_density_grid
    from waterorderlib_tpu.density import fields
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    n = 1024
    box_len = (n / 0.033456) ** (1.0 / 3.0)
    pos = jnp.asarray(water_oxygen_lattice(n, box_len, seed=41), jnp.float32)
    box = jnp.asarray([box_len] * 3, dtype=jnp.float32)
    ng = 33
    for g0 in (0.0, -7.3):  # in-box and off-box origins
        dg = float((box_len + 6.0) / ng) if g0 < 0 else float(box_len / ng)
        dens, norms, covered = willard_density_grid(
            pos, box, g0, dg, ng, g0, dg, ng, g0, dg, ng, 2.4, window=768, pad=384
        )
        assert bool(covered)
        g = jnp.asarray(np.arange(ng) * dg + g0, jnp.float32)
        d_ref, n_ref = fields.willard_density_field(
            pos, g, g, g, box, 2.4, nx=ng, ny=ng, nz=ng
        )
        np.testing.assert_allclose(np.asarray(dens), np.asarray(d_ref), atol=1e-6)
        # unit normals: compare directions only where the gradient is
        # meaningful (near-zero gradients normalize to noise directions)
        dots = np.sum(np.asarray(norms) * np.asarray(n_ref), axis=-1)
        assert np.mean(dots > 0.98) > 0.999


@needs_tpu
def test_willard_grid_kernel_small_system():
    """Regression: below one lane tile of atoms (or whenever a window could
    hold the whole set) the kernel must drop the boundary copies — a window
    holding an atom AND its +-L copy double-counts after z min-imaging, and
    w=0 windows don't lower at all."""
    from waterorderlib_tpu.ops.pallas.willard_grid import willard_density_grid
    from waterorderlib_tpu.density import fields

    rs = np.random.RandomState(11)
    for n in (62, 500):
        box_len = (n / 0.033456) ** (1.0 / 3.0)
        pos = jnp.asarray(rs.uniform(0, box_len, (n, 3)), jnp.float32)
        box = jnp.asarray([box_len] * 3, dtype=jnp.float32)
        ng = 17
        dg = float(box_len / ng)
        dens, _, covered = willard_density_grid(
            pos, box, 0.0, dg, ng, 0.0, dg, ng, 0.0, dg, ng, 2.4
        )
        assert bool(covered)
        g = jnp.asarray(np.arange(ng) * dg, jnp.float32)
        d_ref, _ = fields.willard_density_field(pos, g, g, g, box, 2.4, nx=ng, ny=ng, nz=ng)
        np.testing.assert_allclose(np.asarray(dens), np.asarray(d_ref), atol=1e-6)


def test_willard_grid_kernel_x_window_noncubic_interpret():
    """x-windowed plane kernel on a non-cubic box (Lx != Ly != Lz): the
    x-sort/copy/wrap prep keys off box[0] specifically, which no TPU test
    covers. Interpret mode, so this runs on any backend."""
    from jax.experimental.pallas import tpu as pltpu

    from waterorderlib_tpu.ops.pallas.willard_grid import (
        suggest_window_x,
        willard_density_grid,
    )
    from waterorderlib_tpu.density import fields

    rs = np.random.RandomState(9)
    n = 2048
    box = np.array([34.0, 44.0, 49.0], np.float32)
    pos = jnp.asarray(rs.uniform(0, 1, (n, 3)) * box[None, :], jnp.float32)
    boxj = jnp.asarray(box)
    ng = 9
    wx, px = suggest_window_x(n, float(box[0]), window=1024, slack=1.6)
    assert wx > 0
    gs = [
        np.linspace(0.0, float(box[d]), ng, endpoint=False).astype(np.float32)
        for d in range(3)
    ]
    with pltpu.force_tpu_interpret_mode():
        dens, _, cov = willard_density_grid(
            pos, boxj,
            float(gs[0][0]), float(gs[0][1] - gs[0][0]), ng,
            float(gs[1][0]), float(gs[1][1] - gs[1][0]), ng,
            float(gs[2][0]), float(gs[2][1] - gs[2][0]), ng,
            2.4, window=1024, pad=512, window_x=wx, pad_x=px,
        )
    d_ref, _ = fields.willard_density_field(
        pos, jnp.asarray(gs[0]), jnp.asarray(gs[1]), jnp.asarray(gs[2]),
        boxj, 2.4, nx=ng, ny=ng, nz=ng,
    )
    assert bool(cov)
    np.testing.assert_allclose(np.asarray(dens), np.asarray(d_ref), atol=2e-6)


@needs_tpu
def test_willard_grid_kernel_x_window():
    """x-windowed plane kernel (window_x > 0): per x-row sub-window scan
    must match the full-window kernel and the XLA field, certified, incl.
    an off-box grid origin."""
    from waterorderlib_tpu.ops.pallas.willard_grid import (
        suggest_window_x,
        willard_density_grid,
    )
    from waterorderlib_tpu.density import fields
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    n = 4096
    box_len = (n / 0.033456) ** (1.0 / 3.0)
    pos = jnp.asarray(water_oxygen_lattice(n, box_len, seed=47), jnp.float32)
    box = jnp.asarray([box_len] * 3, dtype=jnp.float32)
    ng = 33
    wx, px = suggest_window_x(n, float(box_len))
    assert wx > 0 and px >= 128  # the x path must actually engage at this N
    for g0 in (0.0, -7.3):
        dg = float((box_len + 6.0) / ng) if g0 < 0 else float(box_len / ng)
        dens, norms, covered = willard_density_grid(
            pos, box, g0, dg, ng, g0, dg, ng, g0, dg, ng, 2.4,
            window_x=wx, pad_x=px,
        )
        assert bool(covered)
        d_full, _, cov_full = willard_density_grid(
            pos, box, g0, dg, ng, g0, dg, ng, g0, dg, ng, 2.4
        )
        assert bool(cov_full)
        np.testing.assert_allclose(
            np.asarray(dens), np.asarray(d_full), atol=2e-6, rtol=1e-5
        )
        g = jnp.asarray(np.arange(ng) * dg + g0, jnp.float32)
        d_ref, n_ref = fields.willard_density_field(
            pos, g, g, g, box, 2.4, nx=ng, ny=ng, nz=ng
        )
        np.testing.assert_allclose(
            np.asarray(dens), np.asarray(d_ref), atol=2e-6, rtol=1e-5
        )
        dots = np.sum(np.asarray(norms) * np.asarray(n_ref), axis=-1)
        assert np.mean(dots > 0.98) > 0.999


@needs_tpu
def test_psi6_kernel_matches_xla():
    from waterorderlib_tpu.ops.pallas import psi6_kernel
    from waterorderlib_tpu.order import psi6 as psi6_mod
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    n, f = 1024, 2
    box_len = (n / 0.033456) ** (1.0 / 3.0)
    rs = np.random.RandomState(43)
    base = water_oxygen_lattice(n, box_len, seed=43)
    pos = jnp.asarray(
        np.stack([np.mod(base + rs.normal(scale=0.1, size=base.shape), box_len)
                  for _ in range(f)]), jnp.float32)
    boxes = jnp.asarray(np.tile(np.array([box_len] * 3, np.float32), (f, 1)))
    psi, cnt, covered = psi6_kernel.psi6_traj(pos, boxes, 0.0, 7.0, window=1024, pad=256)
    assert bool(np.all(np.asarray(covered)))
    for t in range(f):
        want = np.asarray(
            psi6_mod.order_param_psi(pos[t], pos[t], boxes[t], 0.0, 7.0, k=24, row_block=512)
        )
        np.testing.assert_allclose(np.asarray(psi[t]), want, atol=5e-5)


@needs_tpu
def test_hex_order_calc_pallas_path(tmp_path):
    from waterorderlib_tpu.io.synthetic import make_water_box
    from waterorderlib_tpu.drivers.orderparams import hex_order_calc

    top, traj = make_water_box(1200, n_frames=2, seed=47)
    (tmp_path / "p").mkdir()
    (tmp_path / "x").mkdir()
    a1, v1 = hex_order_calc(top, traj, output_dir=str(tmp_path / "p"), row_block=256)
    a2, v2 = hex_order_calc(top, traj, output_dir=str(tmp_path / "x"), row_block=600)
    np.testing.assert_allclose(a1[0], a2[0], atol=1e-4)
    h1 = np.loadtxt(tmp_path / "p" / "psiDistribution_0.txt")
    h2 = np.loadtxt(tmp_path / "x" / "psiDistribution_0.txt")
    assert np.abs(h1[:, 1] - h2[:, 1]).sum() <= 6


@needs_tpu
def test_qtet2_certified_16k_with_straggler_patch():
    """16k-atom frames: the slab kernel covers, a few atoms per million may
    fail the per-atom margin certificate, and the certified wrapper patches
    exactly those on the XLA path — full-trajectory exactness."""
    from waterorderlib_tpu.ops.pallas import qtet2
    from waterorderlib_tpu.order import qtet
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    n, f = 16384, 2
    box_len = (n / 0.033456) ** (1.0 / 3.0)
    rs = np.random.RandomState(3)
    base = water_oxygen_lattice(n, box_len, seed=3)
    pos = jnp.asarray(
        np.stack([np.mod(base + rs.normal(scale=0.1, size=base.shape), box_len)
                  for _ in range(f)]), jnp.float32)
    boxes = jnp.asarray(np.tile(np.array([box_len] * 3, np.float32), (f, 1)))
    q = np.asarray(qtet2.order_param_q_certified(pos, boxes, 0.0, 10.0))
    for t in range(f):
        want = np.asarray(qtet.order_param_q(pos[t], pos[t], boxes[t], 0.0, 10.0, row_block=512))
        np.testing.assert_allclose(q[t], want, atol=2e-5)


@needs_tpu
def test_qtet_chunked_bit_matches_monolithic():
    """The window-chunked carry kernel (qtet_chunked.py) must be bit-equal
    to the monolithic slab kernel for the same window, across 1-segment and
    multi-segment configurations."""
    from waterorderlib_tpu.ops.pallas import qtet2, qtet_chunked
    from waterorderlib_tpu.ops.pallas.slab import suggest_pad
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    n, f = 4096, 2
    box_len = (n / 0.033456) ** (1.0 / 3.0)
    rs = np.random.RandomState(11)
    base = water_oxygen_lattice(n, box_len, seed=11)
    pos = jnp.asarray(
        np.stack([np.mod(base + rs.normal(scale=0.1, size=base.shape), box_len)
                  for _ in range(f)]), jnp.float32)
    boxes = jnp.asarray(np.tile(np.array([box_len] * 3, np.float32), (f, 1)))
    pad = suggest_pad(n, box_len, 6.5)
    for window in (1536, 3072):  # 1 and 2 segments at seg=1536
        q2, ok2, cov2 = qtet2.order_param_q_traj(
            pos, boxes, 0.0, 10.0, row_tile=128, window=window, pad=pad)
        qc, okc, covc = qtet_chunked.order_param_q_traj_chunked(
            pos, boxes, 0.0, 10.0, row_tile=128, window=window, pad=pad, seg=1536)
        assert bool(np.asarray(cov2).all()) and bool(np.asarray(covc).all())
        np.testing.assert_array_equal(np.asarray(q2), np.asarray(qc))
        np.testing.assert_array_equal(np.asarray(ok2), np.asarray(okc))


@needs_tpu
def test_angles_chunked_bit_matches_monolithic():
    """The window-chunked 3-body kernel must be bit-equal to the monolithic
    angles kernel for the same window (1- and 2-segment configurations)."""
    from waterorderlib_tpu.ops.pallas import angles_kernel, angles_chunked
    from waterorderlib_tpu.ops.pallas.slab import suggest_pad
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    n, f = 4096, 2
    box_len = (n / 0.033456) ** (1.0 / 3.0)
    rs = np.random.RandomState(13)
    base = water_oxygen_lattice(n, box_len, seed=13)
    pos = jnp.asarray(
        np.stack([np.mod(base + rs.normal(scale=0.1, size=base.shape), box_len)
                  for _ in range(f)]), jnp.float32)
    boxes = jnp.asarray(np.tile(np.array([box_len] * 3, np.float32), (f, 1)))
    pad = suggest_pad(n, box_len, 6.5)
    for window in (1536, 3072):
        a1, c1, v1 = angles_kernel.neighbor_pair_angles_traj(
            pos, boxes, 0.0, 3.413, window=window, pad=pad, row_tile=128)
        a2, c2, v2 = angles_chunked.neighbor_pair_angles_traj_chunked(
            pos, boxes, 0.0, 3.413, window=window, pad=pad, seg=1536, row_tile=128)
        assert bool(np.asarray(v1).all()) and bool(np.asarray(v2).all())
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


@needs_tpu
def test_lsi_psi6_chunked_bit_match_monolithic():
    """The window-chunked LSI and psi6 kernels must be bit-equal to their
    monolithic counterparts for the same window (2-segment configuration)."""
    from waterorderlib_tpu.ops.pallas import (
        lsi_chunked, lsi_kernel, psi6_chunked, psi6_kernel,
    )
    from waterorderlib_tpu.ops.pallas.slab import suggest_pad
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    n, f = 4096, 2
    box_len = (n / 0.033456) ** (1.0 / 3.0)
    rs = np.random.RandomState(17)
    base = water_oxygen_lattice(n, box_len, seed=17)
    pos = jnp.asarray(
        np.stack([np.mod(base + rs.normal(scale=0.1, size=base.shape), box_len)
                  for _ in range(f)]), jnp.float32)
    boxes = jnp.asarray(np.tile(np.array([box_len] * 3, np.float32), (f, 1)))

    pad = suggest_pad(n, box_len, 9.4)
    v1, ok1, c1, cov1 = lsi_kernel.lsi_traj(
        pos, boxes, 0.0, 3.7, window=3072, pad=pad, row_tile=128)
    v2, ok2, c2, cov2 = lsi_chunked.lsi_traj_chunked(
        pos, boxes, 0.0, 3.7, window=3072, pad=pad, seg=1536, row_tile=128)
    assert bool(np.asarray(cov1).all()) and bool(np.asarray(cov2).all())
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))

    pad = suggest_pad(n, box_len, 9.0)
    p1, pc1, pv1 = psi6_kernel.psi6_traj(
        pos, boxes, 0.0, 7.0, window=3072, pad=pad, row_tile=128)
    p2, pc2, pv2 = psi6_chunked.psi6_traj_chunked(
        pos, boxes, 0.0, 7.0, window=3072, pad=pad, seg=1536, row_tile=128)
    assert bool(np.asarray(pv1).all()) and bool(np.asarray(pv2).all())
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(pc1), np.asarray(pc2))


@needs_tpu
def test_hbond_slab_matches_dense():
    """The z-slab two-set H-bond kernel must reproduce the dense kernel's
    acceptor/donor counts exactly when its window certificate holds."""
    from waterorderlib_tpu.ops.pallas.hbond_kernel import hbond_counts
    from waterorderlib_tpu.ops.pallas.hbond_slab import (
        hbond_counts_slab, suggest_pad_two_set, suggest_window_two_set,
    )
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    n = 4096
    box_len = (n / 0.033456) ** (1.0 / 3.0)
    rs = np.random.RandomState(23)
    base = water_oxygen_lattice(n, box_len, seed=23).astype(np.float32)
    box = jnp.asarray([box_len] * 3, jnp.float32)
    acc = jnp.asarray(base)
    don = jnp.concatenate([acc, acc], axis=0)
    h_off = rs.normal(scale=0.6, size=(2 * n, 3)).astype(np.float32)
    h_off /= np.linalg.norm(h_off, axis=1, keepdims=True)
    donh = don + jnp.asarray(h_off)

    win = suggest_window_two_set(n, 2 * n, box_len, 3.5)
    pad = suggest_pad_two_set(2 * n, box_len, 5.5)
    a_s, d_s, cov = hbond_counts_slab(acc, don, donh, box, 3.5, 120.0,
                                      window=win, pad=pad)
    assert bool(cov)
    a_ref, d_ref = hbond_counts(acc, don, donh, box, 3.5, 120.0)
    np.testing.assert_array_equal(np.asarray(a_s), np.asarray(a_ref))
    np.testing.assert_array_equal(np.asarray(d_s), np.asarray(d_ref))

    # an undersized window must fail the certificate, not silently prune
    _, _, cov_small = hbond_counts_slab(acc, don, donh, box, 3.5, 120.0,
                                        window=512, pad=pad)
    assert not bool(cov_small)


@needs_tpu
def test_qtet_hbm_bit_matches_chunked():
    """The HBM-resident kernel (DMA'd coordinate slabs) must be bit-equal
    to the VMEM-chunked kernel for the same window."""
    from waterorderlib_tpu.ops.pallas import qtet_chunked, qtet_hbm
    from waterorderlib_tpu.ops.pallas.slab import suggest_pad
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    n, f = 4096, 2
    box_len = (n / 0.033456) ** (1.0 / 3.0)
    rs = np.random.RandomState(29)
    base = water_oxygen_lattice(n, box_len, seed=29)
    pos = jnp.asarray(
        np.stack([np.mod(base + rs.normal(scale=0.1, size=base.shape), box_len)
                  for _ in range(f)]), jnp.float32)
    boxes = jnp.asarray(np.tile(np.array([box_len] * 3, np.float32), (f, 1)))
    pad = suggest_pad(n, box_len, 6.5)
    for window in (1536, 3072):
        qc, okc, covc = qtet_chunked.order_param_q_traj_chunked(
            pos, boxes, 0.0, 10.0, row_tile=128, window=window, pad=pad, seg=1536)
        qh, okh, covh = qtet_hbm.order_param_q_traj_hbm(
            pos, boxes, 0.0, 10.0, row_tile=128, window=window, pad=pad, seg=1536)
        assert bool(np.asarray(covc).all()) and bool(np.asarray(covh).all())
        np.testing.assert_array_equal(np.asarray(qc), np.asarray(qh))
        np.testing.assert_array_equal(np.asarray(okc), np.asarray(okh))


@needs_tpu
def test_angles_hbm_bit_matches_chunked():
    """The HBM-resident 3-body kernel must be bit-equal to the VMEM-chunked
    kernel for the same window."""
    from waterorderlib_tpu.ops.pallas import angles_chunked, angles_hbm
    from waterorderlib_tpu.ops.pallas.slab import suggest_pad
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    n, f = 4096, 2
    box_len = (n / 0.033456) ** (1.0 / 3.0)
    rs = np.random.RandomState(31)
    base = water_oxygen_lattice(n, box_len, seed=31)
    pos = jnp.asarray(
        np.stack([np.mod(base + rs.normal(scale=0.1, size=base.shape), box_len)
                  for _ in range(f)]), jnp.float32)
    boxes = jnp.asarray(np.tile(np.array([box_len] * 3, np.float32), (f, 1)))
    pad = suggest_pad(n, box_len, 6.5)
    for window in (1536, 3072):
        a1, c1, v1 = angles_chunked.neighbor_pair_angles_traj_chunked(
            pos, boxes, 0.0, 3.413, window=window, pad=pad, seg=1536, row_tile=128)
        a2, c2, v2 = angles_hbm.neighbor_pair_angles_traj_hbm(
            pos, boxes, 0.0, 3.413, window=window, pad=pad, seg=1536, row_tile=128)
        assert bool(np.asarray(v1).all()) and bool(np.asarray(v2).all())
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


@needs_tpu
def test_lsi_hbm_bit_matches_chunked():
    """The HBM-resident LSI kernel (imaged+raw coords in one 8-sublane DMA
    stream) must be bit-equal to the VMEM-chunked kernel for the same
    window."""
    from waterorderlib_tpu.ops.pallas import lsi_chunked, lsi_hbm
    from waterorderlib_tpu.ops.pallas.slab import suggest_pad
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    n, f = 4096, 2
    box_len = (n / 0.033456) ** (1.0 / 3.0)
    rs = np.random.RandomState(37)
    base = water_oxygen_lattice(n, box_len, seed=37)
    pos = jnp.asarray(
        np.stack([np.mod(base + rs.normal(scale=0.1, size=base.shape), box_len)
                  for _ in range(f)]), jnp.float32)
    boxes = jnp.asarray(np.tile(np.array([box_len] * 3, np.float32), (f, 1)))
    pad = suggest_pad(n, box_len, 3.7 + 3.7 + 2.0)
    for window in (3072, 6144):
        l1, ok1, c1, v1 = lsi_chunked.lsi_traj_chunked(
            pos, boxes, 0.0, 3.7, window=window, pad=pad, seg=1536, row_tile=128)
        l2, ok2, c2, v2 = lsi_hbm.lsi_traj_hbm(
            pos, boxes, 0.0, 3.7, window=window, pad=pad, seg=1536, row_tile=128)
        assert bool(np.asarray(v1).all()) and bool(np.asarray(v2).all())
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
        np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok2))
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


@needs_tpu
def test_psi6_hbm_bit_matches_chunked():
    """The HBM-resident psi-6 kernel must be bit-equal to the VMEM-chunked
    kernel for the same window."""
    from waterorderlib_tpu.ops.pallas import psi6_chunked, psi6_hbm
    from waterorderlib_tpu.ops.pallas.slab import suggest_pad
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    n, f = 4096, 2
    box_len = (n / 0.033456) ** (1.0 / 3.0)
    rs = np.random.RandomState(41)
    base = water_oxygen_lattice(n, box_len, seed=41)
    pos = jnp.asarray(
        np.stack([np.mod(base + rs.normal(scale=0.1, size=base.shape), box_len)
                  for _ in range(f)]), jnp.float32)
    boxes = jnp.asarray(np.tile(np.array([box_len] * 3, np.float32), (f, 1)))
    pad = suggest_pad(n, box_len, 9.0)
    for window in (3072, 6144):
        p1, c1, v1 = psi6_chunked.psi6_traj_chunked(
            pos, boxes, 0.0, 7.0, window=window, pad=pad, seg=1536, row_tile=128)
        p2, c2, v2 = psi6_hbm.psi6_traj_hbm(
            pos, boxes, 0.0, 7.0, window=window, pad=pad, seg=1536, row_tile=128)
        assert bool(np.asarray(v1).all()) and bool(np.asarray(v2).all())
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
