

def test_pallas_occlusion_kernel_matches_topk_interpret():
    """The MXU occlusion kernel (interpret mode, any backend) matches the
    XLA occluder-pruned sweep: identical visible-point counts up to
    occlusion-boundary rounding (zero flips on a liquid box), identical
    certificate."""
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from waterorderlib_tpu.core.geometry import sphere_points
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice
    from waterorderlib_tpu.ops.pallas.sasa_kernel import sphere_areas_pallas
    from waterorderlib_tpu.surface.sasa import sphere_surface_areas_topk

    n = 600
    box_l = (n / 0.033456) ** (1.0 / 3.0)
    base = np.asarray(water_oxygen_lattice(n, box_l, seed=1), float)
    rs = np.random.RandomState(0)
    pos = ((base + rs.normal(scale=0.6, size=base.shape)) % box_l).astype(
        np.float32
    )
    radii = (1.4 + 0.2 * rs.rand(n)).astype(np.float32)
    pts = sphere_points(240)
    box = jnp.asarray([box_l] * 3, jnp.float32)
    a_ref, e_ref, ok_ref = sphere_surface_areas_topk(
        jnp.asarray(pos), jnp.asarray(radii), jnp.asarray(pts), box
    )
    with pltpu.force_tpu_interpret_mode():
        a_p, e_p, ok_p = sphere_areas_pallas(pos, radii, pts, box)
    assert bool(ok_ref) and bool(ok_p)
    nv_ref = np.asarray(a_ref) / (4 * np.pi * radii**2) * 240
    nv_p = np.asarray(a_p) / (4 * np.pi * radii**2) * 240
    # boundary-rounding flips move counts by whole points; none expected
    # on a generic liquid box
    assert np.abs(nv_ref - nv_p).max() < 0.5
    assert (np.asarray(e_ref) ^ np.asarray(e_p)).sum() == 0


def test_sasa_pallas_fallback_logs_and_stays_correct(monkeypatch, caplog):
    """If the MXU kernel fails on hardware, sasa_per_atom logs and falls
    back to the XLA occluder-pruned sweep with identical results."""
    import logging
    import types

    import jax
    import jax.numpy as jnp
    import numpy as np

    import waterorderlib_tpu.ops.pallas.sasa_kernel as sk
    import waterorderlib_tpu.surface.sasa as sasa_mod
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    n = 600
    box_l = (n / 0.033456) ** (1.0 / 3.0)
    base = np.asarray(water_oxygen_lattice(n, box_l, seed=1), float)
    rs = np.random.RandomState(0)
    pos = ((base + rs.normal(scale=0.6, size=base.shape)) % box_l).astype(
        np.float32
    )
    radii = np.full(n, 1.5, np.float32)
    box = jnp.asarray([box_l] * 3, jnp.float32)
    a_ref, e_ref = sasa_mod.sasa_per_atom(pos, radii, box)

    monkeypatch.setattr(
        jax, "devices", lambda *a, **k: [types.SimpleNamespace(platform="tpu")]
    )
    # the MXU kernel is quarantined behind an explicit opt-in (measured
    # slower AND wrong on chip, round 4); opt in to exercise its fallback
    monkeypatch.setenv("WOL_SASA_MXU", "1")

    def boom(*a, **k):
        raise jax.errors.JaxRuntimeError("simulated mosaic failure")

    monkeypatch.setattr(sk, "sphere_areas_pallas", boom)
    sasa_mod._logged_tiers.clear()
    with caplog.at_level(logging.WARNING, logger="waterorderlib_tpu"):
        a_f, e_f = sasa_mod.sasa_per_atom(pos, radii, box)
    assert any("sasa pallas kernel failed" in r.message for r in caplog.records)
    np.testing.assert_array_equal(np.asarray(a_f), np.asarray(a_ref))
    np.testing.assert_array_equal(np.asarray(e_f), np.asarray(e_ref))


def test_sasa_mxu_quarantined_by_default(monkeypatch):
    """Without the WOL_SASA_MXU opt-in, sasa_per_atom must never call the
    MXU occlusion kernel even on a TPU backend: measured on the real chip
    (round 4) it returns areas off by up to 0.53 A^2 vs the XLA oracle, so
    reaching it silently would be a correctness bug."""
    import types

    import jax
    import jax.numpy as jnp
    import numpy as np

    import waterorderlib_tpu.ops.pallas.sasa_kernel as sk
    import waterorderlib_tpu.surface.sasa as sasa_mod
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    n = 600
    box_l = (n / 0.033456) ** (1.0 / 3.0)
    pos = np.asarray(water_oxygen_lattice(n, box_l, seed=1), np.float32)
    radii = np.full(n, 1.5, np.float32)
    box = jnp.asarray([box_l] * 3, jnp.float32)

    monkeypatch.delenv("WOL_SASA_MXU", raising=False)
    monkeypatch.setattr(
        jax, "devices", lambda *a, **k: [types.SimpleNamespace(platform="tpu")]
    )

    def boom(*a, **k):  # pragma: no cover — reaching this IS the failure
        raise AssertionError("quarantined MXU kernel was called by default")

    monkeypatch.setattr(sk, "sphere_areas_pallas", boom)
    areas, exposed = sasa_mod.sasa_per_atom(pos, radii, box)
    assert np.all(np.isfinite(np.asarray(areas)))
