

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
