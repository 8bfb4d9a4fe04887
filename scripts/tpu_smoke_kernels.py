"""Small-shape TPU compile/run smoke of every kernel that landed during
the relay outage — run this FIRST when the relay recovers (each case
compiles in seconds at these shapes, vs minutes for the 12k sweep).

    timeout 1800 python scripts/tpu_smoke_kernels.py

Each case prints PASS/FAIL with the error class; correctness is asserted
against the XLA oracles at f32 tolerance.
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _water(n, seed=0, jitter=0.6):
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    box_l = (n / 0.033456) ** (1.0 / 3.0)
    base = np.asarray(water_oxygen_lattice(n, box_l, seed=1), float)
    rs = np.random.RandomState(seed)
    return ((base + rs.normal(scale=jitter, size=base.shape)) % box_l).astype(
        np.float32
    ), box_l


def case(name):
    def deco(fn):
        CASES.append((name, fn))
        return fn

    return deco


CASES = []


@case("voronoi_topk_pallas (first-half kernel)")
def _topk():
    import jax.numpy as jnp

    from waterorderlib_tpu.ops.pallas.voronoi_topk import voronoi_topk_pallas
    from waterorderlib_tpu.surface import voronoi_device as vd

    pts, box_l = _water(1536)
    p = jnp.asarray(pts)
    ext = vd.mirror_points_device(p, box_l)
    d, idx, valid, cov = voronoi_topk_pallas(
        p, ext, 64, row_block=128, win=int(ext.shape[0]), seg=768
    )
    dw, iw, vw, cw = vd._windowed_topk(p, ext, 64, 128, int(ext.shape[0]))
    both = np.asarray(cov) & np.asarray(cw)
    np.testing.assert_allclose(
        np.asarray(d)[both], np.asarray(dw)[both], rtol=1e-6, atol=1e-5
    )
    return f"{both.sum()} covered rows match"


def _cells(n, k, ks, dedup_mode):
    import jax.numpy as jnp

    from waterorderlib_tpu.ops import pairs as ops_pairs
    from waterorderlib_tpu.ops.pallas.voronoi_cells import voronoi_cells_pallas
    from waterorderlib_tpu.surface import voronoi_device as vd

    pts, box_l = _water(n)
    p = jnp.asarray(pts)
    ext = vd.mirror_points_device(p, box_l)
    box = jnp.asarray([vd._NO_PBC_BOX] * 3, jnp.float32)
    nl = ops_pairs.topk_neighbors(
        p, ext, box, k=ks, low_cut=0.0, high_cut=jnp.inf, row_block=128
    )
    rel = ext[nl.idx] - p[:, None, :]
    park = jnp.asarray(vd._park_directions(ks), jnp.float32) * jnp.float32(
        vd._FAR
    )
    relp = jnp.where(nl.valid[..., None], rel, park)
    is_b = jnp.any(nl.idx[:, :k] >= n, axis=1)
    out = voronoi_cells_pallas(relp, nl.valid, is_b, k, 1e-4, dedup_mode=dedup_mode)
    import jax

    ref = jax.vmap(lambda r, o: vd._cell_moments_clip(r, o, k, 1e-4))(
        rel, nl.valid
    )
    ro, po = np.asarray(ref["ok_shape"]), np.asarray(out["ok_shape"])
    xor = int((ro ^ po).sum())
    both = ro & po
    dv = np.abs(
        np.asarray(out["vol"])[both] / np.asarray(ref["vol"])[both] - 1
    ).max()
    assert xor <= 0.01 * n, f"ok_shape xor {xor}"
    assert dv < 1e-4, f"vol rel {dv}"
    return f"ok xor={xor}, vol rel diff {dv:.1e}, {both.sum()} cells"


@case("voronoi_cells_pallas (32,64) auto-dedup")
def _c1():
    return _cells(512, 32, 64, "auto")


@case("voronoi_cells_pallas (32,64) always-dedup")
def _c2():
    return _cells(512, 32, 64, "always")


@case("voronoi_cells_pallas (40,96) auto-dedup")
def _c3():
    return _cells(512, 40, 96, "auto")


@case("sasa MXU occlusion kernel")
def _sasa():
    import jax.numpy as jnp

    from waterorderlib_tpu.core.geometry import sphere_points
    from waterorderlib_tpu.ops.pallas.sasa_kernel import sphere_areas_pallas
    from waterorderlib_tpu.surface.sasa import sphere_surface_areas_topk

    pts, box_l = _water(1024)
    radii = jnp.full((1024,), 2.9, jnp.float32)
    u = jnp.asarray(sphere_points(1000), jnp.float32)
    box = jnp.asarray([box_l] * 3, jnp.float32)
    a_p, e_p, ok_p = sphere_areas_pallas(jnp.asarray(pts), radii, u, box)
    a_r, e_r, ok_r = sphere_surface_areas_topk(jnp.asarray(pts), radii, u, box)
    d = np.abs(np.asarray(a_p) - np.asarray(a_r)).max()
    assert d < 0.2, f"area diff {d}"  # < 2 points of 4 pi r^2 / 1000
    return f"max area diff {d:.2e}, ok={bool(ok_p)}"


@case("willard x-window grid kernel (first-half)")
def _willard():
    import jax.numpy as jnp

    from waterorderlib_tpu.ops.pallas.willard_grid import (
        suggest_window_x,
        willard_density_grid,
    )

    pts, box_l = _water(4096)
    box = jnp.asarray([box_l] * 3, jnp.float32)
    g0, dg = 0.0, float(box_l / 41)
    wx, px = suggest_window_x(4096, float(box_l))
    d, _, cov = willard_density_grid(
        jnp.asarray(pts), box, g0, dg, 41, g0, dg, 41, g0, dg, 41, 2.4,
        window_x=wx, pad_x=px,
    )
    d0, _, _ = willard_density_grid(
        jnp.asarray(pts), box, g0, dg, 41, g0, dg, 41, g0, dg, 41, 2.4,
    )
    err = float(jnp.max(jnp.abs(d - d0)))
    assert bool(cov), "x-window coverage certificate failed"
    assert err < 1e-4, f"max diff {err}"
    return f"covered, max|diff| {err:.1e} (window_x={wx})"


if __name__ == "__main__":
    import jax

    print("devices:", jax.devices(), flush=True)
    failures = 0
    only = sys.argv[1:] if len(sys.argv) > 1 else None
    for name, fn in CASES:
        if only and not any(s in name for s in only):
            continue
        try:
            msg = fn()
            print(f"PASS {name}: {msg}", flush=True)
        except Exception as e:  # noqa: BLE001 — smoke survey
            failures += 1
            print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
    print(f"{len(CASES) - failures}/{len(CASES)} kernels pass", flush=True)
    sys.exit(1 if failures else 0)
