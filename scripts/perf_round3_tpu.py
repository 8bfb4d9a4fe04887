"""Round-3 second-half TPU timing sweep: the changes that landed during
the relay outage, measured on the real chip in one run.

Usage (default axon env, NOT the CPU bypass):
    timeout 3600 python scripts/perf_round3_tpu.py [section ...]
Sections: voronoi willard (default: both). Prints one line per
measurement and dumps JSON to /tmp/perf_round3.json incrementally.

Timing rules (.claude/skills/verify): fetch data to host as the barrier,
perturb inputs every iteration (the relay memoizes identical dispatches).
"""

import json
import sys
import time

import numpy as np

RESULTS = {}


def _dump():
    with open("/tmp/perf_round3.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)


def _time(fn, n_iter=3, warmup=1):
    import jax

    for _ in range(warmup):
        out = fn(0)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for it in range(n_iter):
        out = fn(it + 1)
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # host fetch barrier
    return (time.perf_counter() - t0) / n_iter


def _water(n, seed=0, jitter=0.6):
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    box_l = (n / 0.033456) ** (1.0 / 3.0)
    base = np.asarray(water_oxygen_lattice(n, box_l, seed=1), float)
    rs = np.random.RandomState(seed)
    return ((base + rs.normal(scale=jitter, size=base.shape)) % box_l).astype(
        np.float32
    ), box_l


def sec_voronoi():
    """Device Voronoi at 12k — the ladder of this round's changes:
    round-2 config (triple builder + XLA window top-k), clip builder,
    pallas top-k, fused cell kernel; then the hybrid end to end."""
    import jax.numpy as jnp

    from waterorderlib_tpu.surface import voronoi_device as vd

    pts, box_l = _water(12288)
    n = len(pts)
    win = None

    def run(cell_impl, topk_impl, it, k=32, ks=64, seg=768):
        p = jnp.asarray(pts + np.float32(1e-6 * it))
        ext = vd.mirror_points_device(p, box_l)
        box = jnp.asarray([vd._NO_PBC_BOX] * 3, jnp.float32)
        w = vd._suggest_win(n, int(ext.shape[0]), float(box_l), ks)
        out = vd._cells_blocked(
            p, ext, box, k, ks, 256, 1e-4, win=w,
            topk_impl=topk_impl, topk_seg=seg, cell_impl=cell_impl,
        )
        return out["vol"]

    def run_tier(k, ks, it):
        return run("pallas", "pallas", it, k=k, ks=ks, seg=512)

    for label, cell, topk in (
        ("triple+window_r2cfg", "triple", "window"),
        ("clip+window", "clip", "window"),
        ("clip+pallas_topk", "clip", "pallas"),
        ("fusedcells+pallas_topk", "pallas", "pallas"),
    ):
        try:
            dt = _time(lambda it, c=cell, t=topk: run(c, t, it))
            RESULTS[f"voronoi12k_{label}_ms"] = dt * 1e3
            print(f"voronoi 12k {label}: {dt*1e3:.1f} ms/frame", flush=True)
        except Exception as e:  # noqa: BLE001 — survey run: record, continue
            RESULTS[f"voronoi12k_{label}_ms"] = f"failed: {type(e).__name__}: {e}"
            print(
                f"voronoi 12k {label} FAILED: {type(e).__name__}: {e}",
                flush=True,
            )
        _dump()

    # fused kernel at the wide tier-1 config (40, 96)
    try:
        dt = _time(lambda it: run_tier(40, 96, it))
        RESULTS["voronoi12k_fused_40_96_ms"] = dt * 1e3
        print(f"voronoi 12k fused (40,96): {dt*1e3:.1f} ms/frame", flush=True)
    except Exception as e:  # noqa: BLE001
        RESULTS["voronoi12k_fused_40_96_ms"] = f"failed: {type(e).__name__}: {e}"
        print(f"voronoi 12k fused (40,96) FAILED: {e}", flush=True)
    _dump()

    # large-N scaling: hybrid end to end at 131k atoms (the device path has
    # no N^2 stage — z-window top-K + per-cell clip — so this should scale
    # ~linearly from 12k; uncertified residue closes on the rescue tiers)
    try:
        pts_l, box_ll = _water(131072)
        t0 = time.perf_counter()
        vol_l, area_l, nc_l = vd.voronoi_volumes_hybrid(
            pts_l, box_ll, len(pts_l)
        )
        RESULTS["voronoi131k_hybrid_cold_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        vol_l, area_l, nc_l = vd.voronoi_volumes_hybrid(
            pts_l + np.float32(1e-5), box_ll, len(pts_l)
        )
        RESULTS["voronoi131k_hybrid_s"] = time.perf_counter() - t0
        RESULTS["voronoi131k_certified"] = int(nc_l)
        print(
            f"voronoi 131k hybrid e2e: {RESULTS['voronoi131k_hybrid_s']:.2f} "
            f"s/frame warm, certified {nc_l}/131072", flush=True,
        )
    except Exception as e:  # noqa: BLE001
        RESULTS["voronoi131k_hybrid_s"] = f"failed: {type(e).__name__}: {e}"
        print(f"voronoi 131k FAILED: {e}", flush=True)
    _dump()

    # hybrid end to end (full dispatcher + tier ladder + host fallback),
    # default vs wide tier-1 ladder
    for tiers, tag in ((vd.DEFAULT_TIERS, "default"), (vd.WIDE_TIERS, "wide")):
        for it, key in (
            (0, f"voronoi12k_hybrid_{tag}_cold_s"),
            (1, f"voronoi12k_hybrid_{tag}_s"),
        ):
            t0 = time.perf_counter()
            vol, area, nc = vd.voronoi_volumes_hybrid(
                pts + np.float32(1e-5 * it), box_l, n, tiers=tiers
            )
            RESULTS[key] = time.perf_counter() - t0
        RESULTS[f"voronoi12k_certified_{tag}"] = int(nc)
        print(
            f"voronoi 12k hybrid[{tag}] e2e: "
            f"{RESULTS[f'voronoi12k_hybrid_{tag}_s']*1e3:.0f} ms/frame warm "
            f"({RESULTS[f'voronoi12k_hybrid_{tag}_cold_s']:.1f} s cold), "
            f"certified {nc}/{n} — round-2 host 2050 ms, 50x bar 41 ms",
            flush=True,
        )
        _dump()


def sec_willard():
    """x-windowed Willard plane kernel at the bench config (4096 atoms,
    81^3 grid) vs the full-window kernel."""
    import jax
    import jax.numpy as jnp

    from waterorderlib_tpu.ops.pallas.willard_grid import (
        suggest_window_x,
        willard_density_grid,
    )

    pts, box_l = _water(4096)
    box = jnp.asarray([box_l] * 3, jnp.float32)
    g0, dg = 0.0, float(box_l / 81)
    wxw, pxw = suggest_window_x(4096, float(box_l))
    RESULTS["willard_window_x"] = [int(wxw), int(pxw)]
    print(f"suggest_window_x -> window_x={wxw}, pad_x={pxw}", flush=True)

    def run(wx, px, it):
        p = jnp.asarray(pts + np.float32(1e-6 * it))
        d, _, cov = willard_density_grid(
            p, box, g0, dg, 81, g0, dg, 81, g0, dg, 81, 2.4,
            window_x=wx, pad_x=px,
        )
        return d, cov

    dt_full = _time(lambda it: run(0, 0, it))
    RESULTS["willard4k_fullwin_ms"] = dt_full * 1e3
    print(f"willard 4k full-window: {dt_full*1e3:.2f} ms/frame", flush=True)
    if wxw:
        d, cov = run(wxw, pxw, 0)
        covered = bool(np.asarray(cov))
        RESULTS["willard4k_xwindow_covered"] = covered
        if covered:
            dt_win = _time(lambda it: run(wxw, pxw, it))
            RESULTS["willard4k_xwindow_ms"] = dt_win * 1e3
            print(
                f"willard 4k x-window: {dt_win*1e3:.2f} ms/frame "
                f"({dt_full/max(dt_win, 1e-9):.2f}x)", flush=True
            )
            d0, _ = run(0, 0, 0)
            err = float(jnp.max(jnp.abs(d - d0)))
            RESULTS["willard4k_xwindow_maxabs_vs_full"] = err
            print(f"willard x-window vs full max|diff|: {err:.2e}", flush=True)
    _dump()


def sec_sasa():
    """MXU occlusion kernel vs XLA topk sweep, 4096 and 12288 atoms."""
    import jax.numpy as jnp

    from waterorderlib_tpu.core.geometry import sphere_points
    from waterorderlib_tpu.ops.pallas.sasa_kernel import sphere_areas_pallas
    from waterorderlib_tpu.surface.sasa import sphere_surface_areas_topk

    pts = jnp.asarray(sphere_points(1000), jnp.float32)
    for n in (4096, 12288):
        pos, box_l = _water(n)
        box = jnp.asarray([box_l] * 3, jnp.float32)
        radii = jnp.full((n,), 2.9, jnp.float32)

        def xla(it):
            a, _, _ = sphere_surface_areas_topk(
                jnp.asarray(pos + np.float32(1e-6 * it)), radii, pts, box
            )
            return a

        def mxu(it):
            a, _, _ = sphere_areas_pallas(
                jnp.asarray(pos + np.float32(1e-6 * it)), radii, pts, box
            )
            return a

        dt_x = _time(xla)
        RESULTS[f"sasa{n}_xla_ms"] = dt_x * 1e3
        print(f"sasa {n} xla-topk: {dt_x*1e3:.1f} ms/frame", flush=True)
        try:
            dt_m = _time(mxu)
            RESULTS[f"sasa{n}_mxu_ms"] = dt_m * 1e3
            print(
                f"sasa {n} mxu-kernel: {dt_m*1e3:.1f} ms/frame "
                f"({dt_x/max(dt_m,1e-9):.1f}x)", flush=True
            )
        except Exception as e:  # noqa: BLE001
            RESULTS[f"sasa{n}_mxu_ms"] = f"failed: {type(e).__name__}: {e}"
            print(f"sasa {n} mxu FAILED: {e}", flush=True)
        _dump()


def sec_vframes():
    """Frame-batched tier-1 (voronoi_volumes_hybrid_frames, mesh=None on
    the single chip): amortizes per-frame dispatch/retrace vs the per-frame
    hybrid loop. 12k atoms x 4 frames."""
    from waterorderlib_tpu.surface import voronoi_device as vd

    F, n = 4, 12288
    pts0, box_l = _water(n)
    pos = np.stack([
        ((pts0 + np.float32(0.01 * f)) % np.float32(box_l)) for f in range(F)
    ])
    box_ls = np.full(F, box_l)

    t0 = time.perf_counter()
    vol, area, nc = vd.voronoi_volumes_hybrid_frames(pos, box_ls, n)
    RESULTS["vframes12kx4_cold_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    vol, area, nc = vd.voronoi_volumes_hybrid_frames(
        pos + np.float32(1e-5), box_ls, n
    )
    warm = time.perf_counter() - t0
    RESULTS["vframes12kx4_warm_ms_per_frame"] = warm / F * 1e3
    RESULTS["vframes12kx4_certified"] = int(nc)
    print(
        f"voronoi frames batch 12k x {F}: {warm/F*1e3:.0f} ms/frame warm "
        f"({RESULTS['vframes12kx4_cold_s']:.1f} s cold), certified "
        f"{nc}/{F*n}", flush=True,
    )

    # per-frame hybrid loop over the same 4 frames for the dispatch-overhead
    # comparison (kernels warm from the batch run's tiers)
    t0 = time.perf_counter()
    tot_c = 0
    for f in range(F):
        _, _, c = vd.voronoi_volumes_hybrid(
            pos[f] + np.float32(2e-5), box_l, n
        )
        tot_c += c
    per = (time.perf_counter() - t0) / F
    RESULTS["vframes12kx4_perframe_ms"] = per * 1e3
    print(
        f"per-frame hybrid same workload: {per*1e3:.0f} ms/frame "
        f"(certified {tot_c}/{F*n})", flush=True,
    )
    _dump()


if __name__ == "__main__":
    # time-bounded backend probe BEFORE this process touches jax: a wedged
    # relay must yield one structured JSON line, not an indefinite hang
    # (same contract as bench.probe_backend)
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import probe_backend

    ok, detail = probe_backend()
    if not ok:
        print(json.dumps({"error": "tpu_backend_unavailable", "detail": detail}))
        sys.exit(0)

    import jax

    print("devices:", jax.devices(), flush=True)
    sections = sys.argv[1:] or ["voronoi", "willard", "sasa", "vframes"]
    for s in sections:
        print(f"=== {s} ===", flush=True)
        try:
            globals()[f"sec_{s}"]()
        except Exception as e:  # noqa: BLE001 — keep the sweep going
            print(f"section {s} failed: {type(e).__name__}: {e}", flush=True)
            RESULTS[f"section_{s}"] = f"failed: {e}"
            _dump()
    print(json.dumps(RESULTS, indent=1))
