#!/usr/bin/env python
"""Round-4 follow-up chip measurements, after the geometric (p4/16-grid)
escalation-window quantization landed:

  - windowed top-K search alone at the PRODUCTION tier-1 window (the
    round-4a ablation full-scanned: 229.7 ms; tier-1 e2e was 177 ms, so
    the windowed search had to be cheaper — measure it properly)
  - per-frame hybrid e2e x4 frames (round-4a: 53/29/10.7 s — recompile
    bound on the 512-grid window values)
  - frames-batched hybrid warm (round-4a: 441 ms/frame)
  - 131k warm repeat x2 (round-4a: 66 s with recompiles)

Emits one JSON dict to stdout and /tmp/perf_round4b.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = {}


def rec(k, v):
    OUT[k] = v
    print(f"{k} = {v}", flush=True)
    with open("/tmp/perf_round4b.json", "w") as f:
        json.dump(OUT, f, indent=1)


def make_frames(n, f, seed=5):
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    box_len = (n / 0.033456) ** (1.0 / 3.0)
    rs = np.random.RandomState(seed)
    base = water_oxygen_lattice(n, box_len, seed=seed)
    pos = np.stack(
        [np.mod(base + rs.normal(scale=0.35, size=base.shape), box_len)
         for _ in range(f)]
    ).astype(np.float32)
    return pos, float(box_len)


def main():
    import jax
    import jax.numpy as jnp

    rec("platform", jax.devices()[0].platform)
    from waterorderlib_tpu.surface.voronoi_device import (
        _suggest_mirror_budget,
        _suggest_win,
        mirror_points_pruned,
        voronoi_volumes_hybrid,
        voronoi_volumes_hybrid_frames,
    )
    from waterorderlib_tpu.ops.pallas.voronoi_topk import voronoi_topk_pallas

    NV = 12288
    pos, bl = make_frames(NV, 4)

    # --- windowed search alone at the production tier-1 window ---
    try:
        budget = _suggest_mirror_budget(NV, bl, 64)
        pts0 = jnp.asarray(pos[0])
        ext0, _, _ = mirror_points_pruned(pts0, bl, budget)
        p4 = int(ext0.shape[0])
        win = _suggest_win(NV, p4, bl, 64) or p4
        rec("tier1_search_window", [win, p4])

        def search_only(p):
            ext, _, _ = mirror_points_pruned(p, bl, budget)
            dist, idx, valid, cov = voronoi_topk_pallas(
                p, ext, 64, row_block=128, win=win, seg=768
            )
            return idx

        r = search_only(pts0)
        jax.block_until_ready(r)
        best = float("inf")
        for i in range(4):
            p = jnp.asarray(pos[i % 4])
            t0 = time.perf_counter()
            r = search_only(p)
            _ = np.asarray(r[:4])
            best = min(best, time.perf_counter() - t0)
        rec("ablate_windowed_search_ms", round(best * 1e3, 2))
    except Exception as e:
        rec("ablate_windowed_search_ms", f"failed: {type(e).__name__}: {e}"[:300])

    # --- per-frame hybrid e2e, quantized-window ladder ---
    try:
        t0 = time.perf_counter()
        vol, area, nc = voronoi_volumes_hybrid(pos[0], bl, NV)
        rec("hybrid12k_perframe_cold_s", round(time.perf_counter() - t0, 1))
        times = []
        for i in range(1, 4):
            t0 = time.perf_counter()
            vol, area, nc = voronoi_volumes_hybrid(pos[i], bl, NV)
            times.append(time.perf_counter() - t0)
        # one more pass over the same frames: the fully-warm cost
        for i in range(1, 4):
            t0 = time.perf_counter()
            vol, area, nc = voronoi_volumes_hybrid(
                np.mod(pos[i] + np.float32(0.013), bl), bl, NV
            )
            times.append(time.perf_counter() - t0)
        rec("hybrid12k_perframe_ms", [round(t * 1e3, 1) for t in times])
        rec("hybrid12k_certified", int(nc))
    except Exception as e:
        rec("hybrid12k_perframe_ms", f"failed: {type(e).__name__}: {e}"[:300])

    # --- frames-batched hybrid ---
    try:
        F = 8
        posf, _ = make_frames(NV, F, seed=7)
        bls = np.full((F,), bl, np.float32)
        t0 = time.perf_counter()
        volb, areab, certb = voronoi_volumes_hybrid_frames(posf, bls, NV)
        rec("hybrid12k_frames8_cold_s", round(time.perf_counter() - t0, 1))
        for rep in range(2):
            posf2 = np.mod(posf + np.float32(0.07 * (rep + 1)), bl)
            t0 = time.perf_counter()
            volb, areab, certb = voronoi_volumes_hybrid_frames(posf2, bls, NV)
            dt = time.perf_counter() - t0
            rec(f"hybrid12k_frames8_warm_ms_per_frame_rep{rep}",
                round(dt / F * 1e3, 1))
        rec("hybrid12k_frames8_certified", int(np.asarray(certb).sum()))
    except Exception as e:
        rec("hybrid12k_frames8_warm_ms_per_frame_rep0",
            f"failed: {type(e).__name__}: {e}"[:300])

    # --- SASA MXU kernel after the Precision.HIGHEST fix: parity + time ---
    try:
        from waterorderlib_tpu.core.geometry import sphere_points
        from waterorderlib_tpu.ops.pallas.sasa_kernel import sphere_areas_pallas
        from waterorderlib_tpu.surface.sasa import sphere_surface_areas_topk

        ns = 4096
        poss, bls_ = make_frames(ns, 1, seed=3)
        ps = jnp.asarray(poss[0])
        box = jnp.array([bls_] * 3, jnp.float32)
        radii = jnp.full((ns,), 2.9, jnp.float32)
        upts = jnp.asarray(sphere_points(1000), jnp.float32)
        a_x, _, ok_x = sphere_surface_areas_topk(ps, radii, upts, box)
        a_m, _, ok_m = sphere_areas_pallas(ps, radii, upts, box)
        jax.block_until_ready(a_m)
        rec("sasa4k_mxu_maxabs_vs_xla", float(jnp.max(jnp.abs(a_x - a_m))))
        best = float("inf")
        for i in range(3):
            p = ps + jnp.float32(1e-3 * (i + 1))
            t0 = time.perf_counter()
            a_m, _, _ = sphere_areas_pallas(p, radii, upts, box)
            _ = np.asarray(a_m[:4])
            best = min(best, time.perf_counter() - t0)
        rec("sasa4k_mxu_highest_ms", round(best * 1e3, 2))
    except Exception as e:
        rec("sasa4k_mxu_highest_ms", f"failed: {type(e).__name__}: {e}"[:300])

    # --- 131k warm repeat ---
    try:
        NB = 131072
        posb, blb = make_frames(NB, 3, seed=9)
        t0 = time.perf_counter()
        vol, area, nc = voronoi_volumes_hybrid(posb[0], blb, NB)
        rec("hybrid131k_cold_s", round(time.perf_counter() - t0, 1))
        for i in (1, 2):
            t0 = time.perf_counter()
            vol, area, nc = voronoi_volumes_hybrid(posb[i], blb, NB)
            rec(f"hybrid131k_warm_s_f{i}", round(time.perf_counter() - t0, 2))
        rec("hybrid131k_certified", int(nc))
    except Exception as e:
        rec("hybrid131k_warm_s_f1", f"failed: {type(e).__name__}: {e}"[:300])

    print(json.dumps(OUT))


if __name__ == "__main__":
    main()
