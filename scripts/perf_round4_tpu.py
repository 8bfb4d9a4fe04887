#!/usr/bin/env python
"""Round-4 on-chip measurements (run on the real TPU, one process at a time).

Three questions the round-3 verdict left open:
  1. What does voronoi_volumes_hybrid cost END TO END per frame at 12k after
     the jit-shape-stability fixes (512-grid escalation windows, unshrunk
     row_block, bucket-padded subsets) — per-frame AND frames-batched?
  2. Which stage is the floor — the top-K candidate search or the cell
     (clip) builder? (Ablation: topk alone vs full tier-1.)
  3. Do the measured numbers hit the 50x bar (<= 41 ms/frame vs the 2.05 s
     host path), and if not, what is the proven ceiling?

Emits one JSON dict to stdout (and /tmp/perf_round4.json).
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
    with open("/tmp/perf_round4.json", "w") as f:
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
        mirror_points_pruned,
        _suggest_mirror_budget,
        voronoi_cells_device,
        voronoi_volumes_hybrid,
        voronoi_volumes_hybrid_frames,
    )
    from waterorderlib_tpu.ops.pallas.voronoi_topk import voronoi_topk_pallas

    NV = 12288
    pos, bl = make_frames(NV, 4)

    # --- stage ablation: mirrors + top-K search alone (tier-1 config) ---
    budget = _suggest_mirror_budget(NV, bl, 64)
    pts0 = jnp.asarray(pos[0])

    def search_only(p):
        ext, _, _ = mirror_points_pruned(p, bl, budget)
        dist, idx, valid, cov = voronoi_topk_pallas(
            p, ext, 64, row_block=128, win=ext.shape[0], seg=768
        )
        return idx

    t = None
    try:
        r = search_only(pts0)
        jax.block_until_ready(r)
        best = float("inf")
        for i in range(4):
            p = jnp.asarray(pos[i % 4])
            t0 = time.perf_counter()
            r = search_only(p)
            _ = np.asarray(r[:4])
            best = min(best, time.perf_counter() - t0)
        rec("ablate_mirror+topk_ms", round(best * 1e3, 2))
    except Exception as e:
        rec("ablate_mirror+topk_ms", f"failed: {type(e).__name__}: {e}"[:300])

    # --- tier-1 full (search + clip cells), production defaults ---
    try:
        r = voronoi_cells_device(pts0, bl, NV)
        jax.block_until_ready(r["vol"])
        best = float("inf")
        for i in range(4):
            t0 = time.perf_counter()
            r = voronoi_cells_device(jnp.asarray(pos[i % 4]), bl, NV)
            _ = np.asarray(r["vol"][:4])
            best = min(best, time.perf_counter() - t0)
        ncert = int(np.asarray(r["certified"]).sum())
        rec("tier1_full_ms", round(best * 1e3, 2))
        rec("tier1_certified_frac", round(ncert / NV, 4))
    except Exception as e:
        rec("tier1_full_ms", f"failed: {type(e).__name__}: {e}"[:300])

    # --- hybrid e2e per frame (the judged number), varying frames ---
    try:
        t_cold0 = time.perf_counter()
        vol, area, nc = voronoi_volumes_hybrid(pos[0], bl, NV)
        rec("hybrid12k_perframe_cold_s", round(time.perf_counter() - t_cold0, 1))
        times = []
        for i in range(1, 4):
            t0 = time.perf_counter()
            vol, area, nc = voronoi_volumes_hybrid(pos[i], bl, NV)
            times.append(time.perf_counter() - t0)
        rec("hybrid12k_perframe_ms", [round(t * 1e3, 1) for t in times])
        rec("hybrid12k_certified", int(nc))
    except Exception as e:
        rec("hybrid12k_perframe_ms", f"failed: {type(e).__name__}: {e}"[:300])

    # --- frames-batched hybrid (production trajectory path) ---
    try:
        F = 8
        posf, _ = make_frames(NV, F, seed=7)
        bls = np.full((F,), bl, np.float32)
        t_cold = time.perf_counter()
        volb, areab, certb = voronoi_volumes_hybrid_frames(posf, bls, NV)
        rec("hybrid12k_frames8_cold_s", round(time.perf_counter() - t_cold, 1))
        posf2 = np.mod(posf + np.float32(0.07), bl)
        t0 = time.perf_counter()
        volb, areab, certb = voronoi_volumes_hybrid_frames(posf2, bls, NV)
        dt = time.perf_counter() - t0
        rec("hybrid12k_frames8_warm_ms_per_frame", round(dt / F * 1e3, 1))
        rec("hybrid12k_frames8_certified", int(np.asarray(certb).sum()))
    except Exception as e:
        rec("hybrid12k_frames8_warm_ms_per_frame",
            f"failed: {type(e).__name__}: {e}"[:300])

    # --- 131k datapoint refresh (verdict item 3: updated 131k number) ---
    try:
        NB = 131072
        posb, blb = make_frames(NB, 2, seed=9)
        t_cold = time.perf_counter()
        vol, area, nc = voronoi_volumes_hybrid(posb[0], blb, NB)
        rec("hybrid131k_cold_s", round(time.perf_counter() - t_cold, 1))
        t0 = time.perf_counter()
        vol, area, nc = voronoi_volumes_hybrid(posb[1], blb, NB)
        rec("hybrid131k_warm_s", round(time.perf_counter() - t0, 2))
        rec("hybrid131k_certified", int(nc))
    except Exception as e:
        rec("hybrid131k_warm_s", f"failed: {type(e).__name__}: {e}"[:300])

    print(json.dumps(OUT))


if __name__ == "__main__":
    main()
