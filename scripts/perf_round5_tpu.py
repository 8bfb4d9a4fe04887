#!/usr/bin/env python
"""Round-5 on-chip measurements: the 3-D cell-grid Voronoi candidate search
vs the round-4 z-window path, end-to-end hybrid numbers at 12k/131k, and
the contacts path at 12k. Writes /tmp/perf_round5.json as it goes.

Usage: python scripts/perf_round5_tpu.py [stage ...]
Stages: tier1 frames frames_wide big contacts (default: all)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = {}
OUT = "/tmp/perf_round5.json"


def rec(key, **kw):
    RESULTS[key] = kw
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(key, kw, flush=True)


def make_fix(n, frames, scale=0.35, seed=5):
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    box = (n / 0.033456) ** (1.0 / 3.0)
    rs = np.random.RandomState(seed)
    base = water_oxygen_lattice(n, box, seed=seed)
    pos = np.stack(
        [np.mod(base + rs.normal(scale=scale, size=base.shape), box)
         for _ in range(frames)]
    ).astype(np.float32)
    return pos, box


def stage_tier1():
    """Tier-1 cells only (search + clip), cellgrid vs window, 12k."""
    import jax

    from waterorderlib_tpu.surface import voronoi_device as vd

    n = 12288
    pos, box = make_fix(n, 3)
    cg = vd._suggest_cellgrid(n, box, 64)
    rec("cellgrid_suggestion_12k", n_side=cg[0], cap=cg[1],
        lanes=27 * cg[1], zwin=vd._suggest_win(n, 4 * n, box, 64))
    for name, kw in (
        ("tier1_cellgrid", dict(cg=cg)),
        ("tier1_window", dict(cg=None)),
    ):
        try:
            r = vd.voronoi_cells_device(pos[0], box, n, **kw)
            ncert = int(np.asarray(r["certified"]).sum())
            cov = float(np.asarray(r["win_covered"]).mean())
            best = float("inf")
            for i in range(3):
                t0 = time.time()
                r = vd.voronoi_cells_device(pos[(i + 1) % 3], box, n, **kw)
                _ = np.asarray(r["vol"][:8])
                best = min(best, time.time() - t0)
            rec(name, ms=round(best * 1e3, 2), certified=ncert, n=n,
                covered_frac=round(cov, 4))
        except Exception as e:
            rec(name, error=f"{type(e).__name__}: {e}")


def stage_frames(tiers_name="default"):
    """Frames-batched hybrid e2e per frame at 12k — the 50x-bar metric."""
    from waterorderlib_tpu.surface import voronoi_device as vd

    n = 12288
    F = 16
    pos, box = make_fix(n, F)
    bls = np.full((F,), box, np.float32)
    tiers = vd.DEFAULT_TIERS if tiers_name == "default" else vd.WIDE_TIERS
    key = f"voronoi_frames_e2e_12k_{tiers_name}"
    try:
        t0 = time.time()
        volb, areab, certb = vd.voronoi_volumes_hybrid_frames(
            pos, bls, n, tiers=tiers
        )
        cold = time.time() - t0
        best = float("inf")
        for i in range(2):
            t0 = time.time()
            volb, areab, certb = vd.voronoi_volumes_hybrid_frames(
                np.mod(pos + np.float32(1e-3 * (i + 1)), box), bls, n,
                tiers=tiers,
            )
            best = min(best, (time.time() - t0) / F)
        rec(key, ms_per_frame=round(best * 1e3, 2), frames=F, n=n,
            cold_s=round(cold, 1),
            certified_frac=round(int(certb) / (n * F), 5),
            vol_sum_rel_err=float(abs(volb.sum() / F - box**3) / box**3))
    except Exception as e:
        rec(key, error=f"{type(e).__name__}: {e}")


def stage_big():
    """131k single-frame hybrid (round-4: warm 12.7 s/frame)."""
    from waterorderlib_tpu.surface import voronoi_device as vd

    n = 131072
    pos, box = make_fix(n, 2, seed=7)
    cg = vd._suggest_cellgrid(n, box, 64)
    rec("cellgrid_suggestion_131k", n_side=cg[0], cap=cg[1],
        lanes=27 * cg[1], zwin=vd._suggest_win(n, 4 * n, box, 64))
    try:
        t0 = time.time()
        vol, area, nc = vd.voronoi_volumes_hybrid(pos[0], box, n)
        cold = time.time() - t0
        t0 = time.time()
        vol, area, nc = vd.voronoi_volumes_hybrid(pos[1], box, n)
        warm = time.time() - t0
        rec("voronoi_hybrid_131k", warm_s=round(warm, 2),
            cold_s=round(cold, 1), certified=int(nc), n=n,
            vol_sum_rel_err=float(abs(vol.sum() - box**3) / box**3))
    except Exception as e:
        rec("voronoi_hybrid_131k", error=f"{type(e).__name__}: {e}")


def stage_frames_big():
    """131k frames-batched hybrid (F=4)."""
    from waterorderlib_tpu.surface import voronoi_device as vd

    n = 131072
    F = 4
    pos, box = make_fix(n, F, seed=9)
    bls = np.full((F,), box, np.float32)
    try:
        t0 = time.time()
        volb, areab, certb = vd.voronoi_volumes_hybrid_frames(pos, bls, n)
        cold = time.time() - t0
        t0 = time.time()
        volb, areab, certb = vd.voronoi_volumes_hybrid_frames(
            np.mod(pos + np.float32(1e-3), box), bls, n
        )
        warm = (time.time() - t0) / F
        rec("voronoi_frames_e2e_131k", ms_per_frame=round(warm * 1e3, 1),
            frames=F, n=n, cold_s=round(cold, 1),
            certified_frac=round(int(certb) / (n * F), 5))
    except Exception as e:
        rec("voronoi_frames_e2e_131k", error=f"{type(e).__name__}: {e}")


def stage_contacts():
    """Contacts at 12k through the frames-batched device path (solute rows
    restricted to 512 rows, like a production solvated system)."""
    from waterorderlib_tpu.surface import voronoi_device as vd

    n = 12288
    F = 8
    pos, box = make_fix(n, F, seed=11)
    bls = np.full((F,), box, np.float32)
    rows = np.arange(512)
    try:
        t0 = time.time()
        outs = list(vd.voronoi_contacts_hybrid_frames(
            pos, bls, n, rows=rows
        ))
        cold = time.time() - t0
        ncert = sum(o[4] for o in outs)
        t0 = time.time()
        outs = list(vd.voronoi_contacts_hybrid_frames(
            np.mod(pos + np.float32(1e-3), box), bls, n, rows=rows
        ))
        warm = (time.time() - t0) / F
        rec("voronoi_contacts_e2e_12k", ms_per_frame=round(warm * 1e3, 1),
            frames=F, n=n, rows=len(rows), cold_s=round(cold, 1),
            certified_frac=round(ncert / (len(rows) * F), 4))
    except Exception as e:
        rec("voronoi_contacts_e2e_12k", error=f"{type(e).__name__}: {e}")


def stage_ladders():
    """Alternate escalation ladder shapes at 12k: fewer, wider tiers trade
    one extra-wide subset pass against two intermediate dispatches."""
    from waterorderlib_tpu.surface import voronoi_device as vd

    n = 12288
    F = 16
    pos, box = make_fix(n, F)
    bls = np.full((F,), box, np.float32)
    for name, tiers in (
        ("short", ((32, 64), (64, 128), (128, 256))),
        ("short96", ((32, 64), (48, 96), (96, 192), (128, 256))),
    ):
        key = f"voronoi_frames_e2e_12k_{name}"
        try:
            t0 = time.time()
            vd.voronoi_volumes_hybrid_frames(pos, bls, n, tiers=tiers)
            cold = time.time() - t0
            best = float("inf")
            for i in range(2):
                t0 = time.time()
                volb, areab, certb = vd.voronoi_volumes_hybrid_frames(
                    np.mod(pos + np.float32(1e-3 * (i + 1)), box), bls, n,
                    tiers=tiers,
                )
                best = min(best, (time.time() - t0) / F)
            rec(key, ms_per_frame=round(best * 1e3, 2), frames=F, n=n,
                cold_s=round(cold, 1),
                certified_frac=round(int(certb) / (n * F), 5))
        except Exception as e:
            rec(key, error=f"{type(e).__name__}: {e}")


STAGES = {
    "tier1": stage_tier1,
    "frames": lambda: stage_frames("default"),
    "frames_wide": lambda: stage_frames("wide"),
    "frames_big": stage_frames_big,
    "big": stage_big,
    "contacts": stage_contacts,
    "ladders": stage_ladders,
}

if __name__ == "__main__":
    want = sys.argv[1:] or ["tier1", "frames", "frames_wide", "big",
                            "frames_big", "contacts"]
    for w in want:
        print(f"=== stage {w} ===", flush=True)
        STAGES[w]()
    print(json.dumps(RESULTS))
