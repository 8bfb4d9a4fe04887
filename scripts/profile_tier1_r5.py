#!/usr/bin/env python
"""Round-5 tier-1 decomposition at 12k, frames-batched (F=16).

Stages (args: any subset of: search tier1 esc e2e):
  search — cellgrid candidate search ONLY (pallas vs xla select), batched
  tier1  — full tier-1 (search + cells + certificate) at (32,64) / (40,80)
           / (48,96): warm ms/frame + cert_frac each
  esc    — escalation ladder (deferred-fetch) from the (32,64) tier-1
  e2e    — voronoi_volumes_hybrid_frames warm, default tiers

Writes /tmp/profile_tier1_r5.json incrementally.
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = {}
OUT = "/tmp/profile_tier1_r5.json"


def rec(key, **kw):
    RESULTS[key] = kw
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(key, kw, flush=True)


def main(stages, n=12288, F=16):
    import jax
    import jax.numpy as jnp

    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice
    from waterorderlib_tpu.surface import voronoi_device as vd

    box = (n / 0.033456) ** (1.0 / 3.0)
    rs = np.random.RandomState(5)
    base = water_oxygen_lattice(n, box, seed=5)
    mk = lambda: np.stack([
        np.mod(base + rs.normal(scale=0.35, size=base.shape), box)
        for _ in range(F)
    ]).astype(np.float32)
    pos = mk()
    pos2 = mk()
    bls = np.full((F,), box, np.float64)
    pb = jnp.asarray(pos)
    pb2 = jnp.asarray(pos2)
    bl = jnp.asarray(bls, pb.dtype)

    if "search" in stages:

        @partial(jax.jit, static_argnames=("ks", "n_side", "cap", "select"))
        def search_only(pbj, blj, ks, n_side, cap, select):
            def one(args):
                p, b = args
                ext = vd.mirror_points_device(p, b)
                d, i, v, c = vd._cellgrid_topk(
                    p, ext, b, ks, 256, n_side, cap, select=select
                )
                return d.sum(), c.sum()

            return jax.lax.map(one, (pbj, blj))

        for ks in (64, 96):
            cg = vd._suggest_cellgrid(n, box, ks)
            for sel in ("pallas", "xla"):
                t0 = time.time()
                s, c = search_only(pb, bl, ks, cg[0], cg[1], sel)
                _ = np.asarray(s)
                cold = time.time() - t0
                t0 = time.time()
                s, c = search_only(pb2, bl, ks, cg[0], cg[1], sel)
                cov = np.asarray(c)
                warm = time.time() - t0
                rec(f"search_ks{ks}_{sel}",
                    ms_per_frame=round(warm / F * 1e3, 2),
                    cold_s=round(cold, 1), cg=list(cg),
                    cov_frac=round(float(cov.sum()) / (n * F), 4))

    tier1_out = {}
    if "tier1" in stages or "esc" in stages:
        for k0, ks0 in ((32, 64), (40, 80), (48, 96)):
            eps, win, seg, attempts, mb, cg = vd._batch_static_config(
                pos, bls, k0, ks0, vd.DEFAULT_CELL_IMPL, nc=n
            )
            ti, ci = attempts[0]
            cg_t = cg if ti in ("cellgrid", "cellgrid_x") else None
            mb_t = 0 if cg_t is not None else mb
            t0 = time.time()
            v, a, c = vd._tier1_frames_local(
                pb, bl, n, k0, ks0, 256, float(eps), int(win), ti, seg, ci,
                mb_t, cg_t,
            )
            _ = np.asarray(v)
            cold = time.time() - t0
            t0 = time.time()
            v, a, c = vd._tier1_frames_local(
                pb2, bl, n, k0, ks0, 256, float(eps), int(win), ti, seg, ci,
                mb_t, cg_t,
            )
            vol_b = np.asarray(v, np.float64).copy()
            area_b = np.asarray(a, np.float64).copy()
            cert_b = np.asarray(c, bool).copy()
            warm = time.time() - t0
            tier1_out[(k0, ks0)] = (vol_b, area_b, cert_b)
            rec(f"tier1_{k0}_{ks0}", ms_per_frame=round(warm / F * 1e3, 2),
                cold_s=round(cold, 1), topk=ti, cells=ci,
                cert_frac=round(cert_b.mean(), 4),
                bad_max=int((~cert_b).sum(axis=1).max()))

    if "esc" in stages:
        for k0, ks0 in ((32, 64), (40, 80)):
            vol_b, area_b, cert_b = tier1_out[(k0, ks0)]
            tiers_rest = tuple(
                t for t in vd.DEFAULT_TIERS if t[0] > k0
            )
            for rnd in ("cold", "warm"):
                t0 = time.time()
                vol2, area2, cert2, payload = vd._escalate_frames_batched(
                    pos2, bls, vol_b.copy(), area_b.copy(), cert_b.copy(),
                    tiers_rest, vd.DEFAULT_CELL_IMPL,
                )
                esc = time.time() - t0
                rec(f"esc_from_{k0}_{ks0}_{rnd}",
                    ms_per_frame=round(esc / F * 1e3, 2),
                    cert_frac=round(cert2.mean(), 5),
                    n_payload=sum(1 for p in payload if p))

    if "e2e" in stages:
        t0 = time.time()
        vb, ab, nc = vd.voronoi_volumes_hybrid_frames(pos, bls, n)
        cold = time.time() - t0
        t0 = time.time()
        vb, ab, nc = vd.voronoi_volumes_hybrid_frames(pos2, bls, n)
        warm = time.time() - t0
        rec("e2e_default", ms_per_frame=round(warm / F * 1e3, 2),
            cold_s=round(cold, 1),
            certified_frac=round(int(nc) / (n * F), 5))

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    stages = sys.argv[1:] or ["search", "tier1", "esc", "e2e"]
    main(stages)
