#!/usr/bin/env python
"""Stage ablation of the frames-batched hybrid at 12k: tier-1 batch,
each escalation tier, host close. Writes /tmp/ablate_frames.json."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = {}
OUT = "/tmp/ablate_frames.json"


def rec(key, **kw):
    RESULTS[key] = kw
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(key, kw, flush=True)


def main(n=12288, F=16):
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
    bls = np.full((F,), box, np.float64)

    k0, ks0 = vd.DEFAULT_TIERS[0]
    eps, win, seg, attempts, mb, cg = vd._batch_static_config(
        pos, bls, k0, ks0, vd.DEFAULT_CELL_IMPL, nc=n
    )
    rec("config", attempts=[list(a) for a in attempts], win=int(win),
        seg=int(seg), mb=int(mb), cg=list(cg) if cg else None)

    ti, ci = attempts[0]
    pb = jnp.asarray(pos)
    bl = jnp.asarray(bls, pb.dtype)
    cg_t = cg if ti in ("cellgrid", "cellgrid_x") else None
    mb_t = 0 if cg_t is not None else mb

    t0 = time.time()
    v, a, c = vd._tier1_frames_local(
        pb, bl, n, k0, ks0, 256, float(eps), int(win), ti, seg, ci, mb_t,
        cg_t,
    )
    _ = np.asarray(v)  # data fetch is the only real barrier on this relay
    cold = time.time() - t0
    # fresh batch for warm timing
    pos2 = mk()
    pb2 = jnp.asarray(pos2)
    t0 = time.time()
    v, a, c = vd._tier1_frames_local(
        pb2, bl, n, k0, ks0, 256, float(eps), int(win), ti, seg, ci, mb_t,
        cg_t,
    )
    vol_b = np.asarray(v, np.float64).copy()
    area_b = np.asarray(a, np.float64).copy()
    cert_b = np.asarray(c, bool).copy()
    warm = time.time() - t0
    rec("tier1_batch", ms_per_frame=round(warm / F * 1e3, 2),
        cold_s=round(cold, 1), cert_frac=round(cert_b.mean(), 4),
        bad_max=int((~cert_b).sum(axis=1).max()))

    # escalation ladder, timed per tier via monkey-wrap
    orig = vd._tier_subset_frames
    tier_times = []

    def wrapped(*args, **kw):
        t0 = time.time()
        out = orig(*args, **kw)
        _ = np.asarray(out[0])
        tier_times.append((args[3], args[4], round(time.time() - t0, 3)))
        return out

    vd._tier_subset_frames = wrapped
    try:
        for rnd in ("cold", "warm"):
            tier_times.clear()
            t0 = time.time()
            vol2, area2, cert2, payload = vd._escalate_frames_batched(
                pos2, bls, vol_b.copy(), area_b.copy(), cert_b.copy(),
                vd.DEFAULT_TIERS[1:], vd.DEFAULT_CELL_IMPL,
            )
            esc = time.time() - t0
            rec(f"escalation_{rnd}", ms_per_frame=round(esc / F * 1e3, 2),
                tiers=[[int(k), int(ks), s] for k, ks, s in tier_times],
                cert_frac=round(cert2.mean(), 5))
    finally:
        vd._tier_subset_frames = orig

    t0 = time.time()
    ncert = 0
    for t in range(F):
        ct = cert2[t].copy()
        vol2[t], area2[t], ct = vd._escalate_and_close(
            pos2[t], float(bls[t]), n, vol2[t], area2[t], ct, payload[t],
            (), 256, 96, vd.DEFAULT_CELL_IMPL,
        )
        ncert += int(ct.sum())
    close = time.time() - t0
    rec("host_close", ms_per_frame=round(close / F * 1e3, 2),
        cert_frac=round(ncert / (n * F), 5))
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
