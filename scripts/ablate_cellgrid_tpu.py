#!/usr/bin/env python
"""Round-5 stage ablation for the cell-grid Voronoi candidate search at 12k.

Times, on-chip with device-resident inputs and block_until_ready:
  mirror  - mirror_points_pruned
  build   - _cellgrid_build (bucketing: sort + searchsorted + gathers)
  gather  - the 27-cell neighborhood gather alone (no selection)
  topk    - gather + lax.top_k (the committed _cellgrid_topk)
  xtopk   - bare lax.top_k over a random (num, 27*cap) matrix
  xsort   - bare jnp.sort over the same
  ptopk   - voronoi_topk_pallas (z-window carried merge, production r4 path)

Writes /tmp/ablate_cellgrid.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = {}
OUT = "/tmp/ablate_cellgrid.json"


def rec(key, **kw):
    RESULTS[key] = kw
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(key, kw, flush=True)


def bench(fn, *args, reps=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best * 1e3, out


def main(n=12288):
    import jax
    import jax.numpy as jnp

    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice
    from waterorderlib_tpu.surface import voronoi_device as vd

    box = (n / 0.033456) ** (1.0 / 3.0)
    rs = np.random.RandomState(5)
    base = water_oxygen_lattice(n, box, seed=5)
    pos = np.mod(base + rs.normal(scale=0.35, size=base.shape), box).astype(
        np.float32
    )
    pts = jax.device_put(jnp.asarray(pos))
    k_search = 64
    cg = vd._suggest_cellgrid(n, box, k_search)
    n_side, cap = cg
    budget = vd._suggest_mirror_budget(n, box, k_search)
    win = vd._suggest_win(n, n + budget, box, k_search)
    rec("config", n=n, n_side=n_side, cap=cap, lanes=27 * cap, win=win,
        budget=budget)

    mirror_j = jax.jit(
        lambda p: vd.mirror_points_pruned(p, box, budget)[0]
    )
    ms, ext = bench(mirror_j, pts)
    p4 = int(ext.shape[0])
    rec("mirror", ms=round(ms, 2), p4=p4)

    build_j = jax.jit(
        lambda e: vd._cellgrid_build(e, box, n_side, cap)
    )
    ms, built = bench(build_j, ext)
    rec("build", ms=round(ms, 2), tbl_mb=round(built[0].nbytes / 1e6, 1),
        overflow=int(np.asarray(built[1]).sum()),
        dropped=bool(np.asarray(built[2])))

    # gather-only: replicate _cellgrid_topk's slicing, reduce to a sum
    def gather_only(centers, ext):
        import jax

        tbl, overflow, dropped, s = vd._cellgrid_build(ext, box, n_side, cap)
        g = jnp.clip(
            jnp.floor(centers / s).astype(jnp.int32) + 1, 1, n_side - 2
        )
        cid = (g[:, 2] * n_side + g[:, 1]) * n_side + g[:, 0]
        ordc = jnp.argsort(cid)
        cs, cids = centers[ordc], cid[ordc]
        rb = 256
        pad = (-centers.shape[0]) % rb
        if pad:
            cs = jnp.concatenate([cs, jnp.repeat(cs[-1:], pad, axis=0)])
            cids = jnp.concatenate([cids, jnp.repeat(cids[-1:], pad)])
        off9 = jnp.asarray(
            [(dz * n_side + dy) * n_side for dz in (-1, 0, 1)
             for dy in (-1, 0, 1)], jnp.int32)

        def one_block(args):
            blk, cb = args
            starts = cb[:, None] + off9[None, :] - 1
            slc = jax.vmap(jax.vmap(
                lambda st: jax.lax.dynamic_slice(
                    tbl, (st, jnp.zeros((), st.dtype)), (3, 4 * cap))
            ))(starts)
            return jnp.sum(slc, axis=(1, 2, 3)) + jnp.sum(blk, axis=1)

        blocks = (cs.reshape(-1, rb, 3), cids.reshape(-1, rb))
        return jax.lax.map(one_block, blocks)

    ms, _ = bench(jax.jit(gather_only), pts, ext)
    rec("gather_only", ms=round(ms, 2))

    for sel in ("xla", "pallas"):
        topk_j = jax.jit(
            lambda c, e, s=sel: vd._cellgrid_topk(
                c, e, box, k_search, 256, n_side, cap, select=s
            )
        )
        try:
            ms, out = bench(topk_j, pts, ext)
            rec(f"cellgrid_topk_{sel}", ms=round(ms, 2),
                covered=int(np.asarray(out[3]).sum()))
        except Exception as e:
            rec(f"cellgrid_topk_{sel}", error=f"{type(e).__name__}: {e}")

    lanes = 27 * cap
    rmat = jax.device_put(
        jnp.asarray(rs.rand(n, lanes).astype(np.float32)))
    ms, _ = bench(jax.jit(lambda m: jax.lax.top_k(-m, k_search)), rmat)
    rec("bare_lax_topk_27cap", ms=round(ms, 2), lanes=lanes)
    ms, _ = bench(jax.jit(lambda m: jnp.sort(m, axis=1)), rmat)
    rec("bare_sort_27cap", ms=round(ms, 2), lanes=lanes)

    from waterorderlib_tpu.ops.pallas.voronoi_topk import voronoi_topk_pallas

    ptop_j = jax.jit(
        lambda c, e: voronoi_topk_pallas(c, e, k_search, 128, win, 768)
    )
    try:
        ms, out = bench(ptop_j, pts, ext)
        rec("pallas_window_topk", ms=round(ms, 2), win=win,
            covered=int(np.asarray(out[3]).sum()))
    except Exception as e:
        rec("pallas_window_topk", error=f"{type(e).__name__}: {e}")

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 12288)
