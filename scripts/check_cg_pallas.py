#!/usr/bin/env python
"""Correctness + steady-state timing of the Pallas cellgrid extraction
vs the XLA selection at 12k on-chip (fresh inputs each rep)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice
    from waterorderlib_tpu.surface import voronoi_device as vd

    n = 12288
    box = (n / 0.033456) ** (1.0 / 3.0)
    rs = np.random.RandomState(5)
    base = water_oxygen_lattice(n, box, seed=5)
    poss = [
        np.mod(base + rs.normal(scale=0.35, size=base.shape), box).astype(
            np.float32
        )
        for _ in range(4)
    ]
    cg = vd._suggest_cellgrid(n, box, 64)
    mirror = jax.jit(lambda p: vd.mirror_points_device(p, box))
    outs = {}
    for sel in ("pallas", "xla"):
        f = jax.jit(
            lambda c, e, s=sel: vd._cellgrid_topk(
                c, e, box, 64, 256, cg[0], cg[1], select=s
            )
        )
        pts = jax.device_put(jnp.asarray(poss[0]))
        ext = mirror(pts)
        out = f(pts, ext)
        jax.block_until_ready(out)
        best = 1e9
        for i in range(1, 4):
            pts = jax.device_put(jnp.asarray(poss[i]))
            ext = mirror(pts)
            jax.block_until_ready(ext)
            t0 = time.time()
            out = f(pts, ext)
            jax.block_until_ready(out)
            best = min(best, time.time() - t0)
        outs[sel] = [np.asarray(x) for x in out]
        print(sel, round(best * 1e3, 2), "ms covered",
              int(outs[sel][3].sum()), flush=True)
    dp, dx = outs["pallas"][0], outs["xla"][0]
    cp, cx = outs["pallas"][3], outs["xla"][3]
    print("cov equal:", (cp == cx).all(),
          "maxabs dist diff on covered:", np.abs(dp[cp] - dx[cp]).max())


if __name__ == "__main__":
    main()
