"""Measure fixed-dispatch vs marginal per-frame cost: scale the frame batch."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from waterorderlib_tpu.io.synthetic import water_oxygen_lattice
from waterorderlib_tpu.ops.pallas import qtet2

N = 4096
HIGH = 10.0
WIN = 1536

box_len = (N / 0.033456) ** (1.0 / 3.0)
rs = np.random.RandomState(0)
base = water_oxygen_lattice(N, box_len, seed=0)


def run(F, rt):
    pos = np.stack(
        [np.mod(base + rs.normal(scale=0.1, size=base.shape), box_len) for _ in range(F)]
    ).astype(np.float32)
    boxes = np.tile(np.array([box_len] * 3, np.float32), (F, 1))
    pos_d = jax.device_put(pos)
    boxes_d = jax.device_put(boxes)
    fn = lambda p, b: qtet2.order_param_q_traj(p, b, 0.0, HIGH, row_tile=rt, window=WIN, unsort=True)
    out = fn(pos_d, boxes_d)
    jax.block_until_ready(out)
    times = []
    for it in range(6):
        p = pos_d + jnp.float32(1e-3 * (it + 1))
        _ = np.asarray(p[0, :4])
        t0 = time.perf_counter()
        q, ok, cov = fn(p, boxes_d)
        _ = np.asarray(q[0, :4])
        times.append(time.perf_counter() - t0)
    honest = sorted(t for t in times[1:] if t > F * 5e-5) or times
    med = float(np.median(honest))
    print(f"F={F:4d} rt={rt}: total={med*1e3:8.1f} ms  {med*1e3/F:7.3f} ms/frame  "
          f"({F/med:8.1f} f/s)  raw={[f'{t*1e3:.0f}' for t in times]}", flush=True)


for F in (1, 8, 32, 128, 256):
    run(F, 256)
