"""Experiment: q_tet kernel variants / tile sizes on the real TPU.

Honest timing: perturbed inputs per iteration, tiny host fetch as barrier.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from waterorderlib_tpu.io.synthetic import water_oxygen_lattice
from waterorderlib_tpu.ops.pallas import qtet_kernel, qtet_sorted, qtet2

N = 4096
F = 32
HIGH = 10.0

box_len = (N / 0.033456) ** (1.0 / 3.0)
rs = np.random.RandomState(0)
base = water_oxygen_lattice(N, box_len, seed=0)
pos = np.stack(
    [np.mod(base + rs.normal(scale=0.1, size=base.shape), box_len) for _ in range(F)]
).astype(np.float32)
boxes = np.tile(np.array([box_len] * 3, np.float32), (F, 1))
pos_d = jax.device_put(pos)
boxes_d = jax.device_put(boxes)

# f64 oracle on frame 0 for spot parity
from tests.reference import refimpl
q_ref0 = refimpl.order_param_q(pos[0].astype(np.float64), pos[0].astype(np.float64),
                               boxes[0].astype(np.float64), 0.0, HIGH)


def time_fn(fn, label, iters=4, check=None):
    try:
        out = fn(pos_d, boxes_d)
        jax.block_until_ready(out)
        if check is not None:
            q0 = np.asarray(jax.tree_util.tree_leaves(out)[0])[0]
            err = np.max(np.abs(q0 - q_ref0))
            if err > 3e-5:
                print(f"{label}: PARITY FAIL max err {err:.2e}")
                return None
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]}")
        return None
    times = []
    for it in range(iters):
        p = pos_d + jnp.float32(1e-3 * (it + 1))
        _ = np.asarray(p[0, :4])
        t0 = time.perf_counter()
        out = fn(p, boxes_d)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf[0, :4])  # tiny fetch = barrier
        times.append(time.perf_counter() - t0)
    honest = [t for t in times[1:] if t > F * 1e-4] or times
    ms = float(np.median(honest)) * 1e3 / F
    print(f"{label}: {ms:.3f} ms/frame  ({F/np.median(honest):.1f} f/s)  raw={[f'{t*1e3:.1f}' for t in times]}")
    return ms


win = qtet_sorted.suggest_window(N, box_len)
print(f"suggest_window = {win}", flush=True)

for rt in (128, 256):
    time_fn(
        lambda p, b, rt=rt: qtet_sorted.order_param_q_pallas_traj(
            p, b, 0.0, HIGH, row_tile=rt, window=win, unsort=True),
        f"v1 traj-slab rt={rt} w={win}", check=True,
    )

for rt in (128, 256, 512, 1024):
    time_fn(
        lambda p, b, rt=rt: qtet2.order_param_q_traj(
            p, b, 0.0, HIGH, row_tile=rt, window=win, unsort=True),
        f"v2 traj-slab rt={rt} w={win}", check=True,
    )

for rt in (128, 256, 512):
    time_fn(
        lambda p, b, rt=rt: qtet2.order_param_q_frames(p, b, 0.0, HIGH, row_tile=rt),
        f"v2 brute rt={rt}", check=True,
    )

time_fn(
    lambda p, b: qtet_kernel.order_param_q_pallas_frames(p, b, 0.0, HIGH, row_tile=128),
    "v1 brute rt=128", check=True,
)
