"""Decompose the q_tet traj-slab pipeline cost on the real TPU:
prep-only vs kernel unsorted vs full (unsort) — plus the fixed v2 kernel.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from waterorderlib_tpu.io.synthetic import water_oxygen_lattice
from waterorderlib_tpu.ops.pallas import qtet_sorted, qtet2

N = 4096
F = 32
HIGH = 10.0
WIN = 1536

box_len = (N / 0.033456) ** (1.0 / 3.0)
rs = np.random.RandomState(0)
base = water_oxygen_lattice(N, box_len, seed=0)
pos = np.stack(
    [np.mod(base + rs.normal(scale=0.1, size=base.shape), box_len) for _ in range(F)]
).astype(np.float32)
boxes = np.tile(np.array([box_len] * 3, np.float32), (F, 1))
pos_d = jax.device_put(pos)
boxes_d = jax.device_put(boxes)

from tests.reference import refimpl
q_ref0 = refimpl.order_param_q(pos[0].astype(np.float64), pos[0].astype(np.float64),
                               boxes[0].astype(np.float64), 0.0, HIGH)


def time_fn(fn, label, iters=5, check=False):
    try:
        out = fn(pos_d, boxes_d)
        jax.block_until_ready(out)
        if check:
            q0 = np.asarray(jax.tree_util.tree_leaves(out)[0])[0]
            err = np.max(np.abs(q0 - q_ref0))
            print(f"  [{label} parity err {err:.2e}]")
            if err > 3e-5:
                print(f"{label}: PARITY FAIL")
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
        _ = np.asarray(leaf[0, :4] if leaf.ndim > 1 else leaf[:4])
        times.append(time.perf_counter() - t0)
    honest = [t for t in times[1:] if t > F * 1e-4] or times
    ms = float(np.median(honest)) * 1e3 / F
    print(f"{label}: {ms:.3f} ms/frame  raw={[f'{t*1e3:.1f}' for t in times]}", flush=True)
    return ms


@jax.jit
def prep_only(pos, boxes):
    """The XLA prep of order_param_q_traj without the kernel."""
    F, n = pos.shape[0], pos.shape[1]
    pad = 512
    L = boxes[:, 2][:, None]
    wrapped = jnp.mod(pos, boxes[:, None, :])
    z0 = wrapped[0, :, 2]
    order0 = jnp.argsort(z0)
    sp = wrapped[:, order0, :]
    zs = sp[..., 2]
    drift = jnp.max(jnp.abs(zs - zs[0:1]))
    z_shift = jnp.concatenate(
        [jnp.zeros((F, pad, 2), sp.dtype), L[:, :, None] * jnp.ones((F, pad, 1), sp.dtype)],
        axis=-1,
    )
    ext = jnp.concatenate([sp[:, -pad:, :] - z_shift, sp, sp[:, :pad, :] + z_shift], axis=1)
    ext_t = jnp.transpose(ext, (0, 2, 1)).astype(jnp.float32)
    return ext_t[:, 0, :4] + drift


time_fn(prep_only, "prep-only (mod+sort-gather+concat+transpose)")

for rt in (128, 256, 512):
    time_fn(
        lambda p, b, rt=rt: qtet2.order_param_q_traj(
            p, b, 0.0, HIGH, row_tile=rt, window=WIN, unsort=False),
        f"v2 traj-slab rt={rt} nounsort", check=False,
    )
time_fn(
    lambda p, b: qtet2.order_param_q_traj(
        p, b, 0.0, HIGH, row_tile=256, window=WIN, unsort=True),
    "v2 traj-slab rt=256 unsort", check=True,
)
time_fn(
    lambda p, b: qtet_sorted.order_param_q_pallas_traj(
        p, b, 0.0, HIGH, row_tile=128, window=WIN, unsort=False),
    "v1 traj-slab rt=128 nounsort",
)
for rt in (256, 512):
    time_fn(
        lambda p, b, rt=rt: qtet2.order_param_q_frames(p, b, 0.0, HIGH, row_tile=rt),
        f"v2 brute rt={rt}", check=True,
    )
