#!/usr/bin/env python
"""Headline benchmark: q_tet throughput on a 4k-water box (frames/sec/chip).

Matches BASELINE.json's north-star metric. The baseline is the measured
single-core CPU implementation of the same algorithm
(native/baseline_qtet.cc — a faithful C++ stand-in for the reference's
single-core Fortran/f2py path; no Fortran compiler exists in this image).
If the compiled baseline binary is present it is re-measured, otherwise the
recorded constant is used.

Prints ONE JSON line:
  {"metric": "qtet_frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N}
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# Measured on this machine (g++ -O3, single core, 4096 waters):
# ./native/baseline_qtet 4096 3 -> frames_per_sec 9.073
BASELINE_FPS = 9.073

N_WATERS = 4096
N_FRAMES = 32
HIGH_CUT = 10.0


def measure_baseline() -> float:
    exe = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native", "baseline_qtet")
    if os.path.exists(exe):
        try:
            out = subprocess.run(
                [exe, str(N_WATERS), "3"], capture_output=True, text=True, timeout=300
            ).stdout
            for line in out.splitlines():
                if line.startswith("frames_per_sec"):
                    return float(line.split()[1])
        except Exception:
            pass
    return BASELINE_FPS


def main():
    import jax
    import jax.numpy as jnp
    from waterorderlib_tpu.order import qtet
    from waterorderlib_tpu.ops import histograms
    from waterorderlib_tpu.io.synthetic import water_oxygen_lattice

    box_len = (N_WATERS / 0.033456) ** (1.0 / 3.0)
    rs = np.random.RandomState(0)
    base = water_oxygen_lattice(N_WATERS, box_len, seed=0)
    pos = np.stack(
        [np.mod(base + rs.normal(scale=0.1, size=base.shape), box_len) for _ in range(N_FRAMES)]
    ).astype(np.float32)
    boxes = np.tile(np.array([box_len] * 3, np.float32), (N_FRAMES, 1))

    row_block = int(os.environ.get("BENCH_ROW_BLOCK", str(N_WATERS)))

    # Prefer the fused Pallas kernel (TPU); fall back to the XLA path on
    # platforms where Mosaic is unavailable.
    use_pallas = os.environ.get("BENCH_IMPL", "pallas") == "pallas"
    if use_pallas:
        try:
            from waterorderlib_tpu.ops.pallas.qtet_kernel import order_param_q_pallas

            q_fn = lambda p, b: order_param_q_pallas(p, b, 0.0, HIGH_CUT)
            jax.jit(q_fn)(
                jnp.zeros((256, 3), jnp.float32), jnp.ones(3, jnp.float32)
            )[0].block_until_ready()
        except Exception:
            use_pallas = False
    if not use_pallas:
        def q_fn(p, b):
            q = qtet.order_param_q(p, p, b, 0.0, HIGH_CUT, row_block=row_block)
            h = histograms.masked_histogram(q, jnp.ones_like(q, bool), 500, 0.0, 1.0)
            return q, h

    @jax.jit
    def step(pos, boxes):
        def one_frame(carry, frame):
            p, b = frame
            q, h = q_fn(p, b)
            return carry + h, jnp.mean(q)

        hist, means = jax.lax.scan(one_frame, jnp.zeros(500, jnp.float32), (pos, boxes))
        return hist, means

    pos_d = jax.device_put(pos)
    boxes_d = jax.device_put(boxes)

    # warmup/compile
    hist, means = step(pos_d, boxes_d)
    hist.block_until_ready()

    # Each timed call gets a PERTURBED input and blocks individually: the
    # remote-TPU runtime memoizes repeated identical dispatches, which
    # otherwise produces fantasy throughput numbers.
    n_iters = 5
    times = []
    for it in range(n_iters):
        pos_it = pos_d + jnp.float32(1e-3 * (it + 1))
        _ = np.asarray(pos_it[0, :4])  # host fetch: the only reliable barrier
        t0 = time.perf_counter()
        hist, means = step(pos_it, boxes_d)
        _ = np.asarray(hist[-8:])  # host fetch: block_until_ready can return
        # before real execution on this remote runtime
        times.append(time.perf_counter() - t0)
        if os.environ.get("BENCH_DEBUG"):
            print(
                f"iter {it}: {times[-1]*1e3:.3f} ms, hist_sum={float(hist.sum())}, "
                f"mean_q={float(means.mean()):.6f}", file=sys.stderr,
            )
    # drop the first iteration (residual compile/warm-up jitter) and any
    # memoized dispatch (sub-ms "executions" of a multi-frame batch), then
    # report the median honest run
    honest = [t for t in times[1:] if t > N_FRAMES * 1e-4] or times
    fps = N_FRAMES / float(np.median(honest))

    baseline = measure_baseline()
    print(
        json.dumps(
            {
                "metric": "qtet_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s (4096 waters, q_tet + histogram)",
                "vs_baseline": round(fps / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
