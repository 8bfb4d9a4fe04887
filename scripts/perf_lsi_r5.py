#!/usr/bin/env python
"""Round-5 on-chip LSI-at-scale measurement (VERDICT r4 item 3).

Measures the new split-shell kernel (lsi_slab2.lsi_traj_split: narrow K=12
in-shell extraction + wide single next-shell min) against the round-3/4
chunked-carry kernel at 131k atoms, plus the 12k slab tier for drift
tracking. Writes /tmp/perf_lsi_r5.json as it goes.

Usage: python scripts/perf_lsi_r5.py [stage ...]   stages: big small
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = {}
OUT = "/tmp/perf_lsi_r5.json"
LOW, HIGH = 0.0, 3.7


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
    boxes = np.tile(np.array([box] * 3, np.float32), (frames, 1))
    return pos, boxes, box


def _timed(fn, pos, boxes, box, frames):
    """cold compile + best-of-2 warm per-frame ms; returns (ms, out)."""
    t0 = time.time()
    out = fn(pos, boxes)
    _ = np.asarray(out[0][:4])
    cold = time.time() - t0
    best = float("inf")
    for i in range(2):
        p2 = np.mod(pos + np.float32(1e-3 * (i + 1)), box)
        t0 = time.time()
        out = fn(p2, boxes)
        _ = np.asarray(out[0][:4])
        best = min(best, (time.time() - t0) / frames)
    return cold, best * 1e3, out


def stage_big():
    n, F = 131072, 4
    pos, boxes, box = make_fix(n, F, seed=7)
    from waterorderlib_tpu.ops.pallas.lsi_chunked import lsi_traj_chunked
    from waterorderlib_tpu.ops.pallas.lsi_slab2 import (
        K_IN, fits_lsi_split, lsi_traj_split,
    )
    from waterorderlib_tpu.ops.pallas.qtet2 import suggest_window
    from waterorderlib_tpu.ops.pallas.slab import suggest_pad

    bz = float(boxes[0, 2])
    mg = HIGH + 3.7
    window = suggest_window(n, bz, margin=mg, row_tile=128)
    w_narrow = suggest_window(n, bz, margin=HIGH, row_tile=128)
    pad = suggest_pad(n, bz, mg + 2.0)
    rec("lsi_131k_windows", window_wide=window, window_narrow=w_narrow,
        pad=pad, fits_split=bool(
            fits_lsi_split(128, 1536, K_IN, n + 2 * pad, -(-n // 128))))

    ref_vals = None
    for name, fn in (
        ("lsi_131k_chunked", lambda p, b: lsi_traj_chunked(
            p, b, LOW, HIGH, window=window, pad=pad)),
        ("lsi_131k_split", lambda p, b: lsi_traj_split(
            p, b, LOW, HIGH, window_narrow=w_narrow, window_wide=window,
            pad=pad)),
    ):
        try:
            cold, ms, out = _timed(fn, pos, boxes, box, F)
            lsi_v, lsi_ok, _, covered = out
            vals = np.where(np.asarray(lsi_ok), np.asarray(lsi_v), 0.0)
            entry = dict(ms_per_frame=round(ms, 1), cold_s=round(cold, 1),
                         n=n, frames=F,
                         covered=bool(np.asarray(covered).all()),
                         ok_frac=round(float(np.asarray(lsi_ok).mean()), 4))
            if ref_vals is None:
                ref_vals = vals
            else:
                entry["maxabs_vs_chunked"] = float(
                    np.abs(vals - ref_vals).max())
            rec(name, **entry)
        except Exception as e:  # noqa: BLE001 — record per-stage failure
            rec(name, error=f"{type(e).__name__}: {e}")


def stage_small():
    """12k through the driver core (_lsi_core), tracking the slab tier."""
    n, F = 12288, 8
    pos, boxes, box = make_fix(n, F, seed=5)
    from waterorderlib_tpu.drivers import orderparams as op
    from waterorderlib_tpu.ops import pairs

    masks = np.ones((F, 1, n), bool)

    def run(p):
        hist, (means, _) = op._lsi_core(
            p, boxes, masks, LOW, HIGH, 24, pairs.DEFAULT_ROW_BLOCK,
            500, 0.0, 0.3)
        return np.asarray(hist), np.asarray(means)

    try:
        t0 = time.time()
        run(pos)
        cold = time.time() - t0
        best = float("inf")
        for i in range(2):
            t0 = time.time()
            run(np.mod(pos + np.float32(1e-3 * (i + 1)), box))
            best = min(best, (time.time() - t0) / F)
        rec("lsi_12k_driver_core", ms_per_frame=round(best * 1e3, 2), n=n,
            frames=F, cold_s=round(cold, 1))
    except Exception as e:  # noqa: BLE001
        rec("lsi_12k_driver_core", error=f"{type(e).__name__}: {e}")


STAGES = {"big": stage_big, "small": stage_small}

if __name__ == "__main__":
    want = sys.argv[1:] or ["big"]
    for w in want:
        print(f"=== stage {w} ===", flush=True)
        STAGES[w]()
    print(json.dumps(RESULTS))
