"""Shared z-slab preparation for windowed pair kernels.

The slab trick (introduced for q_tet, reused by the 3-body and LSI kernels):
sort the frame by z once (frame-0 persistent ordering for trajectories),
extend the sorted array with wrapped copies of the boundary slabs so PBC
neighbors stay contiguous, and give each row tile a contiguous column window
wide enough to hold every candidate within `margin` of the tile. Exactness
is certified, not assumed: `covered` checks that every tile's window held
all of its slab candidates at the drift-inflated margin.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SlabPrep(NamedTuple):
    ext_t: jnp.ndarray   # (F, 3, n_ext) extended transposed coordinates
    starts: jnp.ndarray  # (n_tiles,) window starts, pre-divided by 128
                         # (frame-invariant: frame-0 persistent ordering)
    covered: jnp.ndarray  # (F,) bool: window held every slab candidate
    order0: jnp.ndarray  # (N,) frame-0 z-ordering (sorted -> original scatter)
    w: int               # static window width actually used
    n_tiles: int


def clamp_window(window: int, n: int, seg: int) -> int:
    """Largest valid segmented scan window: a multiple of `seg` no wider
    than N. The segmented (chunked/HBM) kernels scan exactly
    `window // seg` segments, so the requested window must be clamped to
    the same domain `slab_prep_traj` clamps its starts for — a wider scan
    would hold an atom AND one of its periodic pad copies and double-count
    that neighbor. (The monolithic kernels take the width from `prep.w`
    instead, which applies the equivalent clamp.)"""
    w = min(-(-window // seg) * seg, (n // seg) * seg)
    if w <= 0:
        raise ValueError(
            f"n={n} is smaller than one scan segment (seg={seg}); use the "
            "monolithic kernel for systems this small"
        )
    return w


def slab_prep_traj(
    pos: jnp.ndarray,
    boxes: jnp.ndarray,
    margin: float,
    row_tile: int,
    window: int,
    pad: int,
) -> SlabPrep:
    """Frame-0 persistent z-ordering prep for a whole trajectory.

    pos: (F, N, 3); boxes: (F, 3) orthorhombic edges. The effective margin is
    inflated by twice the measured maximum z-drift from frame 0, so the
    frame-0 window starts remain valid for every frame.
    """
    F, n = pos.shape[0], pos.shape[1]
    n_pad_rows = -(-n // row_tile) * row_tile
    n_tiles = n_pad_rows // row_tile
    if n_pad_rows - n > pad:
        raise ValueError("row_tile remainder exceeds the boundary pad")
    L = boxes[:, 2][:, None]

    wrapped = jnp.mod(pos, boxes[:, None, :])
    z0 = wrapped[0, :, 2]
    order0 = jnp.argsort(z0)  # one sort for the whole trajectory
    sp = wrapped[:, order0, :]
    zs = sp[..., 2]
    # MIN-IMAGE z-drift: an atom crossing the periodic z boundary between
    # frames reads as a ~box-height raw jump, which inflated margin_eff to
    # ~2 L_z and coverage-vetoed EVERY wrapped trajectory (r5 finding: the
    # scale-0.35 fixtures and any real MD trajectory long enough for one
    # boundary crossing fell back to the XLA path). Circular distance is
    # the sound metric here: the kernels min-image every pair distance
    # in-register, so the certificate only needs each neighbor's COLUMN
    # (frame-0 z-slot) inside the row's window, and the +/-L pad copies
    # realize circular column adjacency — an atom is always within
    # min-image drift of its frame-0 slot on the z circle.
    dz = jnp.abs(zs - zs[0:1])
    drift = jnp.max(jnp.minimum(dz, L - dz))
    margin_eff = margin + 2.0 * drift

    z_shift = jnp.concatenate(
        [jnp.zeros((F, pad, 2), sp.dtype), L[:, :, None] * jnp.ones((F, pad, 1), sp.dtype)],
        axis=-1,
    )
    ext = jnp.concatenate([sp[:, -pad:, :] - z_shift, sp, sp[:, :pad, :] + z_shift], axis=1)
    n_ext = ext.shape[1]
    # the window must never exceed N sorted atoms: a wider window can hold an
    # atom AND its periodic boundary copy, double-counting that neighbor
    w = min(window, n_ext, (n // 128) * 128)

    ext_z0 = ext[0, :, 2]
    tile_first = jnp.arange(n_tiles) * row_tile
    tile_last = jnp.minimum(tile_first + row_tile - 1, n - 1)
    z_lo = zs[0][tile_first] - margin_eff
    z_hi = zs[0][tile_last] + margin_eff
    starts = jnp.searchsorted(ext_z0, z_lo, side="left")
    ends = jnp.searchsorted(ext_z0, z_hi, side="right")
    # Mosaic needs lane-dim slice starts provably 128-aligned: round down
    # (the window only grows leftward) and store pre-divided by 128
    starts = (starts // 128) * 128
    starts = jnp.clip(starts, 0, n_ext - w)
    # the pad slabs must be at least margin_eff deep in z, or cross-boundary
    # candidates silently fall outside ext and the windows look covered while
    # missing neighbors (a real failure at large N with fixed pad: pad atoms
    # span only pad/N * L_z of z)
    pad_ok = (ext_z0[0] <= z_lo[0]) & (ext_z0[-1] >= z_hi[-1])
    covered = jnp.broadcast_to(jnp.all(ends - starts <= w) & pad_ok, (F,))
    starts_f = (starts // 128).astype(jnp.int32)

    ext_t = jnp.transpose(ext, (0, 2, 1)).astype(jnp.float32)
    return SlabPrep(ext_t, starts_f, covered, order0, w, n_tiles)


class SlabPrepMulti(NamedTuple):
    ext_t: jnp.ndarray   # (F, 3, n_ext) extended transposed coordinates
    starts: tuple        # per spec: (n_tiles,) window starts, /128
    covered: tuple       # per spec: (F,) bool
    order0: jnp.ndarray
    ws: tuple            # per spec: static window width actually used
    n_tiles: int


def slab_prep_traj_multi(
    pos: jnp.ndarray,
    boxes: jnp.ndarray,
    specs,
    row_tile: int,
    pad: int,
) -> SlabPrepMulti:
    """`slab_prep_traj` for SEVERAL (margin, window) specs sharing one
    z-sort and one extended array — used by kernels that scan two windows
    of different widths per row tile (e.g. the split-shell LSI kernel: a
    narrow in-shell window and a wide next-shell one)."""
    F, n = pos.shape[0], pos.shape[1]
    n_pad_rows = -(-n // row_tile) * row_tile
    n_tiles = n_pad_rows // row_tile
    if n_pad_rows - n > pad:
        raise ValueError("row_tile remainder exceeds the boundary pad")
    L = boxes[:, 2][:, None]

    wrapped = jnp.mod(pos, boxes[:, None, :])
    z0 = wrapped[0, :, 2]
    order0 = jnp.argsort(z0)
    sp = wrapped[:, order0, :]
    zs = sp[..., 2]
    # min-image z-drift — see slab_prep_traj for the soundness argument
    dz = jnp.abs(zs - zs[0:1])
    drift = jnp.max(jnp.minimum(dz, L - dz))

    z_shift = jnp.concatenate(
        [jnp.zeros((F, pad, 2), sp.dtype),
         L[:, :, None] * jnp.ones((F, pad, 1), sp.dtype)],
        axis=-1,
    )
    ext = jnp.concatenate(
        [sp[:, -pad:, :] - z_shift, sp, sp[:, :pad, :] + z_shift], axis=1
    )
    n_ext = ext.shape[1]
    ext_z0 = ext[0, :, 2]
    tile_first = jnp.arange(n_tiles) * row_tile
    tile_last = jnp.minimum(tile_first + row_tile - 1, n - 1)

    starts_all, covered_all, ws = [], [], []
    for margin, window in specs:
        margin_eff = margin + 2.0 * drift
        w = min(window, n_ext, (n // 128) * 128)
        z_lo = zs[0][tile_first] - margin_eff
        z_hi = zs[0][tile_last] + margin_eff
        starts = jnp.searchsorted(ext_z0, z_lo, side="left")
        ends = jnp.searchsorted(ext_z0, z_hi, side="right")
        starts = (starts // 128) * 128
        starts = jnp.clip(starts, 0, n_ext - w)
        pad_ok = (ext_z0[0] <= z_lo[0]) & (ext_z0[-1] >= z_hi[-1])
        covered = jnp.broadcast_to(
            jnp.all(ends - starts <= w) & pad_ok, (F,)
        )
        starts_all.append((starts // 128).astype(jnp.int32))
        covered_all.append(covered)
        ws.append(w)

    ext_t = jnp.transpose(ext, (0, 2, 1)).astype(jnp.float32)
    return SlabPrepMulti(
        ext_t, tuple(starts_all), tuple(covered_all), order0, tuple(ws),
        n_tiles,
    )


def extract_k_min(dsq_ref, col, payloads, k: int):
    """K rounds of iterative first-column min extraction over the (r, w)
    distance scratch — the core loop every slab kernel shares, factored out
    so the tie-break rule (lowest column index among equal minima, the rule
    that keeps chunked and monolithic kernels bit-identical) lives in ONE
    place.

    dsq_ref: VMEM scratch holding masked squared distances (+inf invalid);
    poisoned (+inf) at each extracted entry. col: (r, w) column iota.
    payloads: list of (1, w) column arrays (e.g. xs/ys/zs coordinates).

    Returns (mins, sums, oks), each a K-list of (r, 1) arrays: the k-th
    smallest distance (+inf when no candidate remains), the masked sum of
    every payload at the extracted column (0 when absent), and validity.
    """
    w = dsq_ref.shape[1]
    big = jnp.int32(w)
    mins: list = []
    sums: list = [[] for _ in payloads]
    oks: list = []
    for _ in range(k):
        d = dsq_ref[:]
        m = jnp.min(d, axis=1, keepdims=True)
        eq = (d == m) & jnp.isfinite(d)
        fc = jnp.min(jnp.where(eq, col, big), axis=1, keepdims=True)
        first = eq & (col == fc)
        wgt = first.astype(jnp.float32)
        mins.append(jnp.where(jnp.isfinite(m), m, jnp.inf))
        for i, p in enumerate(payloads):
            sums[i].append(jnp.sum(wgt * p, axis=1, keepdims=True))
        oks.append(jnp.sum(wgt, axis=1, keepdims=True) > 0)
        dsq_ref[:] = jnp.where(first, jnp.inf, d)
    return mins, sums, oks


def merge_k_min(cand_d, payloads, k: int, invalids=None):
    """K rounds of first-index min extraction over a (r, C) candidate value
    array (the carried-top-K merge of the *_chunked kernels; C = 2K).

    payloads: list of (r, C) arrays riding along with the distances;
    non-finite payload entries sum as 0. invalids: per-payload fill for
    slots with no remaining candidate (default 0.0; use jnp.inf for
    distance-like payloads). Returns (kd (r, K), [payload_out (r, K)]).
    Candidates must be ordered carried-first so equal distances keep the
    earlier column's winner (see qtet_chunked.py's exactness argument)."""
    col = jax.lax.broadcasted_iota(jnp.int32, cand_d.shape, 1)
    big = jnp.int32(cand_d.shape[1])
    if invalids is None:
        invalids = [0.0] * len(payloads)
    kd: list = []
    outs: list = [[] for _ in payloads]
    for _ in range(k):
        m = jnp.min(cand_d, axis=1, keepdims=True)
        eq = (cand_d == m) & jnp.isfinite(cand_d)
        fc = jnp.min(jnp.where(eq, col, big), axis=1, keepdims=True)
        first = eq & (col == fc)
        wgt = first.astype(jnp.float32)
        fin = jnp.isfinite(m)
        kd.append(jnp.where(fin, m, jnp.inf))
        for i, p in enumerate(payloads):
            s = jnp.sum(wgt * jnp.where(jnp.isfinite(p), p, 0.0), axis=1, keepdims=True)
            outs[i].append(jnp.where(fin, s, invalids[i]))
        cand_d = jnp.where(first, jnp.inf, cand_d)
    return (
        jnp.concatenate(kd, axis=1),
        [jnp.concatenate(o, axis=1) for o in outs],
    )


def fits_scoped_vmem(
    row_tile: int, window: int, unroll_k: int, limit: int = 15_500_000
) -> bool:
    """Predict whether a slab kernel's scoped-VMEM stack fits the TPU's
    16 MB limit, so dispatchers can skip a doomed ~30 s compile and fall
    straight to the XLA path at extreme system sizes.

    Empirical model: Mosaic's stack peaks at ~(2 + 0.32*K) x the
    (row_tile, window) f32 scratch for a K-round unrolled min-extraction
    (measured: q kernel K=4 -> 3.2x at 65k atoms; LSI K=24 -> ~9.5x, the
    20 MB/256-row datapoint in PERF.md)."""
    return row_tile * window * 4 * (2.0 + 0.32 * unroll_k) <= limit


def suggest_pad(n: int, box_z: float, depth: float, safety: float = 1.6) -> int:
    """Boundary-copy count (multiple of 128, capped at n) whose z extent is
    expected to exceed `depth` (the drift-inflated margin). The `covered`
    certificate still verifies sufficiency at run time."""
    est = n * depth / box_z * safety + 128
    return int(min(n, -(-est // 128) * 128))


def unsort_frames(arr_sorted: jnp.ndarray, order0: jnp.ndarray) -> jnp.ndarray:
    """Scatter (F, N, ...) results from frame-0 z-order back to atom order."""
    return jax.vmap(lambda src: jnp.zeros_like(src).at[order0].set(src))(arr_sorted)
