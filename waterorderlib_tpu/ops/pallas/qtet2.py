"""q_tet Pallas kernel v2: single-scratch 4-NN extraction, large row tiles.

Replaces the same reference hot path as qtet_kernel.py
(`allNearNeighbors` waterlib.f90:830-862 + argsort-4NN + `tetraCosAng`
waterlib.f90:867-895 + the q formula water_properties.py:388), with one
structural change over v1: the per-round neighbor displacement is recovered
as a masked sum of the COLUMN COORDINATES (xj = sum(first * xs), a (1, w)
broadcast) followed by a minimum-image on the (r, 1) result, instead of
storing three (r, w) displacement buffers. Same arithmetic cost, but the
kernel keeps only the dsq scratch — so row tiles of 256/512 fit in VMEM and
the grid has 4-8x fewer steps (the v1 kernel was per-grid-step-overhead
bound at ~40 us/step with 128-row tiles).

Two wrappers share the kernel body:
- `order_param_q_frames`: brute sweep over all columns (window = N);
- `order_param_q_traj`:   z-slab-pruned windows with the frame-0 persistent
  ordering and the same exactness certificates as qtet_sorted.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from waterorderlib_tpu.ops.pallas.slab import extract_k_min


def _make_kernel(windowed: bool, pad: int):
    """Kernel body: rows [row0, row0+r) of the (extended) frame against a
    w-column window. windowed=False reads rows/cols from the same dense
    frame (start = 0, no boundary pad). `pad` must be a static python int
    (it feeds lane-aligned slice starts)."""

    def kernel(scalars_ref, boxes_ref, starts_ref, ext_t_ref, out_ref, ok_ref, dsq_ref):
        f = pl.program_id(0)
        i = pl.program_id(1)
        r = out_ref.shape[2]
        w = dsq_ref.shape[1]
        n_real = scalars_ref[0].astype(jnp.int32)
        low_sq = scalars_ref[1]
        high_sq = scalars_ref[2]
        margin_sq = scalars_ref[4]
        bx, by, bz = boxes_ref[f, 0], boxes_ref[f, 1], boxes_ref[f, 2]

        row0 = pad + i * r
        # starts are stored pre-divided by 128 so the product is provably
        # lane-aligned for Mosaic
        start = starts_ref[i] * 128

        def mi(d, box_l):
            # coordinates are pre-wrapped into [0, L); two compare-selects
            # replace round()
            d = jnp.where(d > box_l * 0.5, d - box_l, d)
            return jnp.where(d < -box_l * 0.5, d + box_l, d)

        xs = ext_t_ref[0, 0, pl.ds(start, w)].reshape(1, w)
        ys = ext_t_ref[0, 1, pl.ds(start, w)].reshape(1, w)
        zs = ext_t_ref[0, 2, pl.ds(start, w)].reshape(1, w)
        xr = ext_t_ref[0, 0, pl.ds(row0, r)].reshape(r, 1)
        yr = ext_t_ref[0, 1, pl.ds(row0, r)].reshape(r, 1)
        zr = ext_t_ref[0, 2, pl.ds(row0, r)].reshape(r, 1)

        dx = mi(xs - xr, bx)
        dy = mi(ys - yr, by)
        dz = mi(zs - zr, bz)
        dsq = dx * dx + dy * dy + dz * dz
        col = jax.lax.broadcasted_iota(jnp.int32, (r, w), 1)
        valid = (dsq > low_sq) & (dsq <= high_sq)
        if not windowed:
            valid &= col < n_real  # dense path: mask the zero-padded columns
        count = jnp.sum(valid.astype(jnp.float32), axis=1, keepdims=True)
        dsq_ref[:] = jnp.where(valid, dsq, jnp.inf)

        # neighbor coordinates via masked sums of the column coords
        # (slab.extract_k_min); each displacement is re-imaged on the (r, 1)
        # result — no (r, w) displacement scratch needed
        mins, (xjs, yjs, zjs), oks = extract_k_min(dsq_ref, col, [xs, ys, zs], 4)
        units = []
        for k in range(4):
            vx = mi(xjs[k] - xr, bx)
            vy = mi(yjs[k] - yr, by)
            vz = mi(zjs[k] - zr, bz)
            nrm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
            inv = jnp.where(nrm > 0, 1.0 / jnp.where(nrm > 0, nrm, 1.0), 0.0)
            units.append((vx * inv, vy * inv, vz * inv))
        last_d = mins[3]

        ssum = jnp.zeros((r, 1), jnp.float32)
        for a in range(4):
            for b in range(a + 1, 4):
                ca, cb = units[a], units[b]
                cosv = ca[0] * cb[0] + ca[1] * cb[1] + ca[2] * cb[2]
                pair_ok = oks[a] & oks[b]
                cosv = jnp.where(pair_ok, jnp.clip(cosv, -1.0, 1.0), -1.0)
                ssum = ssum + (cosv + 1.0 / 3.0) ** 2
        q = 1.0 - 0.375 * ssum
        q = jnp.where(count > 0, q, 0.0)
        out_ref[0, pl.ds(i, 1), :] = q.reshape(1, r)
        # exact iff all 4 slots filled and the 4th-nearest lies within margin
        exact = oks[3] & (last_d <= margin_sq)
        ok_ref[0, pl.ds(i, 1), :] = exact.astype(jnp.float32).reshape(1, r)

    return kernel


def _launch(ext_t, boxes, starts, scalars, F, n_tiles, row_tile, w, windowed, pad):
    return pl.pallas_call(
        _make_kernel(windowed, pad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(F, n_tiles),
            in_specs=[
                pl.BlockSpec(
                    (1, 3, ext_t.shape[2]), lambda f, i, s1, s2, s3: (f, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=(
                pl.BlockSpec(
                    (1, n_tiles, row_tile), lambda f, i, s1, s2, s3: (f, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, n_tiles, row_tile), lambda f, i, s1, s2, s3: (f, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            scratch_shapes=[pltpu.VMEM((row_tile, w), jnp.float32)],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((F, n_tiles, row_tile), jnp.float32),
            jax.ShapeDtypeStruct((F, n_tiles, row_tile), jnp.float32),
        ),
    )(scalars, boxes.astype(jnp.float32), starts, ext_t)


def _scalars(n, low_cut, high_cut, pad, margin):
    return jnp.stack(
        [jnp.float32(n), jnp.asarray(low_cut * low_cut, jnp.float32),
         jnp.asarray(high_cut * high_cut, jnp.float32), jnp.float32(pad),
         jnp.asarray(margin * margin, jnp.float32)],
    )


@partial(jax.jit, static_argnames=("row_tile",))
def order_param_q_frames(
    pos: jnp.ndarray,
    boxes: jnp.ndarray,
    low_cut: float = 0.0,
    high_cut: float = 10.0,
    row_tile: int = 256,
):
    """Brute whole-trajectory q_tet, one kernel launch, large row tiles.

    pos: (F, N, 3); boxes: (F, 3). Returns q (F, N) matching
    order.qtet.order_param_q per frame to f32 precision.
    """
    F, n = pos.shape[0], pos.shape[1]
    n_pad = -(-n // row_tile) * row_tile
    pos = jnp.mod(pos, boxes[:, None, :])  # select-mi in-kernel needs [0, L)
    pos_p = jnp.pad(pos, ((0, 0), (0, n_pad - n), (0, 0)))
    ext_t = jnp.transpose(pos_p, (0, 2, 1)).astype(jnp.float32)  # (F, 3, Npad)
    n_tiles = n_pad // row_tile
    starts = jnp.zeros((n_tiles,), jnp.int32)
    scalars = _scalars(n, low_cut, high_cut, 0, high_cut)
    out, _ = _launch(ext_t, boxes, starts, scalars, F, n_tiles, row_tile, n_pad, False, 0)
    return out.reshape(F, -1)[:, :n]


@partial(jax.jit, static_argnames=("row_tile", "window", "pad", "unsort"))
def order_param_q_traj(
    pos: jnp.ndarray,
    boxes: jnp.ndarray,
    low_cut: float = 0.0,
    high_cut: float = 10.0,
    margin: float = 4.5,
    row_tile: int = 256,
    window: int = 1536,
    pad: int = 512,
    unsort: bool = True,
):
    """Slab-pruned whole-trajectory q_tet with the frame-0 persistent
    z-ordering (see qtet_sorted.order_param_q_pallas_traj for the contract:
    per-atom `ok` certifies exactness, `covered` certifies window coverage
    at the drift-inflated margin).

    Returns (q (F, N) in original atom order when unsort, ok (F, N) bool,
    covered (F,) bool).
    """
    from waterorderlib_tpu.ops.pallas.slab import slab_prep_traj, unsort_frames

    F, n = pos.shape[0], pos.shape[1]
    prep = slab_prep_traj(pos, boxes, margin, row_tile, window, pad)
    scalars = _scalars(n, low_cut, high_cut, pad, margin)
    out, ok = _launch(
        prep.ext_t, boxes, prep.starts, scalars, F, prep.n_tiles, row_tile,
        prep.w, True, pad,
    )

    q_sorted = out.reshape(F, -1)[:, :n]
    ok_sorted = ok.reshape(F, -1)[:, :n] > 0
    if not unsort:
        return q_sorted, ok_sorted, prep.covered
    return (
        unsort_frames(q_sorted, prep.order0),
        unsort_frames(ok_sorted, prep.order0),
        prep.covered,
    )


def suggest_window(n: int, box_z: float, margin: float = 4.5, row_tile: int = 256,
                   safety: float = 1.35) -> int:
    """Window width (multiple of 128) expected to cover a tile's slab (see
    qtet_sorted.suggest_window)."""
    tile_extent = row_tile / n * box_z
    slab = tile_extent + 2.0 * margin
    est = n * slab / box_z * safety + 256
    return int(-(-est // 128) * 128)


# which kernel tier served the most recent order_param_q_certified call:
# "slab" | "chunked" | "hbm" | "brute" (drivers log it, VERDICT r2 item 5)
last_tier: str = "none"


def order_param_q_certified(
    pos,
    boxes,
    low_cut: float = 0.0,
    high_cut: float = 10.0,
    row_tile: int = 256,
    margin: float = 4.5,
):
    """Fastest q with certified exactness (host-level dispatch, not jittable).

    Runs the slab-pruned trajectory kernel and checks its validity
    certificates on the host. Atoms whose per-atom certificate fails (4th
    neighbor beyond `margin` — a few per million in condensed phases) are
    recomputed individually on the XLA path and patched in; only a window
    coverage failure (sparse box, large drift) falls back to the brute
    kernel whose sole assumption is the (low, high] shell itself. Returns
    q (F, N) in the original atom order.
    """
    import numpy as np

    from waterorderlib_tpu.ops.pallas.slab import suggest_pad

    global last_tier

    n = pos.shape[1]
    box_z = float(boxes[0, 2])
    window = suggest_window(n, box_z, margin=margin, row_tile=row_tile)
    # scoped-VMEM guard (slab.fits_scoped_vmem): halve the row tile until
    # the kernel stack fits the 16 MB scoped limit so large systems stay on
    # the certified slab path instead of OOMing to XLA
    from waterorderlib_tpu.ops.pallas.slab import fits_scoped_vmem

    while row_tile > 128 and not fits_scoped_vmem(row_tile, window, 4):
        row_tile //= 2
        window = suggest_window(n, box_z, margin=margin, row_tile=row_tile)
    # pad must span at least the drift-inflated margin in z (the covered
    # certificate verifies; this sizes it adaptively instead of fixed 512)
    pad = suggest_pad(n, box_z, margin + 2.0)
    if window < n:
        # pruning pays off: certified slab kernel — monolithic when its
        # scratch fits VMEM, otherwise the window-chunked carry variant
        # (qtet_chunked.py, bit-identical results) for 100k+ systems
        if fits_scoped_vmem(row_tile, window, 4):
            last_tier = "slab"
            q, ok, cov = order_param_q_traj(
                pos, boxes, low_cut, high_cut, margin=margin,
                row_tile=row_tile, window=window, pad=pad,
            )
        else:
            if n > 450_000:
                # beyond ~0.5M atoms even the chunked kernel's VMEM-resident
                # coordinates + whole-frame outputs overflow; stream the
                # coordinates from HBM instead (bit-identical)
                from waterorderlib_tpu.ops.pallas.qtet_hbm import (
                    order_param_q_traj_hbm as chunked_fn,
                )

                last_tier = "hbm"
            else:
                from waterorderlib_tpu.ops.pallas.qtet_chunked import (
                    order_param_q_traj_chunked as chunked_fn,
                )

                last_tier = "chunked"

            q, ok, cov = chunked_fn(
                pos, boxes, low_cut, high_cut, margin=margin,
                row_tile=128, window=window, pad=pad,
            )
        if bool(np.asarray(cov).all()):
            ok_np = np.asarray(ok)
            if ok_np.all():
                return q
            bad_frac = 1.0 - ok_np.mean()
            if bad_frac < 1e-3:  # patch stragglers row-by-row on XLA
                from waterorderlib_tpu.order import qtet as _qtet

                q = np.asarray(q)
                for f in np.unique(np.nonzero(~ok_np)[0]):
                    rows = np.nonzero(~ok_np[f])[0]
                    q[f, rows] = np.asarray(
                        _qtet.order_param_q(
                            pos[f][rows], pos[f], boxes[f], low_cut, high_cut,
                            row_block=max(8, len(rows)),
                        )
                    )
                return jnp.asarray(q)
    # brute fallback: shrink the row tile so the (rt, N) dsq scratch plus
    # Mosaic temporaries stay within VMEM (~3.5 MB for the scratch itself)
    last_tier = "brute"
    rt_b = min(row_tile, max(8, (3_500_000 // (n * 4)) // 8 * 8))
    return order_param_q_frames(pos, boxes, low_cut, high_cut, row_tile=rt_b)
