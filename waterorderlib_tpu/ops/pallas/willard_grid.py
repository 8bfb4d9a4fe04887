"""Pallas TPU kernel: Willard-Chandler density + normals on a regular grid.

Replaces `WillardDensityField` (waterlib.f90:1286-1341) for uniform grids,
superseding the generic points kernel (willard_kernel.py) on the hot
density_grid path. Three structural wins over the points kernel:

1. **z-slab pruning**: the Gaussian is truncated at 3*sigma (= 7.2 A at the
   default smoothlen), so a grid plane at z only sees atoms within 3*sigma
   of it. Atoms are z-sorted with wrapped boundary-slab copies (the qtet2
   trick) and each plane scans one contiguous window — a ~3x reduction in
   pairs, certified per plane by `covered`.
2. **one kernel step per z-plane** (nz steps total): the (i, j) sweep runs
   as an in-kernel loop over x-rows with j on sublanes and atoms on lanes,
   so per-step overhead is amortized over ~0.5M pairs.
3. **no scatter**: per (i, k) partial sums land in a resident (ny, nx-lane)
   accumulator via a one-hot lane mask and are flushed once per plane.

Semantics match density.fields.willard_density_points evaluated on the
grid: truncated-SHIFTED Gaussian for the density (g - shift inside r <
3*sigma), UNshifted Gaussian for the gradient/normal field, f32.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(nx: int, ny_sub: int, nx_lanes: int, W: int):
    def kernel(scalars_ref, starts_ref, ext_t_ref,
               dens_ref, nx_ref, ny_ref, nz_ref,
               acc_d, acc_x, acc_y, acc_z):
        k = pl.program_id(0)
        sig2 = scalars_ref[0]
        inv2sig2 = scalars_ref[1]
        peak = scalars_ref[2]
        shift = scalars_ref[3]
        bx, by, bz = scalars_ref[4], scalars_ref[5], scalars_ref[6]
        gx0, dgx = scalars_ref[7], scalars_ref[8]
        gy0, dgy = scalars_ref[9], scalars_ref[10]
        gz0, dgz = scalars_ref[11], scalars_ref[12]

        start = starts_ref[k] * 128
        xs = ext_t_ref[0, pl.ds(start, W)].reshape(1, W)
        ys = ext_t_ref[1, pl.ds(start, W)].reshape(1, W)
        zs = ext_t_ref[2, pl.ds(start, W)].reshape(1, W)

        def mi(d, box_l):
            d = jnp.where(d > box_l * 0.5, d - box_l, d)
            return jnp.where(d < -box_l * 0.5, d + box_l, d)

        def wrap(v, box_l):
            # grid points may lie outside [0, L) (density_grid spans the
            # solute extent ± half a box); distances are invariant under
            # wrapping the grid coordinate, and select-mi needs [0, L)
            return v - box_l * jnp.floor(v / box_l)

        gz = wrap(gz0 + dgz * k.astype(jnp.float32), bz)
        dz = mi(gz - zs, bz)  # (1, W)
        dz_sq = dz * dz

        j_iota = jax.lax.broadcasted_iota(jnp.int32, (ny_sub, 1), 0).astype(jnp.float32)
        gy = wrap(gy0 + dgy * j_iota, by)  # (ny_sub, 1)
        dy = mi(gy - ys, by)  # (ny_sub, W)
        dy_sq = dy * dy
        ey = jnp.exp(-dy_sq * inv2sig2)  # (ny_sub, W)

        nine_sig2 = 9.0 * sig2
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, nx_lanes), 1)

        acc_d[...] = jnp.zeros((ny_sub, nx_lanes), jnp.float32)
        acc_x[...] = jnp.zeros((ny_sub, nx_lanes), jnp.float32)
        acc_y[...] = jnp.zeros((ny_sub, nx_lanes), jnp.float32)
        acc_z[...] = jnp.zeros((ny_sub, nx_lanes), jnp.float32)

        for i in range(nx):
            gx = wrap(gx0 + dgx * jnp.float32(i), bx)
            dx = mi(gx - xs, bx)  # (1, W)
            exz = jnp.exp(-(dx * dx + dz_sq) * inv2sig2) * peak  # (1, W)
            g = ey * exz  # (ny_sub, W)
            dsq = dy_sq + (dx * dx + dz_sq)
            inside = dsq < nine_sig2
            gm = jnp.where(inside, g, 0.0)
            n_in = jnp.sum(inside.astype(jnp.float32), axis=1, keepdims=True)
            dsum = jnp.sum(gm, axis=1, keepdims=True) - shift * n_in  # (ny_sub, 1)
            nxs = jnp.sum(gm * (-dx), axis=1, keepdims=True)
            nys = jnp.sum(gm * (-dy), axis=1, keepdims=True)
            nzs = jnp.sum(gm * (-dz), axis=1, keepdims=True)
            hot = (lane == i).astype(jnp.float32)  # (1, nx_lanes)
            acc_d[...] = acc_d[...] + dsum * hot
            acc_x[...] = acc_x[...] + nxs * hot
            acc_y[...] = acc_y[...] + nys * hot
            acc_z[...] = acc_z[...] + nzs * hot

        inv_sig2 = 1.0 / sig2
        dens_ref[0] = acc_d[...]
        nx_ref[0] = acc_x[...] * inv_sig2
        ny_ref[0] = acc_y[...] * inv_sig2
        nz_ref[0] = acc_z[...] * inv_sig2

    return kernel


def _make_kernel_x(nx: int, ny_sub: int, nx_lanes: int, n_extx: int, wx: int):
    """x-windowed variant: the input block is one plane's z-window, x-sorted
    with x-boundary copies; each x-row scans a 128-aligned `wx`-lane
    sub-window instead of the whole plane window (the known ~2x in the
    plane kernel — atoms beyond 3*sigma in x contributed only zeros)."""

    def kernel(scalars_ref, startsx_ref, extp_ref,
               dens_ref, nx_ref, ny_ref, nz_ref,
               acc_d, acc_x, acc_y, acc_z, ey_s, dy_s, dz_s):
        k = pl.program_id(0)
        sig2 = scalars_ref[0]
        inv2sig2 = scalars_ref[1]
        peak = scalars_ref[2]
        shift = scalars_ref[3]
        bx, by, bz = scalars_ref[4], scalars_ref[5], scalars_ref[6]
        gx0, dgx = scalars_ref[7], scalars_ref[8]
        gy0, dgy = scalars_ref[9], scalars_ref[10]
        gz0, dgz = scalars_ref[11], scalars_ref[12]

        def mi(d, box_l):
            d = jnp.where(d > box_l * 0.5, d - box_l, d)
            return jnp.where(d < -box_l * 0.5, d + box_l, d)

        def wrap(v, box_l):
            return v - box_l * jnp.floor(v / box_l)

        ys = extp_ref[0, 1, :].reshape(1, n_extx)
        zs = extp_ref[0, 2, :].reshape(1, n_extx)

        gz = wrap(gz0 + dgz * k.astype(jnp.float32), bz)
        # (8, n_extx) scratch, row 0 live: single-sublane scratches are
        # fragile under Mosaic's (8, 128) tiling
        dz_s[0:1, :] = mi(gz - zs, bz)

        j_iota = jax.lax.broadcasted_iota(jnp.int32, (ny_sub, 1), 0).astype(jnp.float32)
        gy = wrap(gy0 + dgy * j_iota, by)  # (ny_sub, 1)
        dy = mi(gy - ys, by)  # (ny_sub, n_extx)
        dy_s[...] = dy
        ey_s[...] = jnp.exp(-(dy * dy) * inv2sig2)

        nine_sig2 = 9.0 * sig2
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, nx_lanes), 1)

        acc_d[...] = jnp.zeros((ny_sub, nx_lanes), jnp.float32)
        acc_x[...] = jnp.zeros((ny_sub, nx_lanes), jnp.float32)
        acc_y[...] = jnp.zeros((ny_sub, nx_lanes), jnp.float32)
        acc_z[...] = jnp.zeros((ny_sub, nx_lanes), jnp.float32)

        for i in range(nx):
            sx = startsx_ref[k * nx + i] * 128
            xs = extp_ref[0, 0, pl.ds(sx, wx)].reshape(1, wx)
            gx = wrap(gx0 + dgx * jnp.float32(i), bx)
            dx = mi(gx - xs, bx)  # (1, wx)
            dzv = dz_s[0, pl.ds(sx, wx)].reshape(1, wx)
            dxz_sq = dx * dx + dzv * dzv
            exz = jnp.exp(-dxz_sq * inv2sig2) * peak  # (1, wx)
            eyv = ey_s[:, pl.ds(sx, wx)]  # (ny_sub, wx)
            dyv = dy_s[:, pl.ds(sx, wx)]
            g = eyv * exz
            dsq = dyv * dyv + dxz_sq
            inside = dsq < nine_sig2
            gm = jnp.where(inside, g, 0.0)
            n_in = jnp.sum(inside.astype(jnp.float32), axis=1, keepdims=True)
            dsum = jnp.sum(gm, axis=1, keepdims=True) - shift * n_in
            nxs = jnp.sum(gm * (-dx), axis=1, keepdims=True)
            nys = jnp.sum(gm * (-dyv), axis=1, keepdims=True)
            nzs = jnp.sum(gm * (-dzv), axis=1, keepdims=True)
            hot = (lane == i).astype(jnp.float32)  # (1, nx_lanes)
            acc_d[...] = acc_d[...] + dsum * hot
            acc_x[...] = acc_x[...] + nxs * hot
            acc_y[...] = acc_y[...] + nys * hot
            acc_z[...] = acc_z[...] + nzs * hot

        inv_sig2 = 1.0 / sig2
        dens_ref[0] = acc_d[...]
        nx_ref[0] = acc_x[...] * inv_sig2
        ny_ref[0] = acc_y[...] * inv_sig2
        nz_ref[0] = acc_z[...] * inv_sig2

    return kernel


def suggest_window_x(
    n: int,
    box_x: float,
    window: int = 2048,
    smoothlen: float = 2.4,
    slack: float = 1.35,
):
    """Static (window_x, pad_x) for willard_density_grid, or (0, 0) when the
    x sub-window cannot help (small/brute systems, or a cut spanning most of
    the box). Purely heuristic — correctness is guarded by the kernel's
    coverage certificate, a miss only costs the fallback path."""
    n128 = max(128, -(-n // 128) * 128)
    if n128 <= window:
        return 0, 0  # brute path: every window holds all atoms anyway
    w = min(window, (n // 128) * 128)
    cut = 3.0 * smoothlen
    per_row = w * (2.0 * cut) / box_x
    wx = int(-(-(per_row * slack + 128.0) // 128) * 128)
    pad_x = int(-(-(1.5 * w * cut / box_x) // 128) * 128)
    pad_x = max(128, min(pad_x, w))
    if wx >= w:
        return 0, 0
    return wx, pad_x


@partial(jax.jit, static_argnames=("nx", "ny", "nz", "window", "pad", "window_x", "pad_x"))
def willard_density_grid(
    pos: jnp.ndarray,
    box: jnp.ndarray,
    gx0: float, dgx: float, nx: int,
    gy0: float, dgy: float, ny: int,
    gz0: float, dgz: float, nz: int,
    smoothlen: float = 2.4,
    window: int = 2048,
    pad: int = 640,
    window_x: int = 0,
    pad_x: int = 0,
):
    """Willard-Chandler field on a uniform grid, one kernel launch.

    pos: (N, 3) atoms; box: (3,); grid axis g = g0 + dg * arange(n).
    Returns (dens (nx, ny, nz), norms (nx, ny, nz, 3) unit normals,
    covered () bool certificate). Matches
    fields.willard_density_points(pos, grid, box, smoothlen) to f32.

    window_x > 0 additionally x-sorts each plane's z-window (with pad_x
    x-boundary copies) so every x-row scans a 128-aligned window_x-lane
    sub-window instead of the whole plane window; use suggest_window_x for
    static sizes. Exactness is certified: per-(plane, row) coverage, pad
    span >= 3*sigma, and the structural no-double-count guarantee that an
    atom and its x-copy sit exactly `window` slots apart in the x-sorted
    array, farther than any window_x < window sub-window reaches.
    """
    n = pos.shape[0]
    pad = min(pad, n)  # boundary copies cannot exceed the atom count
    box = box.astype(jnp.float32)
    sig2 = smoothlen * smoothlen
    cut = 3.0 * smoothlen

    # z-sort atoms + boundary-slab copies so each plane scans one window
    wrapped = jnp.mod(pos, box[None, :]).astype(jnp.float32)
    order = jnp.argsort(wrapped[:, 2])
    sp = wrapped[order]
    L = box[2]
    gz = gz0 + dgz * jnp.arange(nz, dtype=jnp.float32)
    # plane z may lie outside [0, L): wrap it for the window search (the
    # kernel's min-image handles the distance either way)
    gz_w = jnp.mod(gz, L)

    n128 = max(128, -(-n // 128) * 128)
    if n128 <= window:
        # Small system: every window would hold all atoms, so boundary
        # copies would be double-counted (the kernel min-images z, folding
        # an atom's +-L copy back onto the original). Run brute: the whole
        # atom set (sentinel-padded to a lane multiple) in one window,
        # pure min-image — exact by construction.
        w = n128
        ext = sp
        if n128 > n:
            sentinel = jnp.full((n128 - n, 3), 1e6, ext.dtype)
            ext = jnp.concatenate([ext, sentinel], axis=0)
        starts = jnp.zeros((nz,), jnp.int32)
        covered = jnp.bool_(True)
    else:
        z_shift = jnp.stack(
            [jnp.zeros(pad), jnp.zeros(pad), jnp.full(pad, 1.0) * L], axis=-1
        )
        ext = jnp.concatenate([sp[-pad:] - z_shift, sp, sp[:pad] + z_shift], axis=0)
        n_ext = ext.shape[0]
        # window strictly smaller than the atom count, so no window can hold
        # an atom together with its own periodic copy
        w = min(window, (n // 128) * 128)
        ext_z = ext[:, 2]
        starts = jnp.searchsorted(ext_z, gz_w - cut, side="left")
        ends = jnp.searchsorted(ext_z, gz_w + cut, side="right")
        starts = (starts // 128) * 128
        starts = jnp.clip(starts, 0, n_ext - w)
        # pad slabs must span >= cut in z, or cross-boundary Gaussians fall
        # outside ext while the window check still passes
        pad_ok = (ext_z[0] <= jnp.min(gz_w) - cut) & (ext_z[-1] >= jnp.max(gz_w) + cut)
        covered = jnp.all(ends - starts <= w) & pad_ok
        starts = (starts // 128).astype(jnp.int32)

    peak = 1.0 / (2.0 * np.pi * sig2) ** 1.5
    shift = float(np.exp(-4.5)) * peak
    scalars = jnp.stack([
        jnp.asarray(sig2, jnp.float32), jnp.asarray(0.5 / sig2, jnp.float32),
        jnp.asarray(peak, jnp.float32), jnp.asarray(shift, jnp.float32),
        box[0], box[1], box[2],
        jnp.asarray(gx0, jnp.float32), jnp.asarray(dgx, jnp.float32),
        jnp.asarray(gy0, jnp.float32), jnp.asarray(dgy, jnp.float32),
        jnp.asarray(gz0, jnp.float32), jnp.asarray(dgz, jnp.float32),
    ])

    ny_sub = -(-ny // 8) * 8
    nx_lanes = -(-nx // 128) * 128

    out_spec = pl.BlockSpec(
        (1, ny_sub, nx_lanes), lambda k, s1, s2: (k, 0, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((nz, ny_sub, nx_lanes), jnp.float32)

    use_x = (
        window_x > 0 and n128 > window and window_x % 128 == 0
        and pad_x >= 128 and pad_x % 128 == 0 and window_x < w
    )
    if use_x:
        # per-plane x-sorted windows: gather each plane's z-window, sort by
        # wrapped x, append pad_x boundary copies at both ends. An atom and
        # its x-copy end up exactly `w` apart (left copy c is sorted slot
        # w-pad_x+c at ext index w+c vs copy index c; right copy c is slot c
        # at ext index pad_x+c vs copy index pad_x+w+c), so no window_x < w
        # sub-window can hold both — no min-image double count.
        px = min(pad_x, w)
        idx = starts[:, None].astype(jnp.int32) * 128 + jnp.arange(w)[None, :]
        win = ext[idx]  # (nz, w, 3)
        Lx = box[0]
        xw = jnp.mod(win[..., 0], Lx)
        ordx = jnp.argsort(xw, axis=1)
        win_s = jnp.take_along_axis(win, ordx[..., None], axis=1)
        win_s = win_s.at[..., 0].set(jnp.take_along_axis(xw, ordx, axis=1))
        left = win_s[:, -px:, :].at[..., 0].add(-Lx)
        right = win_s[:, :px, :].at[..., 0].add(Lx)
        extx = jnp.concatenate([left, win_s, right], axis=1)  # (nz, n_extx, 3)
        n_extx = w + 2 * px
        ex_x = extx[..., 0]  # (nz, n_extx), sorted per plane
        gxv = gx0 + dgx * jnp.arange(nx, dtype=jnp.float32)
        gx_w = jnp.mod(gxv, Lx)
        starts_x = jax.vmap(
            lambda row: jnp.searchsorted(row, gx_w - cut, side="left")
        )(ex_x)  # (nz, nx)
        ends_x = jax.vmap(
            lambda row: jnp.searchsorted(row, gx_w + cut, side="right")
        )(ex_x)
        starts_x = (starts_x // 128) * 128
        starts_x = jnp.clip(starts_x, 0, n_extx - window_x)
        cov_x = jnp.all(ends_x - starts_x <= window_x)
        pad_ok_x = jnp.all(ex_x[:, 0] <= jnp.min(gx_w) - cut) & jnp.all(
            ex_x[:, -1] >= jnp.max(gx_w) + cut
        )
        covered = covered & cov_x & pad_ok_x
        extp = jnp.transpose(extx, (0, 2, 1)).astype(jnp.float32)  # (nz, 3, n_extx)
        startsx_flat = (starts_x // 128).astype(jnp.int32).reshape(-1)

        in_spec_x = pl.BlockSpec(
            (1, 3, n_extx), lambda k, s1, s2: (k, 0, 0), memory_space=pltpu.VMEM
        )
        dens, nxf, nyf, nzf = pl.pallas_call(
            _make_kernel_x(nx, ny_sub, nx_lanes, n_extx, window_x),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(nz,),
                in_specs=[in_spec_x],
                out_specs=(out_spec, out_spec, out_spec, out_spec),
                scratch_shapes=(
                    [pltpu.VMEM((ny_sub, nx_lanes), jnp.float32)] * 4
                    + [pltpu.VMEM((ny_sub, n_extx), jnp.float32)] * 2
                    + [pltpu.VMEM((8, n_extx), jnp.float32)]
                ),
            ),
            out_shape=(shape, shape, shape, shape),
        )(scalars, startsx_flat, extp)
    else:
        ext_t = jnp.transpose(ext).astype(jnp.float32)
        dens, nxf, nyf, nzf = pl.pallas_call(
            _make_kernel(nx, ny_sub, nx_lanes, w),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(nz,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=(out_spec, out_spec, out_spec, out_spec),
                scratch_shapes=[pltpu.VMEM((ny_sub, nx_lanes), jnp.float32)] * 4,
            ),
            out_shape=(shape, shape, shape, shape),
        )(scalars, starts, ext_t)

    # (nz, ny, nx) -> (nx, ny, nz)
    def arrange(a):
        return jnp.transpose(a[:, :ny, :nx], (2, 1, 0))

    dens = arrange(dens)
    nvec = jnp.stack([arrange(nxf), arrange(nyf), arrange(nzf)], axis=-1)
    nn = jnp.linalg.norm(nvec, axis=-1, keepdims=True)
    norms = nvec / jnp.where(nn > 0, nn, 1.0)
    return dens, norms, covered
