"""Device-mesh sharding for trajectory analysis.

The reference is single-process/single-thread (no MPI, no threading anywhere
in its tree — SURVEY.md §2c); the TPU-native scaling story replaces that gap:

- **frames axis = data parallelism**: each device processes a slice of the
  trajectory; per-frame statistics stay local, global histograms are
  `psum`-reduced over the mesh.
- **atoms axis = tensor parallelism within a frame**: rows of the pairwise
  distance computation are sharded; each shard `all_gather`s the column
  atoms (rides ICI) and computes its row block of neighbors/order params.

Everything is expressed with `jax.sharding.Mesh` + `shard_map`, so the same
code runs on 1 chip, a v5e-8 slice, or a spoofed 8-device CPU mesh in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from waterorderlib_tpu.ops import histograms
from waterorderlib_tpu.order import qtet
from waterorderlib_tpu.ops import pairs


def make_mesh(n_frame_shards: int, n_atom_shards: int, devices=None) -> Mesh:
    """2-D ('frames', 'atoms') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = n_frame_shards * n_atom_shards
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(n_frame_shards, n_atom_shards)
    return Mesh(dev, ("frames", "atoms"))


def default_mesh_shape(n_devices: int) -> tuple[int, int]:
    """Prefer 2-way atom sharding when the device count allows it."""
    if n_devices % 2 == 0 and n_devices >= 4:
        return n_devices // 2, 2
    return n_devices, 1


@partial(jax.jit, static_argnames=("mesh", "n_bins", "row_block"))
def _sharded_q_analysis_masked(
    pos: jnp.ndarray,
    boxes: jnp.ndarray,
    mask: jnp.ndarray,
    mesh: Mesh,
    low_cut: float,
    high_cut: float,
    n_bins: int,
    row_block: int,
):
    def local_step(pos_blk, box_blk, mask_blk):
        # pos_blk: (F_loc, N_loc, 3); gather the full atom axis for columns.
        pos_full = jax.lax.all_gather(pos_blk, "atoms", axis=1, tiled=True)

        def one_frame(args):
            rows, full, box = args
            return qtet.order_param_q(
                rows, full, box, low_cut, high_cut, row_block=min(row_block, rows.shape[0])
            )

        q_loc = jax.lax.map(one_frame, (pos_blk, pos_full, box_blk))  # (F_loc, N_loc)
        # per-frame mean over the valid atoms of the full atom axis
        n_valid = jax.lax.psum(jnp.sum(mask_blk, axis=-1), "atoms")
        q_sum = jax.lax.psum(jnp.sum(jnp.where(mask_blk, q_loc, 0.0), axis=-1), "atoms")
        mean_loc = q_sum / jnp.maximum(n_valid, 1)
        hist = histograms.masked_histogram(q_loc, mask_blk, n_bins, 0.0, 1.0)
        hist = jax.lax.psum(hist, ("frames", "atoms"))
        return q_loc, mean_loc, hist

    return shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P("frames", "atoms", None), P("frames", None), P("frames", "atoms")),
        out_specs=(P("frames", "atoms"), P("frames"), P()),
        check_vma=False,
    )(pos, boxes, mask)


def sharded_q_analysis(
    pos: jnp.ndarray,
    boxes: jnp.ndarray,
    mesh: Mesh,
    low_cut: float = 0.0,
    high_cut: float = 10.0,
    n_bins: int = 500,
    row_block: int = 128,
    mask: jnp.ndarray | None = None,
):
    """Full q_tet analysis step over a ('frames', 'atoms') mesh.

    pos: (F, N, 3) with F divisible by the 'frames' axis size and N by the
    'atoms' axis size; boxes: (F, 3); mask: optional (F, N) bool of atoms to
    include in the mean/histogram (all True by default). For arbitrary F/N
    use :func:`sharded_q_analysis_padded`.

    Returns (q (F, N), mean_q (F,), hist (n_bins,)): per-water q values
    (sharded like pos), per-frame means, and the global q histogram over
    [0, 1] (psum-reduced across the whole mesh).
    """
    if mask is None:
        mask = jnp.ones(pos.shape[:2], bool)
    return _sharded_q_analysis_masked(
        pos, boxes, mask, mesh, low_cut, high_cut, n_bins, row_block
    )


def sharded_q_analysis_padded(
    pos: jnp.ndarray,
    boxes: jnp.ndarray,
    mesh: Mesh,
    low_cut: float = 0.0,
    high_cut: float = 10.0,
    n_bins: int = 500,
    row_block: int = 128,
):
    """`sharded_q_analysis` for F/N not divisible by the mesh axes.

    Frames are padded by repeating the last frame; atoms are padded with NaN
    positions, which the (low, high] shell mask excludes (NaN comparisons are
    false), so padding atoms are never neighbors of real atoms. A validity
    mask removes all padding from the mean and the global histogram, so the
    returned (q (F, N), mean_q (F,), hist) match the unpadded computation.
    """
    f, n = pos.shape[:2]
    df, da = mesh.devices.shape
    pad_f = (-f) % df
    pad_n = (-n) % da
    mask = jnp.ones((f, n), bool)
    if pad_f:
        pos = jnp.concatenate([pos, jnp.repeat(pos[-1:], pad_f, axis=0)], axis=0)
        boxes = jnp.concatenate([boxes, jnp.repeat(boxes[-1:], pad_f, axis=0)], axis=0)
        mask = jnp.concatenate([mask, jnp.zeros((pad_f, n), bool)], axis=0)
    if pad_n:
        pos = jnp.concatenate(
            [pos, jnp.full((pos.shape[0], pad_n, 3), jnp.nan, pos.dtype)], axis=1
        )
        mask = jnp.concatenate(
            [mask, jnp.zeros((pos.shape[0], pad_n), bool)], axis=1
        )
    q, mean_q, hist = _sharded_q_analysis_masked(
        pos, boxes, mask, mesh, low_cut, high_cut, n_bins, row_block
    )
    return q[:f, :n], mean_q[:f], hist


@partial(jax.jit, static_argnames=("mesh", "n_bins", "k", "row_block"))
def sharded_three_body_hist(
    pos: jnp.ndarray,
    boxes: jnp.ndarray,
    mesh: Mesh,
    low_cut: float = 0.0,
    high_cut: float = 3.413,
    k: int = 16,
    n_bins: int = 500,
    row_block: int = 256,
):
    """Trajectory-level 3-body angle histogram, frames sharded over the full
    mesh (both axes as data parallelism), psum-reduced counts.

    pos: (F, N, 3) with F divisible by the device count; boxes (F, 3).
    Returns (n_bins,) counts over [0, 180] degrees — the 3bDistribution
    accumulation of threeBodyCalc (orderParam_lib.py:1269-1424), scaled out.
    """
    from waterorderlib_tpu.order import angles as angles_mod

    def local(p, box):
        def one_frame(args):
            pf, bf = args
            aset = angles_mod.neighbor_angles(
                pf, pf, bf, low_cut, high_cut, k=k, row_block=row_block
            )
            return angles_mod.angle_histogram(aset, n_bins=n_bins)

        h = jnp.sum(jax.lax.map(one_frame, (p, box)), axis=0)
        return jax.lax.psum(h, ("frames", "atoms"))

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(("frames", "atoms"), None, None), P(("frames", "atoms"), None)),
        out_specs=P(),
        check_vma=False,
    )(pos, boxes)


@partial(jax.jit, static_argnames=("mesh", "nbins", "same"))
def sharded_distance_histogram(
    pos1: jnp.ndarray,
    pos2: jnp.ndarray,
    boxes: jnp.ndarray,
    mesh: Mesh,
    binwidth: float,
    nbins: int,
    same: bool = False,
):
    """Trajectory-level pair-distance histogram, frames sharded over the
    full mesh (both axes used as data parallelism), counts psum-reduced.

    pos1/pos2: (F, N, 3); returns summed counts (nbins,)."""

    def local(p1, p2, box):
        def one_frame(args):
            a, b, bx = args
            return pairs.distance_histogram(a, b, bx, binwidth, nbins, same=same)

        h = jnp.sum(jax.lax.map(one_frame, (p1, p2, box)), axis=0)
        return jax.lax.psum(h, ("frames", "atoms"))

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(("frames", "atoms"), None, None),) * 2 + (P(("frames", "atoms"), None),),
        out_specs=P(),
        check_vma=False,
    )(pos1, pos2, boxes)
