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
from jax.experimental.shard_map import shard_map
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
def sharded_q_analysis(
    pos: jnp.ndarray,
    boxes: jnp.ndarray,
    mesh: Mesh,
    low_cut: float = 0.0,
    high_cut: float = 10.0,
    n_bins: int = 500,
    row_block: int = 128,
):
    """Full q_tet analysis step over a ('frames', 'atoms') mesh.

    pos: (F, N, 3) with F divisible by the 'frames' axis size and N by the
    'atoms' axis size; boxes: (F, 3).

    Returns (q (F, N), mean_q (F,), hist (n_bins,)): per-water q values
    (sharded like pos), per-frame means, and the global q histogram over
    [0, 1] (psum-reduced across the whole mesh).
    """

    def local_step(pos_blk, box_blk):
        # pos_blk: (F_loc, N_loc, 3); gather the full atom axis for columns.
        pos_full = jax.lax.all_gather(pos_blk, "atoms", axis=1, tiled=True)

        def one_frame(args):
            rows, full, box = args
            return qtet.order_param_q(
                rows, full, box, low_cut, high_cut, row_block=min(row_block, rows.shape[0])
            )

        q_loc = jax.lax.map(one_frame, (pos_blk, pos_full, box_blk))  # (F_loc, N_loc)
        # per-frame mean over the full atom axis
        n_total = pos_full.shape[1]
        mean_loc = jax.lax.psum(jnp.sum(q_loc, axis=-1), "atoms") / n_total
        hist = histograms.masked_histogram(
            q_loc, jnp.ones_like(q_loc, dtype=bool), n_bins, 0.0, 1.0
        )
        hist = jax.lax.psum(hist, ("frames", "atoms"))
        return q_loc, mean_loc, hist

    return shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P("frames", "atoms", None), P("frames", None)),
        out_specs=(P("frames", "atoms"), P("frames"), P()),
        check_rep=False,
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
        check_rep=False,
    )(pos1, pos2, boxes)
