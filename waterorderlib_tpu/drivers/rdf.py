"""Radial distribution function driver.

TPU-native replacement for `rdfCalc`
(/root/reference/structureLibs/orderParam_lib.py:575-727): Ow-Ow, Sol-Ow and
Sol-Sol g(r) accumulated over the trajectory in 5 chunks, coordination
numbers n(r) by Simpson integration (8*pi for same-species counted-once
pairs, 4*pi cross, ref :652-658), first-minimum cutoffs via
scipy.signal.argrelmin, and the tetrahedrality t-parameter from the
first-peak integral (ref :677-681).

The per-frame histograms run on device (blocked pair engine with the
reference's ceiling binning and shell normalization, bulk density 1.0 so the
curves are local-density plots, ref :627); the small chunk-level reductions
and peak finding stay on host.

Writes rdf.txt and coord.txt with the reference's exact column layout.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from scipy.integrate import simpson
from scipy.signal import argrelmin

from waterorderlib_tpu.drivers.orderparams import _resolve_system
from waterorderlib_tpu.ops import pairs
from waterorderlib_tpu.stats import blocks


def _first_relmin_index(curve: np.ndarray) -> int:
    mins = argrelmin(curve)[0]
    if len(mins) == 0:
        return len(curve) - 1  # guard: featureless curve (ref would crash)
    return int(mins[0])


def rdf_calc(
    top_file,
    traj_file,
    wat_res: str = "WAT",
    binwidth: float = 0.1,
    totbins: int = 150,
    stride: int = 1,
    n_chunks: int = 5,
    output_dir: str = ".",
    chunk_frames: int | None = None,
    mesh=None,
):
    """Returns ([n1_OwOw, se], [n1_SolOw, se], [tParam, se]) with a solute,
    or ([n1_OwOw, se], [tParam, se]) for pure water (the reference returns a
    degenerate `n1_OwOw, t` there; we return the meaningful pair).

    With `chunk_frames` the trajectory streams through the device in chunks
    (io/streaming.py; per-frame g(r) curves are tiny, so only the chunk's
    coordinates are ever device- or host-resident). With `mesh`
    (parallel.mesh.make_mesh) per-frame histograms shard over the device
    mesh (frames as data parallelism); the options compose."""

    @jax.jit
    def frame_rdfs(wat_pos, sol_pos, boxes):
        def one(carry, frame):
            w, s, box = frame
            g_ww = pairs.radial_dist_same(w, box, binwidth, totbins, 1.0)
            g_ss = pairs.radial_dist_same(s, box, binwidth, totbins, 1.0)
            g_sw = pairs.radial_dist(s, w, box, binwidth, totbins, 1.0)
            return carry, (g_ww, g_ss, g_sw)

        return jax.lax.scan(one, None, (wat_pos, sol_pos, boxes))[1]

    @jax.jit
    def frame_rdfs_watonly(wat_pos, boxes):
        def one(carry, frame):
            w, box = frame
            return carry, pairs.radial_dist_same(w, box, binwidth, totbins, 1.0)

        return jax.lax.scan(one, None, (wat_pos, boxes))[1]

    def batch_curves(pos_b, boxes_b, wat_inds, sol_inds):
        wat_pos = jnp.asarray(pos_b[:, wat_inds, :])
        boxes_d = jnp.asarray(boxes_b)
        if mesh is not None:
            from waterorderlib_tpu.parallel import mesh as pmesh

            def norm(counts, n_rows):
                return np.asarray(pairs.rdf_from_counts(counts, n_rows, binwidth, 1.0))

            c_ww = pmesh.sharded_frame_distance_histograms(
                wat_pos, wat_pos, boxes_d, mesh, binwidth, totbins, same=True
            )
            g_ww = norm(c_ww, len(wat_inds))
            if len(sol_inds):
                sol_pos = jnp.asarray(pos_b[:, sol_inds, :])
                c_ss = pmesh.sharded_frame_distance_histograms(
                    sol_pos, sol_pos, boxes_d, mesh, binwidth, totbins, same=True
                )
                # cross counts: rows = waters, normalized by the solute count
                # (matching pairs.radial_dist(sol, wat))
                c_sw = pmesh.sharded_frame_distance_histograms(
                    wat_pos, sol_pos, boxes_d, mesh, binwidth, totbins, same=False
                )
                return g_ww, norm(c_ss, len(sol_inds)), norm(c_sw, len(sol_inds))
            return g_ww, np.zeros_like(g_ww), np.zeros_like(g_ww)
        # large-N tier: the water-water sweep dominates (O(Nw^2/2) pairs x
        # ~150 threshold compares); the cell-list histogram visits only the
        # 27-cell neighborhoods (bit-identical counts). Needs the histogram
        # range to fit >= 3 cells per box edge — checked over EVERY frame in
        # the batch (an NPT frame shrinking below the bound would raise
        # inside distance_histogram_celllist mid-run otherwise).
        nw = len(wat_inds)
        rmax = totbins * binwidth
        use_cell = nw >= 32768 and float(np.min(boxes_b)) >= 3.0 * rmax
        if use_cell:
            g_ww = np.stack([
                np.asarray(pairs.rdf_from_counts(
                    pairs.distance_histogram_celllist(
                        wat_pos[f], jnp.asarray(boxes_b[f]), binwidth, totbins
                    ), nw, binwidth, 1.0,
                ))
                for f in range(wat_pos.shape[0])
            ])
            if len(sol_inds):
                sol_pos = jnp.asarray(pos_b[:, sol_inds, :])

                @jax.jit
                def sol_curves(sol_pos, wat_pos, boxes):
                    def one(carry, frame):
                        s, w, box = frame
                        g_ss = pairs.radial_dist_same(s, box, binwidth, totbins, 1.0)
                        g_sw = pairs.radial_dist(s, w, box, binwidth, totbins, 1.0)
                        return carry, (g_ss, g_sw)

                    return jax.lax.scan(one, None, (sol_pos, wat_pos, boxes))[1]

                g_ss, g_sw = (np.asarray(x) for x in
                              sol_curves(sol_pos, wat_pos, boxes_d))
                return g_ww, g_ss, g_sw
            return g_ww, np.zeros_like(g_ww), np.zeros_like(g_ww)
        if len(sol_inds):
            sol_pos = jnp.asarray(pos_b[:, sol_inds, :])
            return tuple(np.asarray(x) for x in frame_rdfs(wat_pos, sol_pos, boxes_d))
        g = np.asarray(frame_rdfs_watonly(wat_pos, boxes_d))
        return g, np.zeros_like(g), np.zeros_like(g)

    if chunk_frames is not None:
        from waterorderlib_tpu.io.streaming import iter_chunks
        from waterorderlib_tpu.io.topology import Topology
        from waterorderlib_tpu.io.trajectory import load_topology

        top = top_file if isinstance(top_file, Topology) else load_topology(top_file)
        wat_inds, _, _ = top.get_wat_inds(wat_res)
        sol_inds, *_ = top.get_sol_inds(wat_res)
        has_sol = len(sol_inds) > 0
        parts = [
            batch_curves(pos_c, boxes_c, wat_inds, sol_inds)
            for pos_c, boxes_c in iter_chunks(traj_file, chunk_frames, stride, n_atoms=top.n_atoms)
        ]
        g_ww, g_ss, g_sw = (np.concatenate([p[i] for p in parts]) for i in range(3))
        F = g_ww.shape[0]
    else:
        top, traj = _resolve_system(top_file, traj_file, stride)
        wat_inds, _, _ = top.get_wat_inds(wat_res)
        sol_inds, *_ = top.get_sol_inds(wat_res)
        has_sol = len(sol_inds) > 0
        F = traj.n_frames
        g_ww, g_ss, g_sw = batch_curves(traj.positions, traj.boxes, wat_inds, sol_inds)
    chunk = F // n_chunks

    dist = np.linspace(0, (totbins - 1) * binwidth, totbins) + binwidth

    tot = {k: [] for k in ("rdf_ww", "rdf_ss", "rdf_sw", "co_ww", "co_ss", "co_sw",
                           "n1_ww", "n1_sw", "t")}
    for c in range(n_chunks):
        sl = slice(c * chunk, (c + 1) * chunk)
        rdf_ww = g_ww[sl].mean(axis=0)
        rdf_ss = g_ss[sl].mean(axis=0)
        rdf_sw = g_sw[sl].mean(axis=0)
        tot["rdf_ww"].append(rdf_ww)
        tot["rdf_ss"].append(rdf_ss)
        tot["rdf_sw"].append(rdf_sw)

        co_ww = np.zeros(totbins - 2)
        co_ss = np.zeros(totbins - 2)
        co_sw = np.zeros(totbins - 2)
        for j in range(2, totbins):
            co_ww[j - 2] = 8.0 * np.pi * simpson(rdf_ww[:j] * dist[:j] ** 2, x=dist[:j])
            if has_sol:
                co_sw[j - 2] = 4.0 * np.pi * simpson(rdf_sw[:j] * dist[:j] ** 2, x=dist[:j])
                co_ss[j - 2] = 8.0 * np.pi * simpson(rdf_ss[:j] * dist[:j] ** 2, x=dist[:j])
        tot["co_ww"].append(co_ww)
        tot["co_ss"].append(co_ss)
        tot["co_sw"].append(co_sw)

        if has_sol:
            m_sw = _first_relmin_index(rdf_sw)
            tot["n1_sw"].append(co_sw[max(m_sw - 2, 0)])
        m_ww = _first_relmin_index(rdf_ww)
        tot["n1_ww"].append(co_ww[max(m_ww - 2, 0)])
        # tetrahedrality t-parameter from the first-peak integral (ref :677)
        rc = dist[m_ww]
        peak = rdf_ww[:m_ww] / rdf_ww[-1] if rdf_ww[-1] != 0 else rdf_ww[:m_ww]
        tot["t"].append(simpson(peak, x=dist[:m_ww]) / rc if m_ww >= 2 else 0.0)

    se = blocks.chunk_se
    rdf_ww_m = np.mean(tot["rdf_ww"], axis=0)
    rdf_ss_m = np.mean(tot["rdf_ss"], axis=0)
    rdf_sw_m = np.mean(tot["rdf_sw"], axis=0)
    co_ww_m = np.mean(tot["co_ww"], axis=0)
    co_ss_m = np.mean(tot["co_ss"], axis=0)
    co_sw_m = np.mean(tot["co_sw"], axis=0)

    np.savetxt(
        os.path.join(output_dir, "rdf.txt"),
        np.stack(
            [dist, rdf_ww_m, se(np.array(tot["rdf_ww"])),
             rdf_ss_m, se(np.array(tot["rdf_ss"])),
             rdf_sw_m, se(np.array(tot["rdf_sw"]))], axis=1,
        ),
        header="pair distance (A)     Ow-Ow rdf     err     Sol-Sol rdf     err     Sol-Ow rdf     err",
        fmt="%.3e",
    )
    np.savetxt(
        os.path.join(output_dir, "coord.txt"),
        np.stack(
            [dist[2:], co_ww_m, se(np.array(tot["co_ww"])),
             co_ss_m, se(np.array(tot["co_ss"])),
             co_sw_m, se(np.array(tot["co_sw"]))], axis=1,
        ),
        header="pair distance (A)     Ow-Ow n1     err     Sol-Sol n1     err     Sol-Ow n1     err",
        fmt="%.3e",
    )

    n1_ww = [float(np.mean(tot["n1_ww"])), float(se(np.array(tot["n1_ww"])))]
    t_param = [float(np.mean(tot["t"])), float(se(np.array(tot["t"])))]
    if has_sol:
        n1_sw = [float(np.mean(tot["n1_sw"])), float(se(np.array(tot["n1_sw"])))]
        return n1_ww, n1_sw, t_param
    return n1_ww, t_param
