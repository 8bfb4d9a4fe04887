"""Pallas TPU kernel: fused Voronoi cell moments via 1-D line clipping.

Fuses the entire `_cell_moments_clip` stage of `surface.voronoi_device`
(the per-cell clip + face-accumulation math) into one VMEM-resident kernel,
eliminating the HBM round trips of the XLA path's (num, P, K_search)
intermediates. Reference workload: the scipy.spatial Voronoi tessellations
behind /root/reference/structureLibs/orderParam_lib.py:920-962 and
surface_library.py:245-307 (SURVEY.md §7.6).

Per-atom data flow (K build planes, K_search candidates, P = C(K,2) pairs
padded to PP lanes, F = K*K face-edge slots):

- pair quantities (r_i, r_j, s_i, s_j per pair) via two one-hot MXU
  matmuls of the (8, K_search) per-plane row matrix;
- the clip stage in a (K_search, PP) sublane x lane layout: A = t_hat.r_j
  and B = s_j - q.r_j as rank-1 broadcast sums, u_hi/u_lo as sublane
  reductions over the K build rows, beyond-build planes checked against
  both interval endpoints (a plane cuts the cell iff it cuts a vertex,
  and every vertex is a feasible endpoint);
- face accumulation in a (1, F) flattened (face, edge-slot) layout filled
  by ONE one-hot matmul (slot f*K+e <- pair face_pairs[f, e]). The edge
  orientation sign is STATIC in clip space: tvec is along +(r_i x r_j) by
  construction, so (r_f x tvec).r_other = -(tvec.t) < 0 on i-slots and
  > 0 on j-slots (Cauchy-Schwarz strict unless parallel) — the sign row
  is a constant, no orient computation;
- endpoint-identity dedup exactly as the XLA tail, via static lane shifts
  (slot e vs e-d within the same face, d = 1..K-2), predicated per atom on
  (host mirror-flag | in-kernel tangency detector). Duplicate edges arise
  only when a build plane is tangent to the cell along an edge (mirror
  constructions at the box boundary, degenerate lattices); a tangent
  plane's own "face" is a degenerate >= 2-edge segment of ~zero area,
  which the detector sees in the pre-dedup face sums. The detector is
  load-bearing: uniform duplication (perfect lattices) scales the volume
  while keeping closure and face-gap certificates at zero, so a flag-only
  skip mis-certifies (caught by the cubic-interior test);
- per-face sums via one (8, F) @ (F, K) block-sum matmul; volume, area,
  closure, face-gap, negativity and extra-cut certificates as in
  `_faces_from_edges`.

Fits k=32/k_search=64 (~4 MB VMEM) and k=40/96 (~9 MB; 96% tier-1
certification on liquid boxes vs 84% at 32/64 — see PERF.md); k=48's face
one-hot alone is 10.6 MB, so higher escalation tiers stay on the XLA clip
path (they process only a few percent of atoms).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e37


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


@lru_cache(maxsize=4)
def _kernel_tables(k: int, ks: int):
    """Static one-hot matrices for the kernel: OHI/OHJ (K_search, PP)
    select each pair's first/second plane; PT (PP, F) scatters pair
    quantities to face-edge slots; SGN (1, F) the static orientation sign
    per slot; SUMM (F, K) per-face block sums."""
    import itertools

    prs = np.array(list(itertools.combinations(range(k), 2)), np.int32)
    p_real = len(prs)
    pp = _pad128(p_real)
    f = k * k
    ohi = np.zeros((ks, pp), np.float32)
    ohj = np.zeros((ks, pp), np.float32)
    ohi[prs[:, 0], np.arange(p_real)] = 1.0
    ohj[prs[:, 1], np.arange(p_real)] = 1.0
    # face_pairs construction must match voronoi_device._tables
    pt = np.zeros((pp, f), np.float32)
    sgn = np.zeros((1, f), np.float32)
    cnt = np.zeros(k, np.int64)
    for p, (i, j) in enumerate(prs):
        pt[p, i * k + cnt[i]] = 1.0
        sgn[0, i * k + cnt[i]] = 1.0  # i-slot: interior away from j
        cnt[i] += 1
        pt[p, j * k + cnt[j]] = 1.0
        sgn[0, j * k + cnt[j]] = -1.0
        cnt[j] += 1
    summ = np.zeros((f, k), np.float32)
    summ[np.arange(f), np.arange(f) // k] = 1.0
    return pp, f, ohi, ohj, pt, sgn, summ


def _make_kernel(k: int, ks: int, pp: int, f: int, ba: int, eps: float,
                 dedup_mode: str = "auto"):
    kext = ks - k

    def kernel(cols_ref, rows_ref, ohi_ref, ohj_ref,
               pt_ref, sgn_ref, summ_ref, scal_ref, fa_ref, fn_ref, q7_ref,
               s8_ref):
        epsf = jnp.float32(eps)
        big = jnp.float32(_BIG)
        e_in_face = jax.lax.broadcasted_iota(jnp.int32, (1, f), 1) % k

        def one_atom(a, _):
            cols = cols_ref[a]  # (64, 8): x y z s rlen 0 0 0
            rows = rows_ref[a]  # (8, 64): same quantities transposed
            rx, ry, rz = cols[:, 0:1], cols[:, 1:2], cols[:, 2:3]
            s_col, rl_col = cols[:, 3:4], cols[:, 4:5]
            # per-atom scalars ride in cols' spare channels (slot 0): a
            # rank-1 SMEM block of `ba` elements does not lower on Mosaic
            # (rank-1 blocks must be full-array or multiples of 128)
            s_scale = cols[0, 5]
            dedup_flag = cols[0, 6]
            tol = epsf * s_scale

            ri = jnp.dot(rows, ohi_ref[:], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
            rj = jnp.dot(rows, ohj_ref[:], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
            rix, riy, riz, s_i, rli = (ri[c : c + 1] for c in range(5))
            rjx, rjy, rjz, s_j, rlj = (rj[c : c + 1] for c in range(5))

            tx = riy * rjz - riz * rjy
            ty = riz * rjx - rix * rjz
            tz = rix * rjy - riy * rjx
            tsq = tx * tx + ty * ty + tz * tz
            pair_ok = jnp.sqrt(tsq) > epsf * rli * rlj
            tsqs = jnp.where(pair_ok, tsq, 1.0)
            # q: the point of the line in span(r_i, r_j)
            cjx = rjy * tz - rjz * ty  # r_j x t
            cjy = rjz * tx - rjx * tz
            cjz = rjx * ty - rjy * tx
            cix = ty * riz - tz * riy  # t x r_i
            ciy = tz * rix - tx * riz
            ciz = tx * riy - ty * rix
            inv_tsq = 1.0 / tsqs
            qx = (s_i * cjx + s_j * cix) * inv_tsq
            qy = (s_i * cjy + s_j * ciy) * inv_tsq
            qz = (s_i * cjz + s_j * ciz) * inv_tsq
            qn = jnp.sqrt(qx * qx + qy * qy + qz * qz)
            itl = jax.lax.rsqrt(tsqs)
            thx, thy, thz = tx * itl, ty * itl, tz * itl

            A = rx * thx + ry * thy + rz * thz  # (ks, PP)
            B = s_col - (rx * qx + ry * qy + rz * qz)
            A_b, A_e = A[:k], A[k:]
            B_b, B_e = B[:k], B[k:]
            athr_b = epsf * rl_col[:k]
            tolb_b = epsf * (s_col[:k] + qn * rl_col[:k])
            den_ok = jnp.abs(A_b) > athr_b
            ratio = B_b / jnp.where(den_ok, A_b, 1.0)
            ub = jnp.where(den_ok & (A_b > 0), ratio, big)
            lb = jnp.where(den_ok & (A_b < 0), ratio, -big)
            par_bad = (~den_ok) & (B_b < -tolb_b)
            u_hi = jnp.min(ub, axis=0, keepdims=True)  # (1, PP)
            u_lo = jnp.max(lb, axis=0, keepdims=True)
            any_par = jnp.max(par_bad.astype(jnp.float32), 0, keepdims=True)
            feas = (
                pair_ok
                & (any_par < 0.5)
                & (u_hi < 0.5 * big)
                & (u_lo > -0.5 * big)
                & (u_hi >= u_lo)
            )
            v1x, v1y, v1z = qx + u_lo * thx, qy + u_lo * thy, qz + u_lo * thz
            v2x, v2y, v2z = qx + u_hi * thx, qy + u_hi * thy, qz + u_hi * thz
            vmax = jnp.sqrt(
                jnp.maximum(
                    v1x * v1x + v1y * v1y + v1z * v1z,
                    v2x * v2x + v2y * v2y + v2z * v2z,
                )
            )
            r_cell = jnp.max(jnp.where(feas, vmax, 0.0))  # scalar

            # beyond-build planes vs both endpoints of every feasible pair
            s1 = B_e - u_lo * A_e  # (kext, PP)
            s2 = B_e - u_hi * A_e
            tole = epsf * (s_col[k:] + vmax * rl_col[k:])
            cut = feas & jnp.any((s1 < -tole) | (s2 < -tole), 0, keepdims=True)
            extra_cut = jnp.max(cut.astype(jnp.float32)) > 0.5

            # face space: one one-hot matmul scatters pair -> (face, slot)
            q7_ref[0:1, :] = v1x
            q7_ref[1:2, :] = v1y
            q7_ref[2:3, :] = v1z
            q7_ref[3:4, :] = v2x
            q7_ref[4:5, :] = v2y
            q7_ref[5:6, :] = v2z
            q7_ref[6:7, :] = feas.astype(jnp.float32)
            q7_ref[7:8, :] = jnp.zeros((1, pp), jnp.float32)
            G = jnp.dot(q7_ref[:], pt_ref[:], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
            g1x, g1y, g1z = G[0:1], G[1:2], G[2:3]
            g2x, g2y, g2z = G[3:4], G[4:5], G[5:6]
            tvx, tvy, tvz = g2x - g1x, g2y - g1y, g2z - g1z
            tlen = jnp.sqrt(tvx * tvx + tvy * tvy + tvz * tvz)
            len_scale = jnp.sqrt(2.0 * s_scale)
            htol = 20.0 * epsf * len_scale  # (1, 1)
            eok = (G[6:7] > 0.5) & (tlen > htol)

            c12x = g1y * g2z - g1z * g2y  # V1 x V2
            c12y = g1z * g2x - g1x * g2z
            c12z = g1x * g2y - g1y * g2x
            rfx, rfy, rfz = rows[0:1, :k], rows[1:2, :k], rows[2:3, :k]
            rlf = rows[4:5, :k]
            qfx, qfy, qfz = 0.5 * rfx, 0.5 * rfy, 0.5 * rfz

            def face_sums(eokf):
                """Per-face accumulation from a (possibly deduped) edge
                mask: (vec_area comps, gap comps, nedges, raw_area)."""
                w = jnp.where(eokf, sgn_ref[:], 0.0)  # (1, F)
                s8_ref[0:1, :] = w * c12x
                s8_ref[1:2, :] = w * c12y
                s8_ref[2:3, :] = w * c12z
                s8_ref[3:4, :] = w * tvx
                s8_ref[4:5, :] = w * tvy
                s8_ref[5:6, :] = w * tvz
                s8_ref[6:7, :] = eokf.astype(jnp.float32)
                s8_ref[7:8, :] = jnp.zeros((1, f), jnp.float32)
                S = jnp.dot(
                    s8_ref[:], summ_ref[:], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
                )  # (8, K)
                gx, gy, gz = S[3:4], S[4:5], S[5:6]
                vax = 0.5 * (S[0:1] - (qfy * gz - qfz * gy))
                vay = 0.5 * (S[1:2] - (qfz * gx - qfx * gz))
                vaz = 0.5 * (S[2:3] - (qfx * gy - qfy * gx))
                raw_area = (vax * rfx + vay * rfy + vaz * rfz) / rlf
                return vax, vay, vaz, gx, gy, gz, S[6:7], raw_area

            sums0 = face_sums(eok)
            # Dedup is needed iff duplicate edges can exist: every duplicate
            # scenario implies a plane tangent to the cell along an edge,
            # whose own "face" is a degenerate >= 2-edge segment of ~zero
            # area (the boundary-mirror construction is flagged wholesale by
            # the host). Skipping is certificate-safe only together with
            # this detector: UNIFORM duplication (degenerate lattices)
            # scales volume while keeping closure and face gaps at zero.
            tangency = jnp.any((sums0[6] >= 1.5) & (sums0[7] <= tol))

            def dedup(_):
                # duplicate = an EARLIER edge of the same face with the
                # same endpoints (either order), exactly as the XLA tail
                taken = jnp.zeros((1, f), jnp.bool_)
                # lane shift as rotate+mask: Mosaic rejects the concat form
                # (tpu.concatenate of a (1,1) zero column with a (1,f-1)
                # slice carrying a lane offset — "result/input offset
                # mismatch on non-concat dimension", seen on-chip r4)
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, f), 1)

                def shift(x, d):
                    return jnp.where(lane >= d, pltpu.roll(x, d, 1), 0.0)

                for d in range(1, k - 1):
                    o1x, o1y, o1z = shift(g1x, d), shift(g1y, d), shift(g1z, d)
                    o2x, o2y, o2z = shift(g2x, d), shift(g2y, d), shift(g2z, d)
                    oeok = shift(eok.astype(jnp.float32), d) > 0.5
                    cl = lambda ax, ay, az, bx, by, bz: (
                        jnp.maximum(
                            jnp.abs(ax - bx),
                            jnp.maximum(jnp.abs(ay - by), jnp.abs(az - bz)),
                        )
                        <= htol
                    )
                    dup = (
                        cl(g1x, g1y, g1z, o1x, o1y, o1z)
                        & cl(g2x, g2y, g2z, o2x, o2y, o2z)
                    ) | (
                        cl(g1x, g1y, g1z, o2x, o2y, o2z)
                        & cl(g2x, g2y, g2z, o1x, o1y, o1z)
                    )
                    taken = taken | (dup & oeok & (e_in_face >= d))
                return face_sums(eok & ~taken)

            if dedup_mode == "never":
                # DIAGNOSTIC ONLY (not certificate-safe at boundaries):
                # isolates compiler failures to the dedup stage
                vax, vay, vaz, gx, gy, gz, nedges, raw_area = sums0
            elif dedup_mode == "always":
                # no data-dependent control flow: Mosaic-safe variant the
                # dispatcher retries with if the auto kernel fails to lower
                vax, vay, vaz, gx, gy, gz, nedges, raw_area = dedup(None)
            else:
                vax, vay, vaz, gx, gy, gz, nedges, raw_area = jax.lax.cond(
                    (dedup_flag > 0.5) | tangency,
                    dedup,
                    lambda _: sums0,
                    operand=None,
                )
            face_gap = jnp.sqrt(gx * gx + gy * gy + gz * gz)
            face_real = (nedges >= 2.5) & (raw_area > tol)
            face_area = jnp.where(face_real, raw_area, 0.0)
            area = jnp.sum(face_area)  # scalar
            vol = jnp.sum(face_area * rlf) / 6.0
            cvx = jnp.sum(jnp.where(face_real, vax, 0.0))
            cvy = jnp.sum(jnp.where(face_real, vay, 0.0))
            cvz = jnp.sum(jnp.where(face_real, vaz, 0.0))
            closure = jnp.sqrt(cvx * cvx + cvy * cvy + cvz * cvz)
            closure_tol = jnp.maximum(20.0 * epsf, jnp.float32(1e-6))
            closed = closure <= closure_tol * jnp.maximum(area, 1e-6)
            any_neg = jnp.any(
                (nedges >= 2.5)
                & (raw_area < -jnp.sqrt(tol) * jnp.maximum(area, 1.0))
            )
            face_open = jnp.any(face_real & (face_gap > 8.0 * htol))
            ok_shape = (
                closed & ~any_neg & (vol > 0) & ~extra_cut & ~face_open
            )

            fa_ref[0, a] = face_area
            fn_ref[0, a] = jnp.where(face_real, nedges, 0.0)
            out = jnp.concatenate(
                [
                    jnp.full((1, 1), vol, jnp.float32),
                    jnp.full((1, 1), area, jnp.float32),
                    jnp.full((1, 1), r_cell, jnp.float32),
                    jnp.where(ok_shape, 1.0, 0.0).reshape(1, 1),
                    jnp.where(extra_cut, 1.0, 0.0).reshape(1, 1),
                    jnp.where(any_neg, 1.0, 0.0).reshape(1, 1),
                    jnp.full((1, 1), closure, jnp.float32),
                    jnp.zeros((1, 1), jnp.float32),
                ],
                axis=1,
            )
            scal_ref[0, a] = out
            return 0

        jax.lax.fori_loop(0, ba, one_atom, 0)

    return kernel


def fits_voronoi_cells(k: int, ks: int) -> bool:
    """Static tables + working set must fit scoped VMEM. k=32/ks=64 needs
    ~4 MB, k=40/ks=96 ~9 MB; k=48 (PT alone 10.6 MB) does not fit."""
    if ks < k or ks > 128:
        return False
    pp, f, *_ = _kernel_tables(k, ks)
    tables = (2 * ks * pp + pp * f + f + f * k) * 4
    work = (4 * ks * pp + 30 * pp + 12 * f) * 4
    return tables + work <= 12_000_000


@partial(jax.jit, static_argnames=("k", "eps", "ba", "interpret", "dedup_mode"))
def _cells_pallas(cols, rows, k, eps, ba=8, interpret=False,
                  dedup_mode="auto"):
    ks = cols.shape[1]
    pp, f, ohi, ohj, pt, sgn, summ = _kernel_tables(k, ks)
    num = cols.shape[0]
    n_blk = num // ba
    grid_blk = lambda i: (i, 0, 0)
    out_blk = lambda i: (i, 0, 0, 0)
    full2 = lambda i: (0, 0)
    scal, fa, fn = pl.pallas_call(
        _make_kernel(k, ks, pp, f, ba, eps, dedup_mode),
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((ba, ks, 8), grid_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((ba, 8, ks), grid_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec(ohi.shape, full2, memory_space=pltpu.VMEM),
            pl.BlockSpec(ohj.shape, full2, memory_space=pltpu.VMEM),
            pl.BlockSpec(pt.shape, full2, memory_space=pltpu.VMEM),
            pl.BlockSpec(sgn.shape, full2, memory_space=pltpu.VMEM),
            pl.BlockSpec(summ.shape, full2, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, ba, 1, 8), out_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ba, 1, k), out_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ba, 1, k), out_blk, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_blk, ba, 1, 8), jnp.float32),
            jax.ShapeDtypeStruct((n_blk, ba, 1, k), jnp.float32),
            jax.ShapeDtypeStruct((n_blk, ba, 1, k), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, pp), jnp.float32),
            pltpu.VMEM((8, f), jnp.float32),
        ],
        interpret=interpret,
    )(
        cols, rows, jnp.asarray(ohi), jnp.asarray(ohj),
        jnp.asarray(pt), jnp.asarray(sgn), jnp.asarray(summ),
    )
    return scal.reshape(num, 8), fa.reshape(num, k), fn.reshape(num, k)


def voronoi_cells_pallas(
    rel_all, valid, is_boundary, k: int, eps: float, interpret: bool = False,
    dedup_mode: str = "auto",
):
    """Fused cell moments for a batch of atoms. Contract-identical to
    vmapping `voronoi_device._cell_moments_clip` over atoms, except that
    endpoint dedup runs only where `is_boundary` (duplicate edges elsewhere
    are certificate-vetoed, never mis-certified).

    rel_all: (num, K_search, 3) relative candidate positions (nearest
    first, PARKED where invalid — caller applies the park directions);
    valid: (num, K_search) slot validity (parking already applied; used
    only for the per-atom s_scale median); is_boundary: (num,) dedup flag.
    Returns a dict matching `_cell_moments` keys (jnp arrays, per atom).
    """
    num, ks, _ = rel_all.shape
    rel_all = rel_all.astype(jnp.float32)
    s_all = 0.5 * jnp.sum(rel_all * rel_all, axis=-1)
    r_len = jnp.sqrt(2.0 * s_all)
    s_med = jnp.nanmedian(jnp.where(valid, s_all, jnp.nan), axis=1)
    s_scale = jnp.where(jnp.isfinite(s_med), s_med, 1.0).astype(jnp.float32)
    flags = is_boundary.astype(jnp.float32)
    cols = jnp.zeros((num, ks, 8), jnp.float32)
    cols = cols.at[:, :, 0:3].set(rel_all)
    cols = cols.at[:, :, 3].set(s_all)
    cols = cols.at[:, :, 4].set(r_len)
    pad = (-num) % 8
    if pad:
        cols = jnp.concatenate([cols, jnp.zeros((pad, ks, 8), jnp.float32)])
        s_scale = jnp.concatenate([s_scale, jnp.ones(pad, jnp.float32)])
        flags = jnp.concatenate([flags, jnp.zeros(pad, jnp.float32)])
    # per-atom scalars ride in the spare channels of slot 0 (see kernel):
    # rank-1 SMEM per-atom blocks do not lower on Mosaic
    cols = cols.at[:, 0, 5].set(s_scale)
    cols = cols.at[:, 0, 6].set(flags)
    rows = jnp.swapaxes(cols, 1, 2)
    scal, fa, fn = _cells_pallas(
        cols, rows, k, float(eps), interpret=interpret,
        dedup_mode=dedup_mode,
    )
    scal, fa, fn = scal[:num], fa[:num], fn[:num]
    return {
        "vol": scal[:, 0],
        "area": scal[:, 1],
        "face_area": fa,
        "face_nverts": fn.astype(jnp.int32),
        "r_cell": scal[:, 2],
        "ok_shape": scal[:, 3] > 0.5,
        "closure_err": scal[:, 6],
        "extra_cut": scal[:, 4] > 0.5,
        "neg_face": scal[:, 5] > 0.5,
    }
