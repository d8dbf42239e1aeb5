"""Sorted-segment streaming rasterizer: drop-free tile blending at
sort + O(contributing candidates) cost.

The TPU-native equivalent of the uncapped CUDA tile pipeline the reference
consumes (/root/reference/main.py:148-156; upstream diff-gaussian-
rasterization radix-sorts a (tileID|depth) pair list and walks each tile's
contiguous range in-register with per-pixel early stop).  The windowed
selection paths (renderer._select_candidates_dupsort_v2 + two-tier) pay
``nblocks x K_max`` index gathers, so their drop-free cost scales with the
CAP, not the real candidate total (BASELINE.md "Splat throughput: honest
accounting" — 10.6 vs 79 Mpix/s).  This module removes the gathers entirely:

1. EMISSION (all fine-level, area-tiered corner budgets): every valid
   gaussian emits one ``(tile | quantized-depth)`` key per fine tile its
   screen rect overlaps.  Rect areas <= 4 tiles (the overwhelming majority;
   measured dup mean 2.17 at the bench scene) use 4 inline corner slots per
   gaussian; larger rects draw 16 / 64 / nf corner slots from small static
   gaussian budgets (``RasterConfig.stream_g2/g3/g4``).  Budget overflow is
   counted into n_dropped and handled by the same measured-resize + re-run
   policy as the cap machinery — but unlike the per-tile K caps, the
   budgets depend only on how many LARGE splats exist, not on density, so
   the default render is drop-free at any concentration.
2. ONE (1+9)-operand ``lax.sort`` (key + 9 geometry planes; ~7 ms
   measured at 983k pairs on v5e) — every tile's candidate list becomes a
   CONTIGUOUS depth-ordered segment ``[bounds[t], bounds[t+1])`` of one
   (9, L) array (radius is not sorted: emission is exact so no in-rect
   test is needed).  No index gathers anywhere.
3. A chunk-major Pallas grid walks the stream: step s processes one
   (9, U*C) stream block for one display block, driven by scalar-prefetch
   step tables (the sim/pallas_mpm.py output-index-map pattern).  Blend
   state (rgb, T, done, last-contributor) lives in the output block, which
   stays VMEM-resident across the consecutive steps of a display block;
   chunks outside the block's [lo, hi) slot range or after full-block
   saturation are skipped.
4. The backward kernel reverse-walks the same tables, recovering
   transmittance by division (the pallas_blend reverse-walk math) and
   emitting d(sorted planes) directly — the F-build chain rule runs
   in-kernel.  The sort and the emission constructions transpose through
   JAX autodiff (a sort's VJP is its permutation scatter), so
   ``jax.grad`` flows end-to-end to means/covs/colors/opacity.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsmpm_tpu.render.pallas_blend import _MM, _pixel_monomials, _tree_prod
from gsmpm_tpu.render.renderer import (
    Preprocessed,
    _raw_planes_nosentinel,
    _tile_interval,
    assemble_blocks,
    block_origins,
)

_SENT = jnp.int32(2 ** 31 - 1)
_CHUNK = 128  # lane-aligned slot chunk walked per unrolled kernel step


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# emission: (tile | depth) keys at the fine level only
# ---------------------------------------------------------------------------


class StreamLevels(NamedTuple):
    fx0: jnp.ndarray
    fy0: jnp.ndarray
    sx: jnp.ndarray  # tile-span width (>= 1)
    area: jnp.ndarray  # sx*sy, 0 for invalid
    valid: jnp.ndarray
    dq: jnp.ndarray  # quantized depth (top bits of the f32, order-preserving)
    nbx: int
    nby: int
    nf: int
    M: int  # 2^depth_bits


def _stream_levels(pre: Preprocessed, camera, cfg) -> StreamLevels:
    B = cfg.block
    _, nbx, nby = block_origins(camera, cfg)
    nf = nbx * nby
    fx0, fx1, offx = _tile_interval(pre.pix_x, pre.radius, B, nbx)
    fy0, fy1, offy = _tile_interval(pre.pix_y, pre.radius, B, nby)
    valid = pre.valid & ~(offx | offy)
    sx = jnp.maximum(fx1 - fx0 + 1, 1)
    sy = jnp.maximum(fy1 - fy0 + 1, 1)
    area = jnp.where(valid, sx * sy, 0)
    db = 31 - int(nf).bit_length()  # nf * 2^db <= 2^31
    dq = jax.lax.shift_right_logical(
        jax.lax.bitcast_convert_type(
            jnp.maximum(pre.depth, cfg.z_near), jnp.int32
        ),
        31 - db,
    )
    return StreamLevels(fx0, fy0, sx, area, valid, dq, nbx, nby, nf, 1 << db)


# per-gaussian corner budgets of the emission tiers; tier 1 (area <= 4) is
# inline.  tier 4's budget is the full tile count (a whole-screen splat).
_T2_CB = 16
_T3_CB = 64


def _tier_gmap(mask: jnp.ndarray, G: int):
    """Compact the masked gaussians into G budget slots.

    Returns (gmap (G,) gaussian index per slot, used (G,) validity,
    n_over count of masked gaussians beyond the budget)."""
    n = mask.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    total = jnp.sum(mask.astype(jnp.int32))
    gmap = jnp.zeros((G + 1,), jnp.int32).at[
        jnp.where(mask & (rank < G), rank, G)
    ].set(idx, mode="drop")[:G]
    used = jnp.arange(G, dtype=jnp.int32) < jnp.minimum(total, G)
    return gmap, used, jnp.maximum(total - G, 0)


def _emit_tier(lv: StreamLevels, mask: jnp.ndarray, G: int, CB: int):
    """Emission keys for one budgeted tier.

    Returns (keys (G*CB,), gmap (G,), dropped-candidate count).  Slot
    ``g*CB + j`` covers rect corner (j // sx, j % sx) of gaussian gmap[g]
    — exact coverage, every emitted tile intersects the rect.  Dropped =
    total candidate area of masked gaussians minus the area emitted (the
    gaussians beyond the G budget)."""
    gmap, used, _ = _tier_gmap(mask, G)
    gfx0 = lv.fx0[gmap][:, None]
    gfy0 = lv.fy0[gmap][:, None]
    gsx = lv.sx[gmap][:, None]
    garea = lv.area[gmap][:, None]
    gdq = lv.dq[gmap][:, None]
    j = jnp.arange(CB, dtype=jnp.int32)[None, :]
    dy = j // gsx
    dx = j % gsx
    tile = (gfy0 + dy) * lv.nbx + (gfx0 + dx)
    ok = used[:, None] & (j < garea)
    keys = jnp.where(ok, tile * lv.M + gdq, _SENT).reshape(-1)
    dropped = jnp.sum(jnp.where(mask, lv.area, 0)) - jnp.sum(
        ok.astype(jnp.int32)
    )
    return keys, gmap, dropped


def stream_emission(pre: Preprocessed, camera, cfg, planes: jnp.ndarray):
    """(keys (L,), emis_planes (9, L), n_dropped, levels).

    L = 4N + G2*16 + G3*64 + G4*nf.  Key order: tier-1 corner-major
    [c0(N) c1(N) c2(N) c3(N)] then the budget tiers; emis_planes columns
    match (tier 1 = four tiled copies of the planes, tiers = per-budget-slot
    gathered planes repeated CB-fold) so autodiff transposes the
    duplication into the correct per-gaussian gradient sums.

    Only 9 plane rows enter the sort: the radius row exists solely for the
    windowed paths' in-rect mask, and stream emission is EXACT (an emitted
    (tile, gaussian) pair satisfies the _tile_interval inequality by
    construction, which is the same inequality _build_F tests), so the
    mask is the [lo, hi) slot-range test alone."""
    lv = _stream_levels(pre, camera, cfg)
    n = pre.pix_x.shape[0]
    t1 = lv.valid & (lv.area <= 4)
    t2 = lv.valid & (lv.area > 4) & (lv.area <= _T2_CB)
    t3 = lv.valid & (lv.area > _T2_CB) & (lv.area <= _T3_CB)
    t4 = lv.valid & (lv.area > _T3_CB)

    keys1 = []
    j4 = jnp.arange(4, dtype=jnp.int32)
    for j in range(4):
        dy = j // lv.sx
        dx = j % lv.sx
        tile = (lv.fy0 + dy) * lv.nbx + (lv.fx0 + dx)
        ok = t1 & (j < lv.area)
        keys1.append(jnp.where(ok, tile * lv.M + lv.dq, _SENT))
    del j4
    keys1 = jnp.concatenate(keys1)
    planes1 = jnp.tile(planes, (1, 4))

    G2, G3 = cfg.stream_g2, cfg.stream_g3
    G4 = min(cfg.stream_g4, max(1, n))
    keys2, gmap2, d2 = _emit_tier(lv, t2, G2, _T2_CB)
    keys3, gmap3, d3 = _emit_tier(lv, t3, G3, _T3_CB)
    keys4, gmap4, d4 = _emit_tier(lv, t4, G4, lv.nf)
    planes2 = jnp.repeat(planes[:, gmap2], _T2_CB, axis=1)
    planes3 = jnp.repeat(planes[:, gmap3], _T3_CB, axis=1)
    planes4 = jnp.repeat(planes[:, gmap4], lv.nf, axis=1)

    keys = jnp.concatenate([keys1, keys2, keys3, keys4])
    emis = jnp.concatenate([planes1, planes2, planes3, planes4], axis=1)
    return keys, emis, d2 + d3 + d4, lv


def required_stream_caps(
    means3d, cov6, opacity, camera, cfg,
) -> dict:
    """Measured tier populations of this geometry: the stream_g2/g3/g4
    budgets at which render_stream reports n_dropped == 0 (the analogue of
    renderer.required_raster_caps for the windowed paths).  Selection is
    geometry-only; no SH/color evaluation runs."""
    from gsmpm_tpu.render.renderer import preprocess

    zeros3 = jnp.zeros((means3d.shape[0], 3), jnp.float32)
    pre = preprocess(
        means3d, cov6, opacity, None, camera, 0, cfg, colors_precomp=zeros3
    )
    lv = _stream_levels(pre, camera, cfg)
    t2 = lv.valid & (lv.area > 4) & (lv.area <= _T2_CB)
    t3 = lv.valid & (lv.area > _T2_CB) & (lv.area <= _T3_CB)
    t4 = lv.valid & (lv.area > _T3_CB)
    return {
        "stream_g2": int(jnp.sum(t2)),
        "stream_g3": int(jnp.sum(t3)),
        "stream_g4": int(jnp.sum(t4)),
    }


# ---------------------------------------------------------------------------
# step tables: map the chunk-major grid onto (display block, stream block)
# ---------------------------------------------------------------------------


def _build_tables(bounds: jnp.ndarray, L_pad: int, UC: int, nf: int,
                  nstep: int):
    """Per-step scalar-prefetch tables for the streaming kernels.

    bounds (nf+1,): segment boundaries in the sorted stream.  Display block
    b owns slots [bounds[b], bounds[b+1]) and walks the stream blocks
    (UC-slot windows) its segment touches; a window straddling a segment
    boundary is visited once per display block with [lo, hi) slot masking.
    Steps of one display block are consecutive, so its output block stays
    VMEM-resident; steps beyond the real total carry live=0.
    """
    i32 = jnp.int32
    seg_s = bounds[:-1]
    seg_e = bounds[1:]
    nonempty = seg_e > seg_s
    first_sb = seg_s // UC
    last_sb = jnp.where(nonempty, (seg_e - 1) // UC, first_sb)
    nst = jnp.where(nonempty, last_sb - first_sb + 1, 0).astype(i32)
    off = jnp.concatenate(
        [jnp.zeros((1,), i32), jnp.cumsum(nst).astype(i32)]
    )  # (nf+1,)
    nreal = off[-1]

    # largest b with off[b] <= s, via one marker scatter + cumsum (no
    # per-needle searchsorted row addressing)
    mark = jnp.zeros((nstep + 1,), i32).at[
        jnp.minimum(off[:-1], nstep)
    ].add(1, mode="drop")[:nstep]
    s_ids = jnp.arange(nstep, dtype=i32)
    blk = jnp.clip(jnp.cumsum(mark) - 1, 0, nf - 1)
    sb = jnp.clip(
        first_sb[blk] + (s_ids - off[blk]), 0, max(L_pad // UC - 1, 0)
    )
    live = (s_ids < nreal).astype(i32)
    first = ((s_ids == off[blk]) & (live == 1)).astype(i32)
    last = ((s_ids == off[blk] + nst[blk] - 1) & (live == 1)).astype(i32)
    lo = seg_s[blk].astype(i32)
    hi = seg_e[blk].astype(i32)
    return dict(blk=blk.astype(i32), sb=sb.astype(i32), first=first,
                last=last, live=live, lo=lo, hi=hi)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _build_F_chunk(p, x0, y0, ids, lo, hi, B):
    """(9, C) raw plane rows + block origin -> (16, C) F rows.

    Same math as pallas_blend._build_F minus the in-rect radius test:
    stream emission is exact (every emitted (tile, gaussian) pair passes
    the identical _tile_interval inequality by construction), so only
    slots outside [lo, hi) (a straddled stream window's other-segment
    slots) get log_opa = -inf and blend to exactly zero."""
    gx = p[0:1, :] - x0
    gy = p[1:2, :] - y0
    a = p[2:3, :]
    b = p[3:4, :]
    c = p[4:5, :]
    in_rect = (ids >= lo) & (ids < hi)
    logo = jnp.where(in_rect, p[5:6, :], -1e30)
    zeros = jnp.zeros_like(gx)
    return jnp.concatenate(
        [
            -0.5 * a,
            a * gx + b * gy,
            -0.5 * (a * gx * gx + c * gy * gy) - b * gx * gy,
            -0.5 * c,
            c * gy + b * gx,
            -b,
            logo,
            zeros,
            p[6:7, :],
            p[7:8, :],
            p[8:9, :],
            zeros, zeros, zeros, zeros, zeros,
        ],
        axis=0,
    ), in_rect


def _stream_fwd_kernel(blk_r, sb_r, first_r, live_r, lo_r, hi_r,
                       pl_ref, out_ref, *, C, U, B, P, t_min, alpha_min,
                       nbx):
    s = pl.program_id(0)
    b = blk_r[s]
    x0 = ((b % nbx) * B).astype(jnp.float32)
    y0 = ((b // nbx) * B).astype(jnp.float32)
    base = sb_r[s] * (U * C)
    lo = lo_r[s]
    hi = hi_r[s]

    H = _pixel_monomials(B, P)
    mm = _MM
    dn0 = (((0,), (0,)), ((), ()))
    dn1 = (((1,), (0,)), ((), ()))

    @pl.when(first_r[s] == 1)
    def _():
        out_ref[0] = jnp.concatenate(
            [jnp.zeros((3, P), jnp.float32),
             jnp.ones((1, P), jnp.float32),
             jnp.zeros((4, P), jnp.float32)], axis=0
        )

    for j in range(U):
        cbase = base + j * C
        T = out_ref[0, 3:4, :]
        done = out_ref[0, 4:5, :] > 0
        chunk_live = (
            (live_r[s] == 1) & (cbase < hi) & (cbase + C > lo)
            & jnp.any(jnp.logical_not(done) & (T >= t_min))
        )

        @pl.when(chunk_live)
        def _(j=j, cbase=cbase, T=T, done=done):
            p = pl_ref[:, j * C:(j + 1) * C]  # (9, C)
            ids = (jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
                   + cbase)
            F, _ = _build_F_chunk(p, x0, y0, ids, lo, hi, B)
            power = mm(F, H, dimension_numbers=dn0)  # (C, P)
            lgo = F[6:7, :].reshape(C, 1)
            alpha = jnp.minimum(0.99, jnp.exp(power))
            alpha = jnp.where(
                (power <= lgo) & (alpha >= alpha_min), alpha, 0.0
            )

            one_minus = 1.0 - alpha
            cp = one_minus
            st = 1
            while st < C:  # inclusive cumprod (Hillis-Steele)
                cp = cp * jnp.concatenate(
                    [jnp.ones((st, P), jnp.float32), cp[: C - st]], axis=0
                )
                st *= 2
            excl = jnp.concatenate(
                [jnp.ones((1, P), jnp.float32), cp[:-1]], axis=0
            )
            T_before = T * excl
            T_after = T_before * one_minus
            contrib = jnp.logical_not(done) & (T_after >= t_min)
            w = jnp.where(contrib, T_before * alpha, 0.0)

            out_ref[0, 0:3, :] += mm(F[8:11, :], w, dimension_numbers=dn1)

            alpha_eff = jnp.where(contrib, alpha, 0.0)
            out_ref[0, 3:4, :] = T * _tree_prod(1.0 - alpha_eff)
            new_done = done | jnp.any(T_after < t_min, axis=0, keepdims=True)
            out_ref[0, 4:5, :] = new_done.astype(jnp.float32)
            # last contributing GLOBAL slot + 1 (backward's reverse gate)
            gidx1 = (jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
                     + cbase + 1).astype(jnp.float32)
            hit = jnp.where(contrib & (alpha > 0.0), gidx1, 0.0)
            out_ref[0, 5:6, :] = jnp.maximum(
                out_ref[0, 5:6, :], jnp.max(hit, axis=0, keepdims=True)
            )


def _stream_bwd_kernel(blk_r, sb_r, first_r, live_r, lo_r, hi_r, sbf_r,
                       pl_ref, fwd_ref, g_ref, dpl_ref, acc_ref, *,
                       C, U, B, P, t_min, alpha_min, nbx):
    """Reverse walk over the REVERSED step tables (step k = forward step
    nstep-1-k).  acc rows: 0 T_end (transmittance after current chunk),
    1 R_end (suffix sum of w*(c.g_rgb) + T_N g_T).  d(sorted planes) is
    written per stream block; straddled windows are visited consecutively
    and accumulate (init on the first visit of each window)."""
    k = pl.program_id(0)
    b = blk_r[k]
    x0 = ((b % nbx) * B).astype(jnp.float32)
    y0 = ((b // nbx) * B).astype(jnp.float32)
    base = sb_r[k] * (U * C)
    lo = lo_r[k]
    hi = hi_r[k]

    H = _pixel_monomials(B, P)
    mm = _MM
    dn0 = (((0,), (0,)), ((), ()))
    dnP = (((1,), (1,)), ((), ()))

    g_rgb = g_ref[0, 0:3, :]
    g_T = g_ref[0, 3:4, :]
    T_fin = fwd_ref[0, 3:4, :]
    last = fwd_ref[0, 5:6, :]
    max_last = jnp.max(last)  # no contribution at slots >= max_last

    @pl.when(first_r[k] == 1)  # reverse-first step of this display block
    def _():
        acc_ref[0:1, :] = T_fin
        acc_ref[1:2, :] = T_fin * g_T

    @pl.when(sbf_r[k] == 1)  # first visit of this stream window in reverse
    def _():
        dpl_ref[:] = jnp.zeros(dpl_ref.shape, jnp.float32)

    for j in reversed(range(U)):
        cbase = base + j * C
        chunk_live = (
            (live_r[k] == 1) & (cbase < hi) & (cbase + C > lo)
            & (jnp.float32(cbase) < max_last)
        )

        @pl.when(chunk_live)
        def _(j=j, cbase=cbase):
            T_end = acc_ref[0:1, :]
            R_end = acc_ref[1:2, :]
            p = pl_ref[:, j * C:(j + 1) * C]
            ids = (jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
                   + cbase)
            F, in_rect = _build_F_chunk(p, x0, y0, ids, lo, hi, B)
            power = mm(F, H, dimension_numbers=dn0)
            lgo = F[6:7, :].reshape(C, 1)
            expp = jnp.exp(power)
            alpha = jnp.minimum(0.99, expp)
            gate0 = (power <= lgo) & (alpha >= alpha_min)
            gidx1 = (jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
                     + cbase + 1).astype(jnp.float32)
            contrib = gate0 & (gidx1 <= last)
            a_eff = jnp.where(contrib, alpha, 0.0)
            one_minus = 1.0 - a_eff

            prodc = _tree_prod(one_minus)
            T_start = T_end / prodc
            cp = one_minus
            st = 1
            while st < C:
                cp = cp * jnp.concatenate(
                    [jnp.ones((st, P), jnp.float32), cp[: C - st]], axis=0
                )
                st *= 2
            excl = jnp.concatenate(
                [jnp.ones((1, P), jnp.float32), cp[:-1]], axis=0
            )
            T_before = T_start * excl
            w = T_before * a_eff

            cdot = mm(F[8:11, :], g_rgb, dimension_numbers=dn0)
            v = w * cdot
            suf = v
            st = 1
            while st < C:
                suf = suf + jnp.concatenate(
                    [suf[st:], jnp.zeros((st, P), jnp.float32)], axis=0
                )
                st *= 2
            S = R_end + (suf - v)

            dA = T_before * cdot - S / one_minus
            dP_ = jnp.where(contrib & (expp < 0.99), dA * alpha, 0.0)

            dFq = mm(H, dP_, dimension_numbers=dnP)  # (16, C)
            dFc = mm(g_rgb, w, dimension_numbers=dnP)  # (3, C)

            # chain dF -> d(raw planes) in-register (the _build_F_chunk
            # transpose; radius/mask rows carry no tangent)
            gx = p[0:1, :] - x0
            gy = p[1:2, :] - y0
            a_ = p[2:3, :]
            b_ = p[3:4, :]
            c_ = p[4:5, :]
            rectf = in_rect.astype(jnp.float32)
            dF0 = dFq[0:1]
            dF1 = dFq[1:2]
            dF2 = dFq[2:3]
            dF3 = dFq[3:4]
            dF4 = dFq[4:5]
            dF5 = dFq[5:6]
            dF6 = dFq[6:7]
            da = -0.5 * dF0 + gx * dF1 - 0.5 * gx * gx * dF2
            db = gy * dF1 - gx * gy * dF2 + gx * dF4 - dF5
            dc = -0.5 * dF3 - 0.5 * gy * gy * dF2 + gy * dF4
            dgx = a_ * dF1 + (-a_ * gx - b_ * gy) * dF2 + b_ * dF4
            dgy = b_ * dF1 + (-c_ * gy - b_ * gx) * dF2 + c_ * dF4
            dlogo = dF6 * rectf
            drgb = dFq[8:11] + dFc
            dp = jnp.concatenate(
                [dgx, dgy, da, db, dc, dlogo, drgb], axis=0
            )  # (9, C)
            dpl_ref[:, j * C:(j + 1) * C] += dp

            acc_ref[0:1, :] = T_start
            acc_ref[1:2, :] = R_end + jnp.sum(v, axis=0, keepdims=True)


# ---------------------------------------------------------------------------
# custom-VJP core around the kernels
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _stream_core(tables, splanes, meta):
    """(step tables, sorted planes (9, L_pad)) -> out (nf, 8, P).

    Out rows: 0..2 rgb, 3 transmittance, 4 done, 5 last contributor.
    Blocks whose segment is empty are never written (mask via counts
    outside).  Differentiable in splanes via the reverse-walk kernel."""
    C, U, B, P, t_min, alpha_min, nstep, nbx, nf = meta
    UC = U * C
    L_pad = splanes.shape[1]

    kernel = functools.partial(
        _stream_fwd_kernel, C=C, U=U, B=B, P=P, t_min=t_min,
        alpha_min=alpha_min, nbx=nbx,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(nstep,),
        in_specs=[
            pl.BlockSpec((9, UC),
                         lambda s, blk, sb, fi, lv, lo, hi: (0, sb[s]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, P), lambda s, blk, sb, fi, lv, lo, hi: (blk[s], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nf, 8, P), jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(tables["blk"], tables["sb"], tables["first"], tables["live"],
      tables["lo"], tables["hi"], splanes)


def _stream_core_fwd(tables, splanes, meta):
    out = _stream_core(tables, splanes, meta)
    return out, (tables, splanes, out)


def _stream_core_bwd(meta, res, g):
    tables, splanes, out = res
    C, U, B, P, t_min, alpha_min, nstep, nbx, nf = meta
    UC = U * C
    L_pad = splanes.shape[1]

    rev = {k: v[::-1] for k, v in tables.items()}
    sbR = rev["sb"]
    sbf = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (sbR[1:] != sbR[:-1]).astype(jnp.int32)]
    )

    kernel = functools.partial(
        _stream_bwd_kernel, C=C, U=U, B=B, P=P, t_min=t_min,
        alpha_min=alpha_min, nbx=nbx,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(nstep,),
        in_specs=[
            pl.BlockSpec(
                (9, UC),
                lambda k, blk, sb, fi, lv, lo, hi, sf: (0, sb[k]),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 8, P),
                lambda k, blk, sb, fi, lv, lo, hi, sf: (blk[k], 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 8, P),
                lambda k, blk, sb, fi, lv, lo, hi, sf: (blk[k], 0, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (9, UC),
            lambda k, blk, sb, fi, lv, lo, hi, sf: (0, sb[k]),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((8, P), jnp.float32)],
    )
    dpl = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((9, L_pad), jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(rev["blk"], sbR, rev["last"], rev["live"], rev["lo"], rev["hi"],
      sbf, splanes, out, g)

    # windows never visited (wholly beyond the last real segment) hold
    # garbage: mask to the walked region [0, bounds[nf]).  hi of any step
    # of the last nonempty block == bounds[nf]; take the max.
    walked_end = jnp.max(tables["hi"] * tables["live"])
    slot = jnp.arange(L_pad, dtype=jnp.int32)
    visited_sb = slot // UC <= jnp.max(
        tables["sb"] * tables["live"]
    )
    dpl = jnp.where((slot < walked_end)[None, :] & visited_sb[None, :],
                    dpl, 0.0)
    d_tables = {
        k: np.zeros(v.shape, dtype=jax.dtypes.float0)
        for k, v in tables.items()
    }
    return d_tables, dpl


_stream_core.defvjp(_stream_core_fwd, _stream_core_bwd)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def render_stream(pre: Preprocessed, camera, bg, cfg):
    """Drop-free streaming render: (image (H, W, 3), n_dropped).

    n_dropped counts candidates of gaussians beyond the tier budgets
    (stream_g2/g3/g4) — zero for any scene whose LARGE-splat population
    fits the budgets, independent of density."""
    planes = _raw_planes_nosentinel(pre)[:9]  # (9, N): radius not needed
    keys, emis, n_dropped, lv = stream_emission(pre, camera, cfg, planes)

    ops = (keys,) + tuple(emis[i] for i in range(9))
    sorted_ops = jax.lax.sort(ops, num_keys=1)
    skeys = sorted_ops[0]
    splanes = jnp.stack(sorted_ops[1:10])  # (9, L)

    nf, M = lv.nf, lv.M
    bounds = jnp.searchsorted(
        skeys, jnp.arange(nf + 1, dtype=jnp.int32) * M
    ).astype(jnp.int32)

    C = cfg.stream_chunk if not _use_interpret() else max(
        32, min(cfg.stream_chunk, cfg.chunk)
    )
    U = cfg.stream_unroll
    UC = U * C
    L = splanes.shape[1]
    L_pad = -(-L // UC) * UC
    if L_pad != L:
        splanes = jnp.pad(splanes, ((0, 0), (0, L_pad - L)))
    nstep = L_pad // UC + nf

    tables = _build_tables(bounds, L_pad, UC, nf, nstep)
    B = cfg.block
    P = B * B
    meta = (C, U, B, P, float(cfg.t_min), float(cfg.alpha_min),
            nstep, lv.nbx, nf)
    out = _stream_core(tables, splanes, meta)

    counts = bounds[1:] - bounds[:-1]
    rgb = out[:, 0:3, :] + out[:, 3:4, :] * bg[None, :, None]
    rgb = jnp.where((counts > 0)[:, None, None], rgb,
                    jnp.broadcast_to(bg[None, :, None], rgb.shape))
    blocks = rgb.reshape(nf, 3, B, B).transpose(0, 2, 3, 1)
    return assemble_blocks(blocks, camera, cfg), n_dropped
