"""Pallas TPU tile-blend kernel for the 3DGS rasterizer.

Replaces the XLA per-block blend scan (renderer.py:_blend_candidates) on
TPU. The CUDA rasterizer's per-tile loop (alpha = opa*exp(quadratic),
front-to-back T compositing -- upstream diff-gaussian-rasterization
forward.cu, consumed at /root/reference/main.py:148-156) is restructured
around the MXU:

- the quadratic form power(g, p) = -0.5(a dx^2 + c dy^2) - b dx dy is a
  bilinear product F(g) . H(p) with F = per-candidate coefficients in
  BLOCK-LOCAL coordinates (keeps term magnitudes O(10^3), no f32
  cancellation) and H = per-pixel monomials [px^2 px 1 py^2 py px*py 1];
  H row 6 is the constant 1 paired with F row 6 = log opacity, so ONE
  fused (16,C)^T x (16,P) contraction yields quad + log_opa directly and
  alpha = exp of it — padded/invalid candidates (log_opa = -inf) blend to
  exactly zero;
- the front-to-back transmittance scan runs as log2(C) shifted multiplies
  on the VPU; per-pixel color accumulation is a second matmul of the
  3-row color slice, F[8:11] @ w;
- grid = (nblocks,) with candidates in a lane-major (16, K) block; a
  lax.while_loop inside the kernel walks chunks of C candidates and stops
  at ceil(count/C) chunks or as soon as every pixel is frozen
  (T < t_min), so per-block cost tracks the real candidate count instead
  of the K cap.  (The first version ran a (nblocks, K/C) grid; at 169x16
  steps the per-step grid/DMA overhead dominated the actual blend work.)

Blend math mirrors _blend_candidates exactly (the evolution of (rgb, T,
done) is chunk-size invariant because T_after decreases monotonically
within a chunk -- see tests) so the Pallas and XLA paths agree to f32
tolerance; tests/test_pallas_render.py asserts it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# candidate column layout (16 columns, f32)
(CGX, CGY, CA, CB, CC, CLOGO, CR, CG, CB_, CRAD,
 _NCOLS) = 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 16


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _build_F(cand_raw, x0, y0, B):
    """(10, nblocks, K) raw candidate planes -> (nblocks, 16, K) F rows.

    Raw plane rows: gx, gy, conic_a, conic_b, conic_c, log_opa, r, g, b,
    radius (renderer._raw_planes layout).  F rows (paired with H rows):
    [px^2, px, 1, py^2, py, px*py] for the quadratic, row 6 = log opacity
    (H row 6 = 1, folding opacity into the quadratic matmul), rows 8..10 =
    color passthrough. x0/y0: block origins; gx/gy go block-local here.
    Lane-major (16, K) so the kernel's chunk walk is a lane slice.

    The block-rect test (same inequality as renderer._select_candidates)
    runs here against row 9's radius: candidates whose screen rect misses
    this block get log_opa = -inf and blend to exactly zero.  This is what
    lets the dup-sort selection hand superset candidate lists (coarse-tile
    and global streams) to the kernel without changing the image.
    """
    gx = cand_raw[CGX] - x0
    gy = cand_raw[CGY] - y0
    a = cand_raw[CA]
    b = cand_raw[CB]
    c = cand_raw[CC]
    r = cand_raw[CRAD]
    in_rect = (
        (gx + r >= -0.5) & (gx - r <= B - 0.5)
        & (gy + r >= -0.5) & (gy - r <= B - 0.5)
    )
    logo = jnp.where(in_rect, cand_raw[CLOGO], -1e30)
    zeros = jnp.zeros_like(gx)
    rows = [
        -0.5 * a,
        a * gx + b * gy,
        -0.5 * (a * gx * gx + c * gy * gy) - b * gx * gy,
        -0.5 * c,
        c * gy + b * gx,
        -b,
        logo,
        zeros,
        cand_raw[CR],
        cand_raw[CG],
        cand_raw[CB_],
        zeros, zeros, zeros, zeros, zeros,
    ]
    return jnp.stack(rows, axis=-2)


def _tree_prod(x):
    """prod over axis 0 of (C, P) via log-depth pairwise multiplies."""
    n = x.shape[0]
    while n > 1:
        half = n // 2
        x = x[:half] * x[half:half * 2] if n % 2 == 0 else jnp.concatenate(
            [x[:half] * x[half:half * 2], x[half * 2:]], axis=0
        )
        n = x.shape[0]
    return x


def _pixel_monomials(B, P):
    """H (16, P): [px^2, px, 1, py^2, py, px*py, 1, 0...] block-local.

    Row 6 is 1 so the single matmul F.H yields quad + log_opa directly
    (F rows 8..10 are colors; their H rows stay 0).
    """
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (pix % B).astype(jnp.float32)
    py = (pix // B).astype(jnp.float32)
    one = jnp.ones_like(px)
    zero = jnp.zeros_like(px)
    return jnp.concatenate(
        [px * px, px, one, py * py, py, px * py, one] + [zero] * 9, axis=0
    )


# HIGHEST: Mosaic supports only DEFAULT/HIGHEST dot precisions (HIGH =
# bf16x3 raises NotImplementedError in the kernel lowering); DEFAULT
# (single bf16 pass) loses ~3 decimal digits on the power term, beyond the
# f32 tolerance the XLA-parity tests assert.
_MM = functools.partial(
    jax.lax.dot_general,
    preferred_element_type=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
)


def _blend_kernel(counts_ref, cand_ref, out_ref, *,
                  C, B, P, t_min, alpha_min, n_chunks):
    b = pl.program_id(0)
    count = counts_ref[b]
    n_live = jnp.minimum((count + C - 1) // C, n_chunks)

    H = _pixel_monomials(B, P)
    mm = _MM
    dn0 = (((0,), (0,)), ((), ()))  # contract row dim (16)

    # blend state lives in the output VMEM block across loop steps:
    # rows 0..2 rgb, row 3 T, row 4 done (as f32), row 5 last contributing
    # candidate index + 1 (consumed by the backward kernel); only the chunk
    # counter is loop-carried (Mosaic rejects large vector carries in
    # while_loop)
    out_ref[0] = jnp.concatenate(
        [jnp.zeros((3, P), jnp.float32),
         jnp.ones((1, P), jnp.float32),
         jnp.zeros((4, P), jnp.float32)], axis=0
    )

    def cond(c):
        T = out_ref[0, 3:4, :]
        done = out_ref[0, 4:5, :] > 0
        return (c < n_live) & jnp.any(jnp.logical_not(done) & (T >= t_min))

    def body(c):
        T = out_ref[0, 3:4, :]
        done = out_ref[0, 4:5, :] > 0
        F = cand_ref[0, :, pl.ds(c * C, C)]  # (16, C)
        power = mm(F, H, dimension_numbers=dn0)  # (C, P) = quad + log_opa
        lgo = F[6:7, :].reshape(C, 1)  # per-candidate log opacity
        alpha = jnp.minimum(0.99, jnp.exp(power))
        # CUDA-parity gate: discard positive quadratic power (quad =
        # power - log_opa) and sub-threshold alphas
        alpha = jnp.where(
            (power <= lgo) & (alpha >= alpha_min), alpha, 0.0
        )

        one_minus = 1.0 - alpha  # (C, P)
        cp = one_minus
        s = 1
        while s < C:  # inclusive cumprod over the chunk (Hillis-Steele)
            cp = cp * jnp.concatenate(
                [jnp.ones((s, P), jnp.float32), cp[: C - s]], axis=0
            )
            s *= 2
        excl = jnp.concatenate(
            [jnp.ones((1, P), jnp.float32), cp[:-1]], axis=0
        )
        T_before = T * excl
        T_after = T_before * one_minus
        contrib = jnp.logical_not(done) & (T_after >= t_min)
        w = jnp.where(contrib, T_before * alpha, 0.0)

        dn1 = (((1,), (0,)), ((), ()))  # contract candidate dim (C)
        sums = mm(F[8:11, :], w, dimension_numbers=dn1)  # (3, P) rgb
        out_ref[0, 0:3, :] += sums

        alpha_eff = jnp.where(contrib, alpha, 0.0)
        out_ref[0, 3:4, :] = T * _tree_prod(1.0 - alpha_eff)
        new_done = done | jnp.any(T_after < t_min, axis=0, keepdims=True)
        out_ref[0, 4:5, :] = new_done.astype(jnp.float32)
        # last contributing candidate index + 1 per pixel (for the
        # backward kernel's reverse walk)
        gidx1 = (jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
                 + c * C + 1).astype(jnp.float32)
        hit = jnp.where(contrib & (alpha > 0.0), gidx1, 0.0)
        out_ref[0, 5:6, :] = jnp.maximum(
            out_ref[0, 5:6, :], jnp.max(hit, axis=0, keepdims=True)
        )
        return c + 1

    jax.lax.while_loop(cond, body, jnp.int32(0))


def _blend_bwd_kernel(counts_ref, cand_ref, fwd_ref, g_ref, dF_ref, acc_ref,
                      *, C, B, P, t_min, alpha_min, n_chunks):
    """Reverse-walk backward of the front-to-back blend.

    The capability of the upstream rasterizer's backward.cu (driven from
    /root/reference/extra.py:220), restructured for the MXU like the
    forward: per chunk, alpha is recomputed from one F.H contraction, the
    transmittance before the chunk is recovered by division (bounded:
    alpha <= 0.99 and contributions keep T_after >= t_min, so the chunk
    product is >= t_min), and the two gradient contractions
    dF_quad = H @ dP^T and dF_rgb = g_rgb @ w^T are matmuls.

    Walks chunks back-to-front maintaining per pixel (in acc scratch):
      row 0: T_end   — transmittance after the current chunk
      row 1: R_end   — suffix sum  sum_{j>chunk} w_j (c_j . g_rgb) + T_N g_T
    For candidate i:  dL/da_i = T_before_i (c_i . g_rgb) - S_i / (1 - a_i)
    with S_i the within-chunk suffix of w (c . g_rgb) plus R_end.
    """
    b = pl.program_id(0)
    count = counts_ref[b]
    n_live = jnp.minimum((count + C - 1) // C, n_chunks)

    H = _pixel_monomials(B, P)
    mm = _MM
    dn0 = (((0,), (0,)), ((), ()))  # contract dim0 (16) or (3)
    dnP = (((1,), (1,)), ((), ()))  # contract the pixel dim

    g_rgb = g_ref[0, 0:3, :]  # (3, P) image cotangent
    g_T = g_ref[0, 3:4, :]  # (1, P) transmittance cotangent
    T_fin = fwd_ref[0, 3:4, :]
    last = fwd_ref[0, 5:6, :]  # contributing idx+1, 0 = none

    dF_ref[0] = jnp.zeros((16, n_chunks * C), jnp.float32)
    acc_ref[0:1, :] = T_fin
    acc_ref[1:2, :] = T_fin * g_T

    def body(k, _):
        c = n_live - 1 - k
        T_end = acc_ref[0:1, :]
        R_end = acc_ref[1:2, :]
        F = cand_ref[0, :, pl.ds(c * C, C)]  # (16, C)
        power = mm(F, H, dimension_numbers=dn0)  # (C, P)
        lgo = F[6:7, :].reshape(C, 1)
        expp = jnp.exp(power)
        alpha = jnp.minimum(0.99, expp)
        gate0 = (power <= lgo) & (alpha >= alpha_min)
        gidx1 = (jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
                 + c * C + 1).astype(jnp.float32)
        contrib = gate0 & (gidx1 <= last)  # (C, P)
        a_eff = jnp.where(contrib, alpha, 0.0)
        one_minus = 1.0 - a_eff

        prodc = _tree_prod(one_minus)  # (1, P) >= t_min (see docstring)
        T_start = T_end / prodc
        cp = one_minus
        s = 1
        while s < C:  # inclusive cumprod (Hillis-Steele)
            cp = cp * jnp.concatenate(
                [jnp.ones((s, P), jnp.float32), cp[: C - s]], axis=0
            )
            s *= 2
        excl = jnp.concatenate(
            [jnp.ones((1, P), jnp.float32), cp[:-1]], axis=0
        )
        T_before = T_start * excl  # (C, P)
        w = T_before * a_eff

        cdot = mm(F[8:11, :], g_rgb, dimension_numbers=dn0)  # (C, P)
        v = w * cdot
        suf = v
        s = 1
        while s < C:  # inclusive suffix sum
            suf = suf + jnp.concatenate(
                [suf[s:], jnp.zeros((s, P), jnp.float32)], axis=0
            )
            s *= 2
        S = R_end + (suf - v)  # (C, P) strict suffix + cross-chunk tail

        dA = T_before * cdot - S / one_minus
        dP_ = jnp.where(contrib & (expp < 0.99), dA * alpha, 0.0)

        dFq = mm(H, dP_, dimension_numbers=dnP)  # (16, C)
        dFc = mm(g_rgb, w, dimension_numbers=dnP)  # (3, C)
        dF_ref[0, :, pl.ds(c * C, C)] = jnp.concatenate(
            [dFq[0:8], dFq[8:11] + dFc, dFq[11:]], axis=0
        )

        acc_ref[0:1, :] = T_start
        acc_ref[1:2, :] = R_end + jnp.sum(v, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, n_live, body, 0)


def _blend_kernel_streamed(counts_ref, cand_ref, out_ref, *,
                           C, B, P, t_min, alpha_min, n_chunks):
    """Chunk-STREAMED twin of _blend_kernel for unbounded candidate counts.

    Grid (nblocks, n_chunks): each step's BlockSpec fetches ONE (16, C)
    candidate chunk into VMEM, so per-block VMEM is constant in K — the
    resident-row kernel OOMs VMEM past K ~ 64k, but a drop-free render of a
    dense fitting scene legitimately needs K ~ 10^5 per block (the CUDA
    tile loop it replaces iterates unbounded shared-memory batches,
    upstream forward.cu).  Blend state lives in the out block (index map
    constant over the chunk axis keeps it VMEM-resident across steps);
    finished chunks skip compute via pl.when but their fetch still streams
    — acceptable: this variant is selected only when K is large
    (blend_blocks_pallas), where the small-K kernel cannot run at all.
    """
    b = pl.program_id(0)
    c = pl.program_id(1)
    count = counts_ref[b]
    n_live = jnp.minimum((count + C - 1) // C, n_chunks)

    H = _pixel_monomials(B, P)
    mm = _MM
    dn0 = (((0,), (0,)), ((), ()))

    @pl.when(c == 0)
    def _():
        out_ref[0] = jnp.concatenate(
            [jnp.zeros((3, P), jnp.float32),
             jnp.ones((1, P), jnp.float32),
             jnp.zeros((4, P), jnp.float32)], axis=0
        )

    T = out_ref[0, 3:4, :]
    done = out_ref[0, 4:5, :] > 0
    active = (c < n_live) & jnp.any(jnp.logical_not(done) & (T >= t_min))

    @pl.when(active)
    def _():
        F = cand_ref[0]  # (16, C) — this step's chunk
        power = mm(F, H, dimension_numbers=dn0)  # (C, P)
        lgo = F[6:7, :].reshape(C, 1)
        alpha = jnp.minimum(0.99, jnp.exp(power))
        alpha = jnp.where(
            (power <= lgo) & (alpha >= alpha_min), alpha, 0.0
        )

        one_minus = 1.0 - alpha
        cp = one_minus
        s = 1
        while s < C:
            cp = cp * jnp.concatenate(
                [jnp.ones((s, P), jnp.float32), cp[: C - s]], axis=0
            )
            s *= 2
        excl = jnp.concatenate(
            [jnp.ones((1, P), jnp.float32), cp[:-1]], axis=0
        )
        T_before = T * excl
        T_after = T_before * one_minus
        contrib = jnp.logical_not(done) & (T_after >= t_min)
        w = jnp.where(contrib, T_before * alpha, 0.0)

        dn1 = (((1,), (0,)), ((), ()))
        sums = mm(F[8:11, :], w, dimension_numbers=dn1)
        out_ref[0, 0:3, :] += sums

        alpha_eff = jnp.where(contrib, alpha, 0.0)
        out_ref[0, 3:4, :] = T * _tree_prod(1.0 - alpha_eff)
        new_done = done | jnp.any(T_after < t_min, axis=0, keepdims=True)
        out_ref[0, 4:5, :] = new_done.astype(jnp.float32)
        gidx1 = (jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
                 + c * C + 1).astype(jnp.float32)
        hit = jnp.where(contrib & (alpha > 0.0), gidx1, 0.0)
        out_ref[0, 5:6, :] = jnp.maximum(
            out_ref[0, 5:6, :], jnp.max(hit, axis=0, keepdims=True)
        )


def _blend_bwd_kernel_streamed(counts_ref, cand_ref, fwd_ref, g_ref, dF_ref,
                               acc_ref, *, C, B, P, t_min, alpha_min,
                               n_chunks):
    """Streamed reverse-walk backward (see _blend_kernel_streamed).

    Grid (nblocks, n_chunks) with the chunk axis's index maps REVERSED
    (step k touches chunk n_chunks-1-k for both the candidate fetch and
    the dF write), so the walk runs back-to-front like the resident-row
    kernel's fori_loop.  The (T_end, R_end) state persists in VMEM scratch
    across the sequential TPU grid; it re-initializes at k == 0 of every
    block.
    """
    b = pl.program_id(0)
    k = pl.program_id(1)
    cc = n_chunks - 1 - k
    count = counts_ref[b]
    n_live = jnp.minimum((count + C - 1) // C, n_chunks)

    H = _pixel_monomials(B, P)
    mm = _MM
    dn0 = (((0,), (0,)), ((), ()))
    dnP = (((1,), (1,)), ((), ()))

    g_rgb = g_ref[0, 0:3, :]
    g_T = g_ref[0, 3:4, :]
    T_fin = fwd_ref[0, 3:4, :]
    last = fwd_ref[0, 5:6, :]

    @pl.when(k == 0)
    def _():
        acc_ref[0:1, :] = T_fin
        acc_ref[1:2, :] = T_fin * g_T

    dF_ref[0] = jnp.zeros((16, C), jnp.float32)

    @pl.when(cc < n_live)
    def _():
        T_end = acc_ref[0:1, :]
        R_end = acc_ref[1:2, :]
        F = cand_ref[0]  # (16, C)
        power = mm(F, H, dimension_numbers=dn0)
        lgo = F[6:7, :].reshape(C, 1)
        expp = jnp.exp(power)
        alpha = jnp.minimum(0.99, expp)
        gate0 = (power <= lgo) & (alpha >= alpha_min)
        gidx1 = (jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
                 + cc * C + 1).astype(jnp.float32)
        contrib = gate0 & (gidx1 <= last)
        a_eff = jnp.where(contrib, alpha, 0.0)
        one_minus = 1.0 - a_eff

        prodc = _tree_prod(one_minus)
        T_start = T_end / prodc
        cp = one_minus
        s = 1
        while s < C:
            cp = cp * jnp.concatenate(
                [jnp.ones((s, P), jnp.float32), cp[: C - s]], axis=0
            )
            s *= 2
        excl = jnp.concatenate(
            [jnp.ones((1, P), jnp.float32), cp[:-1]], axis=0
        )
        T_before = T_start * excl
        w = T_before * a_eff

        cdot = mm(F[8:11, :], g_rgb, dimension_numbers=dn0)
        v = w * cdot
        suf = v
        s = 1
        while s < C:
            suf = suf + jnp.concatenate(
                [suf[s:], jnp.zeros((s, P), jnp.float32)], axis=0
            )
            s *= 2
        S = R_end + (suf - v)

        dA = T_before * cdot - S / one_minus
        dP_ = jnp.where(contrib & (expp < 0.99), dA * alpha, 0.0)

        dFq = mm(H, dP_, dimension_numbers=dnP)
        dFc = mm(g_rgb, w, dimension_numbers=dnP)
        dF_ref[0] = jnp.concatenate(
            [dFq[0:8], dFq[8:11] + dFc, dFq[11:]], axis=0
        )

        acc_ref[0:1, :] = T_start
        acc_ref[1:2, :] = R_end + jnp.sum(v, axis=0, keepdims=True)


# per-block candidate capacity above which the resident-row kernels would
# blow VMEM (K * 64 B approaches the ~16 MB budget with the backward's
# in+out rows): switch to the streamed kernels.  The chunk size stays at
# the resident kernels' C — the (C, P) blend intermediates cost C*P*4 B of
# VMEM each, so a bigger chunk trades grid-step overhead for the same OOM
# the streaming is there to avoid (measured: C=1024 at P=4096 wants 44 MB).
_STREAM_K = 16384


def _blend_meta(K, cfg):
    """(C, n_chunks, K_padded) for a given candidate capacity."""
    C = cfg.chunk
    if not _use_interpret():
        # Mosaic requires the chunk walk's lane offsets to be provably
        # multiples of 128; blend state evolution is chunk-size invariant
        # (see module docstring) so rounding up is semantics-preserving.
        C = -(-C // 128) * 128
    n_chunks = -(-K // C)
    return C, n_chunks, n_chunks * C


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _blend_core(counts, F, meta):
    """(counts, F (nblocks, 16, KC)) -> out (nblocks, 8, P).

    Out rows: 0..2 accumulated rgb, 3 transmittance, 4 done flag, 5 last
    contributor (forward bookkeeping).  Differentiable in F via the
    reverse-walk Pallas kernel (_blend_bwd_kernel).
    """
    C, B, P, t_min, alpha_min, n_chunks = meta
    nblocks = F.shape[0]
    if n_chunks * C > _STREAM_K:
        # large-K: stream one (16, C) chunk per grid step (constant VMEM)
        kernel = functools.partial(
            _blend_kernel_streamed, C=C, B=B, P=P, t_min=t_min,
            alpha_min=alpha_min, n_chunks=n_chunks,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks, n_chunks),
            in_specs=[
                pl.BlockSpec((1, 16, C), lambda b, c, cnt: (b, 0, c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, P), lambda b, c, cnt: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
    else:
        kernel = functools.partial(
            _blend_kernel, C=C, B=B, P=P, t_min=t_min,
            alpha_min=alpha_min, n_chunks=n_chunks,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((1, 16, n_chunks * C), lambda b, cnt: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, P), lambda b, cnt: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nblocks, 8, P), jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(counts.astype(jnp.int32), F)


def _blend_core_fwd(counts, F, meta):
    out = _blend_core(counts, F, meta)
    return out, (counts, F, out)


def _blend_core_bwd(meta, res, g):
    counts, F, out = res
    C, B, P, t_min, alpha_min, n_chunks = meta
    nblocks = F.shape[0]
    if n_chunks * C > _STREAM_K:
        kernel = functools.partial(
            _blend_bwd_kernel_streamed, C=C, B=B, P=P, t_min=t_min,
            alpha_min=alpha_min, n_chunks=n_chunks,
        )
        rev = n_chunks - 1
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks, n_chunks),
            in_specs=[
                pl.BlockSpec((1, 16, C), lambda b, c, cnt: (b, 0, rev - c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, P), lambda b, c, cnt: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, P), lambda b, c, cnt: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 16, C), lambda b, c, cnt: (b, 0, rev - c),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((8, P), jnp.float32)],
        )
    else:
        kernel = functools.partial(
            _blend_bwd_kernel, C=C, B=B, P=P, t_min=t_min,
            alpha_min=alpha_min, n_chunks=n_chunks,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((1, 16, n_chunks * C), lambda b, cnt: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, P), lambda b, cnt: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, P), lambda b, cnt: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 16, n_chunks * C), lambda b, cnt: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((8, P), jnp.float32)],
        )
    dF = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nblocks, 16, n_chunks * C),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(counts.astype(jnp.int32), F, out, g)
    d_counts = np.zeros(counts.shape, dtype=jax.dtypes.float0)
    return d_counts, dF


_blend_core.defvjp(_blend_core_fwd, _blend_core_bwd)


def blend_blocks_pallas(cand_raw, counts, origins, bg, cfg):
    """cand_raw (10, nblocks, K) raw candidate planes (depth-ordered, padded
    with log_opa=-inf), counts (nblocks,), origins (nblocks, 2) -> blended
    blocks (nblocks, B, B, 3) with background composited.

    Differentiable end-to-end: the Pallas forward pairs with the Pallas
    reverse-walk backward (_blend_bwd_kernel) via custom VJP, and the F
    build + background compositing are plain jnp.
    """
    _, nblocks, K = cand_raw.shape
    B = cfg.block
    P = B * B
    C, n_chunks, K_pad = _blend_meta(K, cfg)
    if K_pad != K:
        # pad columns must carry log_opa = -inf: the last count-bounded
        # chunk can straddle K, and a zero log_opa would blend as an
        # opaque splat at the block origin
        cand_raw = jnp.pad(
            cand_raw, ((0, 0), (0, 0), (0, K_pad - K)),
            constant_values=0.0,
        )
        cand_raw = cand_raw.at[CLOGO, :, K:].set(-1e30)
    F = _build_F(
        cand_raw, origins[:, 0:1].astype(jnp.float32),
        origins[:, 1:2].astype(jnp.float32), B,
    )

    meta = (C, B, P, float(cfg.t_min), float(cfg.alpha_min), n_chunks)
    out = _blend_core(counts, F, meta)

    rgb = out[:, 0:3, :] + out[:, 3:4, :] * bg[None, :, None]
    return rgb.reshape(nblocks, 3, B, B).transpose(0, 2, 3, 1)


# ---------------------------------------------------------------------------
# packed-stream variant
# ---------------------------------------------------------------------------
#
# The padded layout above provisions (nblocks, 16, K) candidate slots even
# though the MEAN per-block candidate count is ~K/7 on real scenes
# (scripts/profile_render.py: mean 107 vs K 768 at 245k/800^2) — the
# candidate gather and the kernel's HBM->VMEM traffic pay for the padding.
# Here candidates are stored COMPACTLY: block b owns the slice
# [offs[b], offs[b] + ceil(count_b / C) * C) of one (16, T_cap) array
# (offsets 128-aligned by construction), and the kernels walk their slice
# with explicit async DMA from HBM at dynamic offsets — total traffic
# tracks the real candidate total, not nblocks*K.


def _build_F_packed(cand_raw, x0, y0, B):
    """(10, T) packed planes + per-slot block origins (T,) -> (16, T) F."""
    gx = cand_raw[CGX] - x0
    gy = cand_raw[CGY] - y0
    a = cand_raw[CA]
    b = cand_raw[CB]
    c = cand_raw[CC]
    r = cand_raw[CRAD]
    in_rect = (
        (gx + r >= -0.5) & (gx - r <= B - 0.5)
        & (gy + r >= -0.5) & (gy - r <= B - 0.5)
    )
    logo = jnp.where(in_rect, cand_raw[CLOGO], -1e30)
    zeros = jnp.zeros_like(gx)
    rows = [
        -0.5 * a,
        a * gx + b * gy,
        -0.5 * (a * gx * gx + c * gy * gy) - b * gx * gy,
        -0.5 * c,
        c * gy + b * gx,
        -b,
        logo,
        zeros,
        cand_raw[CR],
        cand_raw[CG],
        cand_raw[CB_],
        zeros, zeros, zeros, zeros, zeros,
    ]
    return jnp.stack(rows, axis=0)


def _blend_kernel_packed(counts_ref, offs_ref, F_ref, out_ref, *,
                         C, B, P, t_min, alpha_min, n_chunks):
    b = pl.program_id(0)
    count = counts_ref[b]
    off_c = offs_ref[b]  # CHUNK units: (off_c + c) * C is provably aligned
    n_live = jnp.minimum((count + C - 1) // C, n_chunks)

    H = _pixel_monomials(B, P)
    mm = _MM
    dn0 = (((0,), (0,)), ((), ()))

    out_ref[0] = jnp.concatenate(
        [jnp.zeros((3, P), jnp.float32),
         jnp.ones((1, P), jnp.float32),
         jnp.zeros((4, P), jnp.float32)], axis=0
    )

    def cond(c):
        T = out_ref[0, 3:4, :]
        done = out_ref[0, 4:5, :] > 0
        return (c < n_live) & jnp.any(jnp.logical_not(done) & (T >= t_min))

    def body(c):
        T = out_ref[0, 3:4, :]
        done = out_ref[0, 4:5, :] > 0
        # full packed F stays VMEM-resident across the grid (constant
        # index_map); (off_c + c) * C is provably 128-aligned
        F = F_ref[:, pl.ds((off_c + c) * C, C)]  # (16, C)
        power = mm(F, H, dimension_numbers=dn0)
        lgo = F[6:7, :].reshape(C, 1)
        alpha = jnp.minimum(0.99, jnp.exp(power))
        alpha = jnp.where((power <= lgo) & (alpha >= alpha_min), alpha, 0.0)

        one_minus = 1.0 - alpha
        cp = one_minus
        s = 1
        while s < C:
            cp = cp * jnp.concatenate(
                [jnp.ones((s, P), jnp.float32), cp[: C - s]], axis=0
            )
            s *= 2
        excl = jnp.concatenate(
            [jnp.ones((1, P), jnp.float32), cp[:-1]], axis=0
        )
        T_before = T * excl
        T_after = T_before * one_minus
        contrib = jnp.logical_not(done) & (T_after >= t_min)
        w = jnp.where(contrib, T_before * alpha, 0.0)

        dn1 = (((1,), (0,)), ((), ()))
        out_ref[0, 0:3, :] += mm(F[8:11, :], w, dimension_numbers=dn1)

        alpha_eff = jnp.where(contrib, alpha, 0.0)
        out_ref[0, 3:4, :] = T * _tree_prod(1.0 - alpha_eff)
        new_done = done | jnp.any(T_after < t_min, axis=0, keepdims=True)
        out_ref[0, 4:5, :] = new_done.astype(jnp.float32)
        gidx1 = (jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
                 + c * C + 1).astype(jnp.float32)
        hit = jnp.where(contrib & (alpha > 0.0), gidx1, 0.0)
        out_ref[0, 5:6, :] = jnp.maximum(
            out_ref[0, 5:6, :], jnp.max(hit, axis=0, keepdims=True)
        )
        return c + 1

    jax.lax.while_loop(cond, body, jnp.int32(0))


def _blend_bwd_kernel_packed(counts_ref, offs_ref, F_ref, fwd_ref, g_ref,
                             dF_ref, acc_ref, *,
                             C, B, P, t_min, alpha_min, n_chunks):
    b = pl.program_id(0)
    count = counts_ref[b]
    off_c = offs_ref[b]  # CHUNK units
    n_live = jnp.minimum((count + C - 1) // C, n_chunks)

    H = _pixel_monomials(B, P)
    mm = _MM
    dn0 = (((0,), (0,)), ((), ()))
    dnP = (((1,), (1,)), ((), ()))

    g_rgb = g_ref[0, 0:3, :]
    g_T = g_ref[0, 3:4, :]
    T_fin = fwd_ref[0, 3:4, :]
    last = fwd_ref[0, 5:6, :]

    acc_ref[0:1, :] = T_fin
    acc_ref[1:2, :] = T_fin * g_T

    def body(k, _):
        c = n_live - 1 - k
        T_end = acc_ref[0:1, :]
        R_end = acc_ref[1:2, :]
        F = F_ref[:, pl.ds((off_c + c) * C, C)]
        power = mm(F, H, dimension_numbers=dn0)
        lgo = F[6:7, :].reshape(C, 1)
        expp = jnp.exp(power)
        alpha = jnp.minimum(0.99, expp)
        gate0 = (power <= lgo) & (alpha >= alpha_min)
        gidx1 = (jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
                 + c * C + 1).astype(jnp.float32)
        contrib = gate0 & (gidx1 <= last)
        a_eff = jnp.where(contrib, alpha, 0.0)
        one_minus = 1.0 - a_eff

        prodc = _tree_prod(one_minus)
        T_start = T_end / prodc
        cp = one_minus
        s = 1
        while s < C:
            cp = cp * jnp.concatenate(
                [jnp.ones((s, P), jnp.float32), cp[: C - s]], axis=0
            )
            s *= 2
        excl = jnp.concatenate(
            [jnp.ones((1, P), jnp.float32), cp[:-1]], axis=0
        )
        T_before = T_start * excl
        w = T_before * a_eff

        cdot = mm(F[8:11, :], g_rgb, dimension_numbers=dn0)
        v = w * cdot
        suf = v
        s = 1
        while s < C:
            suf = suf + jnp.concatenate(
                [suf[s:], jnp.zeros((s, P), jnp.float32)], axis=0
            )
            s *= 2
        S = R_end + (suf - v)

        dA = T_before * cdot - S / one_minus
        dP_ = jnp.where(contrib & (expp < 0.99), dA * alpha, 0.0)

        dFq = mm(H, dP_, dimension_numbers=dnP)
        dFc = mm(g_rgb, w, dimension_numbers=dnP)
        dF_ref[:, pl.ds((off_c + c) * C, C)] = jnp.concatenate(
            [dFq[0:8], dFq[8:11] + dFc, dFq[11:]], axis=0
        )

        acc_ref[0:1, :] = T_start
        acc_ref[1:2, :] = R_end + jnp.sum(v, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, n_live, body, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _blend_core_packed(counts, offs, F, meta):
    """(counts (nb,), offs (nb,), F (16, T)) -> out (nb, 8, P).

    offs are 128-aligned slot offsets into the packed stream; slots in
    [offs[b] + count_b, offs[b] + aligned(count_b)) must carry
    log_opa = -inf (the caller masks them).
    """
    C, B, P, t_min, alpha_min, n_chunks = meta
    nblocks = counts.shape[0]
    kernel = functools.partial(
        _blend_kernel_packed, C=C, B=B, P=P, t_min=t_min,
        alpha_min=alpha_min, n_chunks=n_chunks,
    )
    T = F.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((16, T), lambda b, cnt, off: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, P), lambda b, cnt, off: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nblocks, 8, P), jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(counts.astype(jnp.int32), (offs // C).astype(jnp.int32), F)


def _blend_core_packed_fwd(counts, offs, F, meta):
    out = _blend_core_packed(counts, offs, F, meta)
    return out, (counts, offs, F, out)


def _blend_core_packed_bwd(meta, res, g):
    counts, offs, F, out = res
    C, B, P, t_min, alpha_min, n_chunks = meta
    nblocks = counts.shape[0]
    T = F.shape[1]
    kernel = functools.partial(
        _blend_bwd_kernel_packed, C=C, B=B, P=P, t_min=t_min,
        alpha_min=alpha_min, n_chunks=n_chunks,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((16, T), lambda b, cnt, off: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, P), lambda b, cnt, off: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, P), lambda b, cnt, off: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, T), lambda b, cnt, off: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, P), jnp.float32),
        ],
    )
    dF = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, T), jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(counts.astype(jnp.int32), (offs // C).astype(jnp.int32), F, out, g)
    # slots no block ever walked (beyond the last aligned segment, or in
    # blocks dropped for capacity) are never DMA'd: mask them to zero
    aligned = ((counts.astype(jnp.int32) + C - 1) // C) * C
    slot = jnp.arange(T, dtype=jnp.int32)
    b = jnp.clip(
        jnp.searchsorted(offs.astype(jnp.int32), slot, side="right") - 1,
        0, nblocks - 1,
    )
    walked = (slot >= offs[b]) & (slot < offs[b] + aligned[b])
    dF = jnp.where(walked[None, :], dF, 0.0)
    d_counts = np.zeros(counts.shape, dtype=jax.dtypes.float0)
    d_offs = np.zeros(offs.shape, dtype=jax.dtypes.float0)
    return d_counts, d_offs, dF


_blend_core_packed.defvjp(_blend_core_packed_fwd, _blend_core_packed_bwd)


def blend_packed_pallas(cand_packed, slot_x0, slot_y0, counts, offs, bg, cfg):
    """Packed-stream blend: cand_packed (10, T) raw planes in per-block
    depth order (invalid slots carry log_opa = -inf via the caller's mask),
    slot_x0/slot_y0 (T,) per-slot block origins, counts/offs (nb,) with
    offs 128-aligned -> (nb, B, B, 3) blended blocks."""
    B = cfg.block
    P = B * B
    C, n_chunks, _ = _blend_meta(
        cfg.k_tile + cfg.k_coarse + cfg.k_global, cfg
    )
    F = _build_F_packed(cand_packed, slot_x0, slot_y0, B)
    meta = (C, B, P, float(cfg.t_min), float(cfg.alpha_min), n_chunks)
    out = _blend_core_packed(counts, offs, F, meta)
    rgb = out[:, 0:3, :] + out[:, 3:4, :] * bg[None, :, None]
    nb = counts.shape[0]
    return rgb.reshape(nb, 3, B, B).transpose(0, 2, 3, 1)
