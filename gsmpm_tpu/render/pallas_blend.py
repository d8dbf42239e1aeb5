"""Pallas TPU tile-blend kernel for the 3DGS rasterizer.

Replaces the XLA per-block blend scan (renderer.py:_blend_candidates) on
TPU. The CUDA rasterizer's per-tile loop (alpha = opa*exp(quadratic),
front-to-back T compositing -- upstream diff-gaussian-rasterization
forward.cu, consumed at /root/reference/main.py:148-156) is restructured
around the MXU:

- the quadratic form power(g, p) = -0.5(a dx^2 + c dy^2) - b dx dy is a
  rank-6 bilinear product F(g) . H(p) with F = per-candidate coefficients
  in BLOCK-LOCAL coordinates (keeps term magnitudes O(10^3), no f32
  cancellation) and H = per-pixel monomials [px^2 px 1 py^2 py px*py]; one
  (C,16)@(16,P) matmul evaluates a whole chunk of candidates against all
  P = B*B pixels of the block;
- opacity enters log-space as a second rank-1 matmul (alpha =
  exp(power + log opa)) so padded/invalid candidates (opa=0 -> -inf)
  blend to exactly zero;
- the front-to-back transmittance scan runs as log2(C) shifted multiplies
  on the VPU; per-pixel color accumulation is a third matmul
  (chunk^T @ w) whose rows 8..10 are the rgb sums;
- per-(block,chunk) grid; the output block (rgb, T, done rows) persists in
  VMEM across a block's chunk steps, and @pl.when skips chunks past the
  candidate count or once every pixel is frozen (T < t_min).

Blend math mirrors _blend_candidates exactly (chunk-granular freeze
semantics included) so the Pallas and XLA paths agree to f32 tolerance;
tests/test_pallas_render.py asserts it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# candidate column layout (16 columns, f32)
CGX, CGY, CA, CB, CC, CLOGO, CR, CG, CB_, _NCOLS = 0, 1, 2, 3, 4, 5, 6, 7, 8, 16


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _build_F(cand_raw, x0, y0):
    """(..., 16) raw candidates -> (..., 16) rank-6 F coefficients.

    Raw columns: gx, gy, conic_a, conic_b, conic_c, log_opa, r, g, b.
    F columns (paired with H rows): [px^2, px, 1, py^2, py, px*py] for the
    quadratic, col 6 = log opacity (H row 6 = 1 in the opacity matmul),
    cols 8..10 = color passthrough. x0/y0: block origins; gx/gy go
    block-local here.
    """
    gx = cand_raw[..., CGX] - x0
    gy = cand_raw[..., CGY] - y0
    a = cand_raw[..., CA]
    b = cand_raw[..., CB]
    c = cand_raw[..., CC]
    zeros = jnp.zeros_like(gx)
    cols = [
        -0.5 * a,
        a * gx + b * gy,
        -0.5 * (a * gx * gx + c * gy * gy) - b * gx * gy,
        -0.5 * c,
        c * gy + b * gx,
        -b,
        cand_raw[..., CLOGO],
        zeros,
        cand_raw[..., CR],
        cand_raw[..., CG],
        cand_raw[..., CB_],
        zeros, zeros, zeros, zeros, zeros,
    ]
    return jnp.stack(cols, axis=-1)


def _blend_kernel(counts_ref, cand_ref, out_ref, h_ref, *,
                  C, B, P, t_min, alpha_min, n_chunks):
    b = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        # per-pixel monomials H (16, P): pixel p = py*B + px (block-local)
        pix = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
        px = (pix % B).astype(jnp.float32)
        py = (pix // B).astype(jnp.float32)
        one = jnp.ones_like(px)
        zero = jnp.zeros_like(px)
        h_ref[:, :] = jnp.concatenate(
            [px * px, px, one, py * py, py, px * py]
            + [zero] * 10, axis=0,
        )
        out_ref[0] = jnp.concatenate(
            [jnp.zeros((3, P), jnp.float32),      # rgb
             jnp.ones((1, P), jnp.float32),       # T
             jnp.zeros((4, P), jnp.float32)],     # done + pad
            axis=0,
        )

    T = out_ref[0, 3:4, :]
    done = out_ref[0, 4:5, :] > 0
    live = (k * C < counts_ref[b]) & jnp.any(
        jnp.logical_not(done) & (T >= t_min)
    )

    @pl.when(live)
    def _():
        chunk = cand_ref[0]  # (C, 16)
        mm = functools.partial(
            jax.lax.dot_general,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        dnq = (((1,), (0,)), ((), ()))
        H = h_ref[:, :]
        power_q = mm(chunk, H, dimension_numbers=dnq)  # (C, P)
        # log-opacity broadcast via rank-1 matmul (col 6 x row of ones)
        lgo_sel = jax.lax.broadcasted_iota(jnp.int32, (16, P), 0) == 6
        Ho = jnp.where(lgo_sel, 1.0, 0.0)
        lgo = mm(chunk, Ho, dimension_numbers=dnq)
        alpha = jnp.minimum(0.99, jnp.exp(power_q + lgo))
        alpha = jnp.where((power_q <= 0.0) & (alpha >= alpha_min), alpha, 0.0)

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

        dnw = (((0,), (0,)), ((), ()))
        sums = mm(chunk, w, dimension_numbers=dnw)  # (16, P); rows 8..10 rgb
        out_ref[0, 0:3, :] += sums[8:11]

        alpha_eff = jnp.where(contrib, alpha, 0.0)
        om_eff = 1.0 - alpha_eff
        prod = om_eff[0:1]
        for i in range(1, C):  # C is small and static; plain tree would be
            prod = prod * om_eff[i:i + 1]  # log-depth but this fuses fine
        out_ref[0, 3:4, :] = T * prod
        new_done = done | jnp.any(T_after < t_min, axis=0, keepdims=True)
        out_ref[0, 4:5, :] = new_done.astype(jnp.float32)


def blend_blocks_pallas(cand_raw, counts, origins, bg, cfg):
    """cand_raw (nblocks, K, 16) raw candidate rows (depth-ordered, padded
    with log_opa=-inf), counts (nblocks,), origins (nblocks, 2) -> blended
    blocks (nblocks, B, B, 3) with background composited.
    """
    nblocks, K, _ = cand_raw.shape
    B = cfg.block
    P = B * B
    C = cfg.chunk
    n_chunks = -(-K // C)
    if n_chunks * C != K:
        cand_raw = jnp.pad(
            cand_raw, ((0, 0), (0, n_chunks * C - K), (0, 0)),
            constant_values=0.0,
        )
    F = _build_F(
        cand_raw, origins[:, 0:1].astype(jnp.float32),
        origins[:, 1:2].astype(jnp.float32),
    )

    kernel = functools.partial(
        _blend_kernel, C=C, B=B, P=P, t_min=float(cfg.t_min),
        alpha_min=float(cfg.alpha_min), n_chunks=n_chunks,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks, n_chunks),
        in_specs=[
            pl.BlockSpec((1, C, 16), lambda b, k, cnt: (b, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, P), lambda b, k, cnt: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((16, P), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nblocks, 8, P), jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(counts.astype(jnp.int32), F)

    rgb = out[:, 0:3, :] + out[:, 3:4, :] * bg[None, :, None]
    return rgb.reshape(nblocks, 3, B, B).transpose(0, 2, 3, 1)
