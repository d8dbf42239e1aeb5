"""Differentiable tile-based 3D Gaussian splatting renderer.

Parity target: the CUDA diff-gaussian-rasterization extension the reference
consumes (GaussianRasterizationSettings/GaussianRasterizer,
/root/reference/main.py:118-156, /root/reference/extra.py:271-304), including
the cov3D_precomp path the MPM pipeline depends on.

TPU-native design (not a port of the CUDA tile binner):
1. preprocess — batched EWA projection over all gaussians (view transform,
   perspective Jacobian, 2D covariance + 0.3 low-pass, SH->RGB) as pure
   (N,3,3)-matmul math;
2. one global depth argsort (replaces the per-tile (tileID|depth) radix sort);
3. per pixel-block top_k selection: for each BxB pixel block, take the first
   k_block depth-ordered gaussians whose screen rect intersects the block —
   a static-shape replacement for the CUDA dynamic tile lists;
4. front-to-back alpha blending as a scan over gaussian chunks with exact
   emulation of the CUDA early-stop (T < 1e-4 freeze) via cumulative products.

Everything is jnp -> the whole renderer is differentiable with jax.grad;
jax.checkpoint on the chunk body keeps backward memory at O(P * chunk).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gsmpm_tpu.render.camera import Camera
from gsmpm_tpu.render.sh import eval_sh
from gsmpm_tpu.sim.coupling import mat_from_upper


class RasterConfig(NamedTuple):
    block: int = 64  # pixel block edge for binning/blending
    k_block: int = 1024  # max gaussians blended per block
    chunk: int = 64  # gaussians per blend-scan step
    block_batch: int = 16  # blocks processed concurrently
    t_min: float = 1e-4  # transmittance early-stop (parity with CUDA)
    alpha_min: float = 1.0 / 255.0
    z_near: float = 0.2  # frustum near cull (parity with CUDA preprocess)
    remat: bool = True


class Preprocessed(NamedTuple):
    pix: jnp.ndarray  # (N,2) screen-space means
    conic: jnp.ndarray  # (N,3) inverse 2D covariance (a, b, c)
    depth: jnp.ndarray  # (N,)
    radius: jnp.ndarray  # (N,)
    color: jnp.ndarray  # (N,3)
    opacity: jnp.ndarray  # (N,)
    valid: jnp.ndarray  # (N,) bool


def preprocess(
    means3d: jnp.ndarray,
    cov6: jnp.ndarray,
    opacity: jnp.ndarray,
    shs: Optional[jnp.ndarray],
    camera: Camera,
    sh_degree: int,
    cfg: RasterConfig,
    colors_precomp: Optional[jnp.ndarray] = None,
) -> Preprocessed:
    """Project gaussians to screen space (EWA splatting)."""
    W_rot = camera.view[:3, :3]
    t = means3d @ W_rot.T + camera.view[:3, 3]  # view-space positions
    depth = t[:, 2]
    in_front = depth > cfg.z_near

    # clip-space projection
    ph = means3d @ camera.full_proj[:3, :3].T + camera.full_proj[:3, 3]
    pw = means3d @ camera.full_proj[3, :3].T + camera.full_proj[3, 3]
    inv_w = 1.0 / (pw + 1e-7)
    ndc = ph * inv_w[:, None]
    pix = jnp.stack(
        [
            ((ndc[:, 0] + 1.0) * camera.width - 1.0) * 0.5,
            ((ndc[:, 1] + 1.0) * camera.height - 1.0) * 0.5,
        ],
        axis=-1,
    )

    # EWA 2D covariance: clamp the view-space point like the CUDA preprocess
    fx, fy = camera.focal_x, camera.focal_y
    limx, limy = 1.3 * camera.tanfovx, 1.3 * camera.tanfovy
    z = jnp.where(in_front, depth, 1.0)
    tx = jnp.clip(t[:, 0] / z, -limx, limx) * z
    ty = jnp.clip(t[:, 1] / z, -limy, limy) * z
    zero = jnp.zeros_like(z)
    J = jnp.stack(
        [
            jnp.stack([fx / z, zero, -fx * tx / (z * z)], axis=-1),
            jnp.stack([zero, fy / z, -fy * ty / (z * z)], axis=-1),
        ],
        axis=-2,
    )  # (N,2,3)
    Sigma = mat_from_upper(cov6)
    Tm = J @ W_rot[None]  # (N,2,3)
    cov2d = Tm @ Sigma @ jnp.swapaxes(Tm, -1, -2)  # (N,2,2)
    a = cov2d[:, 0, 0] + 0.3
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1] + 0.3

    det = a * c - b * b
    det_ok = det > 0
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))

    if colors_precomp is not None:
        color = colors_precomp
    else:
        dirs = means3d - camera.campos[None, :]
        dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-9)
        color = jnp.maximum(eval_sh(shs, dirs, sh_degree) + 0.5, 0.0)

    valid = in_front & det_ok & (radius > 0)
    return Preprocessed(
        pix=pix,
        conic=conic,
        depth=depth,
        radius=radius,
        color=color,
        opacity=opacity.reshape(-1),
        valid=valid,
    )


def block_origins(camera: Camera, cfg: RasterConfig):
    """Pixel-block origins covering the image, row-major over y.

    Returns (origins (nb,2) [x,y], nbx, nby).  The block grid is the unit of
    pixel-sharding across chips (gsmpm_tpu/parallel): each device takes a
    contiguous slice of this array.
    """
    B = cfg.block
    Wp = -(-camera.width // B) * B
    Hp = -(-camera.height // B) * B
    nbx, nby = Wp // B, Hp // B
    bx = jnp.arange(nbx, dtype=jnp.float32) * B
    by = jnp.arange(nby, dtype=jnp.float32) * B
    origins = jnp.stack([jnp.tile(bx, nby), jnp.repeat(by, nbx)], axis=-1)
    return origins, nbx, nby


def render_blocks(
    pre: Preprocessed,
    order: jnp.ndarray,
    origins: jnp.ndarray,
    bg: jnp.ndarray,
    cfg: RasterConfig,
) -> jnp.ndarray:
    """Blend an arbitrary set of BxB pixel blocks; returns (nb, B, B, 3).

    This is the shardable core: origins may be any subset of block_origins
    (traced values are fine — all shapes are static in B and k_block).
    """
    B = cfg.block
    n = pre.pix.shape[0]
    k = min(cfg.k_block, n)
    # round the chunked scan length
    k_pad = -(-k // cfg.chunk) * cfg.chunk

    # gather into depth order once
    pix = pre.pix[order]
    conic = pre.conic[order]
    color = pre.color[order]
    opac = pre.opacity[order]
    radius = pre.radius[order]
    valid = pre.valid[order]

    rank = jnp.arange(n, dtype=jnp.float32)

    # local pixel coordinates within a block (P,2)
    ii = jnp.arange(B, dtype=jnp.float32)
    local = jnp.stack(
        [jnp.tile(ii, B), jnp.repeat(ii, B)], axis=-1
    )  # x fastest

    def select_block(origin):
        x0, y0 = origin[0], origin[1]
        inter = (
            (pix[:, 0] + radius >= x0 - 0.5)
            & (pix[:, 0] - radius <= x0 + B - 0.5)
            & (pix[:, 1] + radius >= y0 - 0.5)
            & (pix[:, 1] - radius <= y0 + B - 0.5)
            & valid
        )
        prio = jnp.where(inter, -rank, -jnp.inf)
        vals, idx = jax.lax.top_k(prio, k)
        ok = vals > -jnp.inf
        if k_pad > k:
            idx = jnp.pad(idx, (0, k_pad - k))
            ok = jnp.pad(ok, (0, k_pad - k))
        return idx, ok

    def blend_block(origin, idx, ok):
        px = origin[None, :] + local  # (P,2)
        g_pix = pix[idx]
        g_conic = conic[idx]
        g_color = color[idx]
        g_alpha0 = opac[idx]

        n_chunks = k_pad // cfg.chunk

        def chunk_body(carry, chunk_idx):
            T, done, C = carry
            sl = chunk_idx * cfg.chunk
            c_pix = jax.lax.dynamic_slice_in_dim(g_pix, sl, cfg.chunk, 0)
            c_conic = jax.lax.dynamic_slice_in_dim(g_conic, sl, cfg.chunk, 0)
            c_color = jax.lax.dynamic_slice_in_dim(g_color, sl, cfg.chunk, 0)
            c_a0 = jax.lax.dynamic_slice_in_dim(g_alpha0, sl, cfg.chunk, 0)
            c_ok = jax.lax.dynamic_slice_in_dim(ok, sl, cfg.chunk, 0)

            d = px[:, None, :] - c_pix[None, :, :]  # (P,CH,2)
            power = (
                -0.5
                * (
                    c_conic[None, :, 0] * d[..., 0] * d[..., 0]
                    + c_conic[None, :, 2] * d[..., 1] * d[..., 1]
                )
                - c_conic[None, :, 1] * d[..., 0] * d[..., 1]
            )
            alpha = jnp.minimum(0.99, c_a0[None, :] * jnp.exp(power))
            alpha = jnp.where(
                c_ok[None, :] & (power <= 0.0) & (alpha >= cfg.alpha_min), alpha, 0.0
            )

            one_minus = 1.0 - alpha  # (P,CH)
            cp = jnp.cumprod(one_minus, axis=1)
            excl = jnp.concatenate([jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=1)
            T_before = T[:, None] * excl
            T_after = T_before * one_minus
            # CUDA early-stop parity: a contribution is skipped (and the pixel
            # frozen) the moment it would push T below t_min
            contrib = (~done[:, None]) & (T_after >= cfg.t_min)
            w = jnp.where(contrib, T_before * alpha, 0.0)
            C = C + w @ c_color  # (P,3)
            alpha_eff = jnp.where(contrib, alpha, 0.0)
            T = T * jnp.prod(1.0 - alpha_eff, axis=1)
            done = done | jnp.any(T_after < cfg.t_min, axis=1)
            return (T, done, C), None

        if cfg.remat:
            chunk_body = jax.checkpoint(chunk_body)

        P = B * B
        (T, _, C), _ = jax.lax.scan(
            chunk_body,
            (
                jnp.ones((P,), jnp.float32),
                jnp.zeros((P,), bool),
                jnp.zeros((P, 3), jnp.float32),
            ),
            jnp.arange(n_chunks),
        )
        out = C + T[:, None] * bg[None, :]
        return out.reshape(B, B, 3)  # [y, x, c] (local x fastest in last dim idx)

    def do_block(origin):
        idx, ok = select_block(origin)
        return blend_block(origin, idx, ok)

    # process blocks in batches to bound memory
    nb = origins.shape[0]
    bb = min(cfg.block_batch, nb)
    nb_pad = -(-nb // bb) * bb
    origins_p = jnp.pad(origins, ((0, nb_pad - nb), (0, 0)))
    blocks = jax.lax.map(
        jax.vmap(do_block), origins_p.reshape(nb_pad // bb, bb, 2)
    ).reshape(nb_pad, B, B, 3)[:nb]
    return blocks


def assemble_blocks(
    blocks: jnp.ndarray, camera: Camera, cfg: RasterConfig
) -> jnp.ndarray:
    """(nby*nbx, B, B, 3) row-major blocks -> (H, W, 3) image."""
    B = cfg.block
    Wp = -(-camera.width // B) * B
    Hp = -(-camera.height // B) * B
    nbx, nby = Wp // B, Hp // B
    img = (
        blocks.reshape(nby, nbx, B, B, 3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(Hp, Wp, 3)
    )
    return img[: camera.height, : camera.width]


def _blend_blocks(
    pre: Preprocessed,
    order: jnp.ndarray,
    camera: Camera,
    bg: jnp.ndarray,
    cfg: RasterConfig,
) -> jnp.ndarray:
    """Depth-ordered per-block selection + front-to-back blending."""
    origins, _, _ = block_origins(camera, cfg)
    blocks = render_blocks(pre, order, origins, bg, cfg)
    return assemble_blocks(blocks, camera, cfg)


def render(
    means3d: jnp.ndarray,
    cov6: jnp.ndarray,
    opacity: jnp.ndarray,
    shs: Optional[jnp.ndarray],
    camera: Camera,
    bg: jnp.ndarray,
    sh_degree: int = 3,
    cfg: RasterConfig = RasterConfig(),
    colors_precomp: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Rasterize gaussians with precomputed 3D covariances to an (H, W, 3) image.

    The functional equivalent of GaussianRasterizer(...)(means3D, shs,
    opacities, cov3D_precomp) (/root/reference/main.py:148-156).  Returns HWC
    (the reference returns CHW and transposes at main.py:157).
    """
    pre = preprocess(
        means3d, cov6, opacity, shs, camera, sh_degree, cfg, colors_precomp
    )
    key = jnp.where(pre.valid, pre.depth, jnp.inf)
    order = jnp.argsort(key)
    return _blend_blocks(pre, order, camera, bg, cfg)
