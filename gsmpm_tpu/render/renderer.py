"""Differentiable tile-based 3D Gaussian splatting renderer.

Parity target: the CUDA diff-gaussian-rasterization extension the reference
consumes (GaussianRasterizationSettings/GaussianRasterizer,
/root/reference/main.py:118-156, /root/reference/extra.py:271-304), including
the cov3D_precomp path the MPM pipeline depends on.

TPU-native design (not a port of the CUDA tile binner):
1. preprocess — EWA projection (view transform, perspective Jacobian, 2D
   covariance + 0.3 low-pass, SH->RGB) in SoA planes layout: every quantity
   is an (N,) array so the VPU runs full 128-lane; no (N,3,3) relayouts;
2. production selection (_select_candidates_dupsort_v2): per-gaussian
   duplication keys carrying (tile | quantized depth) in one int32, one
   2-operand lax.sort, contiguous per-tile segments, per-block merge of
   fine/coarse/global streams — shaped by this chip's measured cost model
   (sorts cheap, gathers ~10 ns/index; see the function docstring);
3. the Pallas MXU blend kernel (render/pallas_blend.py) forward + the
   reverse-walk Pallas backward via custom VJP — the whole pallas path is
   natively differentiable (gather transposes to scatter-add, selection is
   integer-valued);
4. the XLA reference path (impl="xla"): global depth argsort + two-stage
   top_k binning + a chunk-scan blend with exact emulation of the CUDA
   early-stop (T < 1e-4 freeze) — differentiable end to end with jax.grad,
   the golden model for the kernels and the CPU-compile fallback.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gsmpm_tpu.render.camera import Camera
from gsmpm_tpu.render.sh import C0, _band_basis


class RasterConfig(NamedTuple):
    block: int = 64  # pixel block edge for binning/blending
    k_block: int = 1024  # max gaussians blended per block
    k_row: int = 8192  # max gaussians considered per block row
    chunk: int = 64  # gaussians per blend-scan step
    block_batch: int = 16  # retained for config compat (rows vmap over nbx)
    t_min: float = 1e-4  # transmittance early-stop (parity with CUDA)
    alpha_min: float = 1.0 / 255.0
    z_near: float = 0.2  # frustum near cull (parity with CUDA preprocess)
    remat: bool = True
    skip_empty: bool = True  # lax.cond fast path for blocks with 0 candidates
    impl: str = "auto"  # "pallas" | "xla" | "auto" (pallas on TPU)
    # dup-sort selection caps (pallas path): depth-first truncation per
    # fine-tile / coarse-tile / global candidate stream.  Their sum K is the
    # per-block candidate capacity; keep it a multiple of 128 (lane-aligned
    # (nblocks, K) layouts reshape for free).  Selection+gather cost is
    # linear in K (~4.5 us per K unit at 800x800 on v5e —
    # scripts/sweep_render3.py); 512/128/128 sits at the measured
    # quality knee (vs a K=2816 golden render on a worst-case dense scene,
    # shrinking k_tile below 512 is what degrades PSNR, while k_coarse
    # 256->128 left the image bit-identical).  Raise k_tile for dense
    # scenes when render_with_aux reports a large n_dropped.
    k_tile: int = 512
    k_coarse: int = 128
    k_global: int = 128
    sel: str = "auto"  # legacy v1 selection knob (tests only)
    # packed-stream blend (pallas path, EXPERIMENTAL — off by default):
    # candidates stored compactly at 128-aligned per-block offsets instead
    # of (nblocks, K) padding, so the candidate gather and kernel VMEM
    # residency track the REAL candidate total (mean count ~K/7 on bench
    # scenes).  Measured on v5e (r3): parity with the padded layout at
    # t_cap=32768 (8.3 vs 8.2 ms at 245k/800^2) but run-to-run unstable
    # (up to 15 ms) — the per-slot mapping + t_cap-wide ops eat the gather
    # savings; kept as a tested option for bigger-K scenes where padding
    # waste grows.  t_cap bounds the packed stream; overflow drops whole
    # tail blocks and is counted in n_dropped.
    packed: bool = False
    t_cap: int = 32768
    # two-tier dense-block selection (pallas path; k_dense=0 disables):
    # after the shared dup-sort, the n_dense FINE tiles with the largest
    # candidate segments get a SECOND window pass at capacity k_dense and
    # their blocks are re-blended (streamed kernels handle big k_dense) —
    # the expensive nblocks x K window/gather cost is paid at K=k_tile for
    # every block and at K=k_dense only for the few dense ones.  This is
    # how the drop-free render stays fast on concentrated scenes
    # (bench_render_dropfree); see BASELINE.md "Splat throughput: honest
    # accounting".
    k_dense: int = 0
    n_dense: int = 16
    # sorted-segment streaming rasterizer (render/stream_raster.py):
    # drop-free at ANY density (one (tile|depth) 11-operand sort makes each
    # tile's candidate list a contiguous depth-ordered segment; a
    # chunk-major Pallas grid walks the segments — no nblocks x K gathers).
    # stream_g2/g3/g4 are the per-tier gaussian budgets for splats whose
    # screen rect spans >4 / >16 / >64 fine tiles (16 / 64 / nf emission
    # corners each); overflow is counted in n_dropped and handled by the
    # measured-resize machinery.  stream_unroll = chunks walked per grid
    # step (amortizes per-step overhead).
    stream: bool = False
    stream_g2: int = 2048
    stream_g3: int = 256
    stream_g4: int = 32
    stream_unroll: int = 8
    stream_chunk: int = 128  # slots per walked chunk (128-lane multiple)


class Preprocessed(NamedTuple):
    """Planes layout: every field is (N,)."""

    pix_x: jnp.ndarray
    pix_y: jnp.ndarray
    conic_a: jnp.ndarray
    conic_b: jnp.ndarray
    conic_c: jnp.ndarray
    depth: jnp.ndarray
    radius: jnp.ndarray
    color_r: jnp.ndarray
    color_g: jnp.ndarray
    color_b: jnp.ndarray
    opacity: jnp.ndarray
    valid: jnp.ndarray  # bool

    @property
    def pix(self):  # compat: (N,2)
        return jnp.stack([self.pix_x, self.pix_y], axis=-1)

    @property
    def conic(self):  # compat: (N,3)
        return jnp.stack([self.conic_a, self.conic_b, self.conic_c], axis=-1)

    @property
    def color(self):  # compat: (N,3)
        return jnp.stack([self.color_r, self.color_g, self.color_b], axis=-1)


def _eval_sh_planes(shs, dx, dy, dz, sh_degree: int):
    """SH->RGB on planes; mirrors render/sh.py:eval_sh term-for-term.

    One explicit transpose to (K, 3, N) planes first: slicing the (N, K, 3)
    layout per (term, channel) makes every 4-byte strided slice touch the
    whole 16*3*4-byte row in HBM (~2 GB of traffic for 48 slices at 245k
    gaussians); after the transpose each term is one contiguous row.
    """
    shp = jnp.transpose(shs, (1, 2, 0))  # (K, 3, N)
    d = jnp.stack([dx, dy, dz], axis=-1)
    basis_terms = []  # (N,) per term, bands 1..deg
    for l in range(1, sh_degree + 1):
        basis = _band_basis(d, l, jnp)  # (N, 2l+1)
        basis_terms.extend(basis[:, t] for t in range(2 * l + 1))
    cols = []
    for c in range(3):
        acc = C0 * shp[0, c]
        for t, bt in enumerate(basis_terms):
            acc = acc + bt * shp[1 + t, c]
        cols.append(acc)
    return cols


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
    """Project gaussians to screen space (EWA splatting), planes layout."""
    mx, my, mz = means3d[:, 0], means3d[:, 1], means3d[:, 2]
    V = camera.view
    P = camera.full_proj

    t = [V[r, 0] * mx + V[r, 1] * my + V[r, 2] * mz + V[r, 3] for r in range(3)]
    depth = t[2]
    in_front = depth > cfg.z_near

    ph = [P[r, 0] * mx + P[r, 1] * my + P[r, 2] * mz + P[r, 3] for r in range(2)]
    pw = P[3, 0] * mx + P[3, 1] * my + P[3, 2] * mz + P[3, 3]
    inv_w = 1.0 / (pw + 1e-7)
    pix_x = ((ph[0] * inv_w + 1.0) * camera.width - 1.0) * 0.5
    pix_y = ((ph[1] * inv_w + 1.0) * camera.height - 1.0) * 0.5

    # EWA 2D covariance with the CUDA preprocess view-space clamp
    fx, fy = camera.focal_x, camera.focal_y
    limx, limy = 1.3 * camera.tanfovx, 1.3 * camera.tanfovy
    z = jnp.where(in_front, depth, 1.0)
    tx = jnp.clip(t[0] / z, -limx, limx) * z
    ty = jnp.clip(t[1] / z, -limy, limy) * z
    J00 = fx / z
    J02 = -fx * tx / (z * z)
    J11 = fy / z
    J12 = -fy * ty / (z * z)
    # T = J @ W_rot, rows 0,1 (planes; W entries are scalars)
    T0 = [J00 * V[0, c] + J02 * V[2, c] for c in range(3)]
    T1 = [J11 * V[1, c] + J12 * V[2, c] for c in range(3)]

    s00, s01, s02 = cov6[:, 0], cov6[:, 1], cov6[:, 2]
    s11, s12, s22 = cov6[:, 3], cov6[:, 4], cov6[:, 5]

    def quad(u, w):
        return (
            u[0] * w[0] * s00 + u[1] * w[1] * s11 + u[2] * w[2] * s22
            + (u[0] * w[1] + u[1] * w[0]) * s01
            + (u[0] * w[2] + u[2] * w[0]) * s02
            + (u[1] * w[2] + u[2] * w[1]) * s12
        )

    a = quad(T0, T0) + 0.3
    b = quad(T0, T1)
    c = quad(T1, T1) + 0.3

    det = a * c - b * b
    det_ok = det > 0
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conic_a = c * inv_det
    conic_b = -b * inv_det
    conic_c = a * inv_det

    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))

    if colors_precomp is not None:
        col = [colors_precomp[:, i] for i in range(3)]
    else:
        dx = mx - camera.campos[0]
        dy = my - camera.campos[1]
        dz = mz - camera.campos[2]
        inv_n = 1.0 / jnp.maximum(jnp.sqrt(dx * dx + dy * dy + dz * dz), 1e-9)
        col = _eval_sh_planes(shs, dx * inv_n, dy * inv_n, dz * inv_n, sh_degree)
        col = [jnp.maximum(ci + 0.5, 0.0) for ci in col]

    valid = in_front & det_ok & (radius > 0)
    return Preprocessed(
        pix_x=pix_x,
        pix_y=pix_y,
        conic_a=conic_a,
        conic_b=conic_b,
        conic_c=conic_c,
        depth=depth,
        radius=radius,
        color_r=col[0],
        color_g=col[1],
        color_b=col[2],
        opacity=opacity.reshape(-1),
        valid=valid,
    )


def block_origins(camera: Camera, cfg: RasterConfig):
    """Pixel-block origins covering the image, row-major over y.

    Returns (origins (nb,2) [x,y], nbx, nby).
    """
    B = cfg.block
    Wp = -(-camera.width // B) * B
    Hp = -(-camera.height // B) * B
    nbx, nby = Wp // B, Hp // B
    bx = jnp.arange(nbx, dtype=jnp.float32) * B
    by = jnp.arange(nby, dtype=jnp.float32) * B
    origins = jnp.stack([jnp.tile(bx, nby), jnp.repeat(by, nbx)], axis=-1)
    return origins, nbx, nby


# stacked planes gathered per candidate: order matters
_PLANE_FIELDS = (
    "pix_x", "pix_y", "conic_a", "conic_b", "conic_c",
    "color_r", "color_g", "color_b", "opacity", "radius",
)


def _sorted_planes(pre: Preprocessed, order: jnp.ndarray):
    """(10, N) gathered into depth order + sorted valid mask."""
    stack = jnp.stack([getattr(pre, f) for f in _PLANE_FIELDS])
    return stack[:, order], pre.valid[order]


def _blend_candidates(cand, ok, x0, y0, cfg: RasterConfig, bg):
    """Blend k depth-ordered candidate gaussians into one BxB block.

    cand: (10, k) planes, ok: (k,) bool, x0/y0: block origin (traced).
    Layout: (chunk, P) with P = B*B on the lane axis.
    Returns (B, B, 3).
    """
    B = cfg.block
    P = B * B
    k = cand.shape[1]
    k_pad = -(-k // cfg.chunk) * cfg.chunk
    if k_pad > k:
        cand = jnp.pad(cand, ((0, 0), (0, k_pad - k)))
        ok = jnp.pad(ok, (0, k_pad - k))

    ii = jnp.arange(B, dtype=jnp.float32)
    px = x0 + jnp.tile(ii, B)  # (P,) x fastest
    py = y0 + jnp.repeat(ii, B)

    okf = ok.astype(cand.dtype)
    n_chunks = k_pad // cfg.chunk

    def chunk_body(carry, chunk_idx):
        T, done, Cr, Cg, Cb = carry
        sl = chunk_idx * cfg.chunk
        c = jax.lax.dynamic_slice_in_dim(cand, sl, cfg.chunk, 1)  # (10, CH)
        c_okf = jax.lax.dynamic_slice_in_dim(okf, sl, cfg.chunk, 0)

        dx = px[None, :] - c[0][:, None]  # (CH, P)
        dy = py[None, :] - c[1][:, None]
        power = (
            -0.5 * (c[2][:, None] * dx * dx + c[4][:, None] * dy * dy)
            - c[3][:, None] * dx * dy
        )
        alpha = jnp.minimum(0.99, c[8][:, None] * jnp.exp(power))
        alpha = jnp.where(
            (c_okf[:, None] > 0) & (power <= 0.0) & (alpha >= cfg.alpha_min),
            alpha,
            0.0,
        )

        one_minus = 1.0 - alpha  # (CH, P)
        cp = jnp.cumprod(one_minus, axis=0)
        excl = jnp.concatenate([jnp.ones_like(cp[:1]), cp[:-1]], axis=0)
        T_before = T[None, :] * excl
        T_after = T_before * one_minus
        # CUDA early-stop parity: a contribution is skipped (and the pixel
        # frozen) the moment it would push T below t_min
        contrib = (~done[None, :]) & (T_after >= cfg.t_min)
        w = jnp.where(contrib, T_before * alpha, 0.0)
        Cr = Cr + jnp.sum(w * c[5][:, None], axis=0)
        Cg = Cg + jnp.sum(w * c[6][:, None], axis=0)
        Cb = Cb + jnp.sum(w * c[7][:, None], axis=0)
        alpha_eff = jnp.where(contrib, alpha, 0.0)
        T = T * jnp.prod(1.0 - alpha_eff, axis=0)
        done = done | jnp.any(T_after < cfg.t_min, axis=0)
        return (T, done, Cr, Cg, Cb), None

    if cfg.remat:
        chunk_body = jax.checkpoint(chunk_body)

    init = (
        jnp.ones((P,), cand.dtype),
        jnp.zeros((P,), bool),
        jnp.zeros((P,), cand.dtype),
        jnp.zeros((P,), cand.dtype),
        jnp.zeros((P,), cand.dtype),
    )
    (T, _, Cr, Cg, Cb), _ = jax.lax.scan(chunk_body, init, jnp.arange(n_chunks))
    out = jnp.stack([Cr + T * bg[0], Cg + T * bg[1], Cb + T * bg[2]], axis=-1)
    return out.reshape(B, B, 3)


def render_block_rows(
    pre: Preprocessed,
    order: jnp.ndarray,
    y_start,
    nby_local: int,
    nbx: int,
    bg: jnp.ndarray,
    cfg: RasterConfig,
) -> jnp.ndarray:
    """Render nby_local full block rows starting at pixel row y_start.

    Two-stage selection: per row the first k_row depth-ordered gaussians
    crossing the row's y-interval, then per block the first k_block of those
    crossing the block's x-interval.  Returns (nby_local*nbx, B, B, 3)
    row-major blocks.
    """
    B = cfg.block
    n = pre.pix_x.shape[0]
    k_row = min(cfg.k_row, n)
    k_blk = min(cfg.k_block, k_row)

    splanes, svalid = _sorted_planes(pre, order)
    rank = jnp.arange(n, dtype=jnp.float32)
    y_start = jnp.asarray(y_start, jnp.float32)

    def do_row(row_idx):
        y0 = y_start + row_idx.astype(jnp.float32) * B
        inter_y = (
            (splanes[1] + splanes[9] >= y0 - 0.5)
            & (splanes[1] - splanes[9] <= y0 + B - 0.5)
            & svalid
        )
        prio = jnp.where(inter_y, -rank, -jnp.inf)
        vals, idx = jax.lax.top_k(prio, k_row)
        cand = splanes[:, idx]  # (10, k_row) in depth order
        cand_ok = vals > -jnp.inf
        lrank = jnp.arange(k_row, dtype=jnp.float32)

        def do_block(bi):
            x0 = bi.astype(jnp.float32) * B
            inter_x = (
                (cand[0] + cand[9] >= x0 - 0.5)
                & (cand[0] - cand[9] <= x0 + B - 0.5)
                & cand_ok
            )
            bprio = jnp.where(inter_x, -lrank, -jnp.inf)
            bvals, bidx = jax.lax.top_k(bprio, k_blk)
            bcand = cand[:, bidx]
            bok = bvals > -jnp.inf

            if not cfg.skip_empty:
                return _blend_candidates(bcand, bok, x0, y0, cfg, bg)

            # sequential blocks (lax.map below) + cond => empty background
            # blocks really skip the blend, unlike under vmap where cond
            # lowers to select and both branches execute
            def empty(_):
                return jnp.broadcast_to(
                    bg.astype(bcand.dtype), (B, B, 3)
                ).reshape(B, B, 3) * jnp.ones((B, B, 3), bcand.dtype)

            def work(args):
                bcand, bok = args
                return _blend_candidates(bcand, bok, x0, y0, cfg, bg)

            return jax.lax.cond(jnp.any(bok), work, empty, (bcand, bok))

        if cfg.skip_empty:
            return jax.lax.map(do_block, jnp.arange(nbx))  # (nbx, B, B, 3)
        return jax.vmap(do_block)(jnp.arange(nbx))  # (nbx, B, B, 3)

    blocks = jax.lax.map(do_row, jnp.arange(nby_local))
    return blocks.reshape(nby_local * nbx, B, B, 3)


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
    """Full-image path: two-stage row/block selection + blending."""
    _, nbx, nby = block_origins(camera, cfg)
    blocks = render_block_rows(pre, order, 0.0, nby, nbx, bg, cfg)
    return assemble_blocks(blocks, camera, cfg)


def _select_candidates(pre: Preprocessed, order: jnp.ndarray,
                       camera: Camera, cfg: RasterConfig):
    """Two-stage binning (vmapped) -> per-block gather indices.

    Returns (gidx (nblocks, k_blk), counts (nblocks,), origins
    (nblocks, 2)): gidx are depth-ordered gather indices into
    _raw_planes' (10, N+1) planes, with index n selecting the sentinel
    column (log_opa = -1e30) for invalid/padded slots so they blend to
    exactly zero.  (Legacy v1 selection, kept for tests/benchmarks; the
    production path is _select_candidates_dupsort_v2.)
    """
    B = cfg.block
    origins, nbx, nby = block_origins(camera, cfg)
    n = pre.pix_x.shape[0]
    k_row = min(cfg.k_row, n)
    k_blk = min(cfg.k_block, k_row)

    sx = pre.pix_x[order]
    sy = pre.pix_y[order]
    sr = pre.radius[order]
    sv = pre.valid[order]
    rank = jnp.arange(n, dtype=jnp.float32)

    y0s = jnp.arange(nby, dtype=jnp.float32) * B

    def row_sel(y0):
        inter = (sy + sr >= y0 - 0.5) & (sy - sr <= y0 + B - 0.5) & sv
        prio = jnp.where(inter, -rank, -jnp.inf)
        _, idx = jax.lax.top_k(prio, k_row)
        return idx

    ridx = jax.vmap(row_sel)(y0s)  # (nby, k_row) indices into sorted order
    rx = sx[ridx]
    rr = sr[ridx]
    rok = sv[ridx] & (jnp.arange(k_row)[None, :] < n)
    # a row's top_k pads with repeated/garbage entries when fewer than k_row
    # intersect; re-derive validity from the y-test
    rok = rok & (
        (sy[ridx] + rr >= y0s[:, None] - 0.5)
        & (sy[ridx] - rr <= y0s[:, None] + B - 0.5)
    )

    x0s = jnp.arange(nbx, dtype=jnp.float32) * B
    lrank = jnp.arange(k_row, dtype=jnp.float32)
    inter_x = (
        (rx[:, None, :] + rr[:, None, :] >= x0s[None, :, None] - 0.5)
        & (rx[:, None, :] - rr[:, None, :] <= x0s[None, :, None] + B - 0.5)
        & rok[:, None, :]
    )  # (nby, nbx, k_row)
    bprio = jnp.where(inter_x, -lrank[None, None, :], -jnp.inf)
    bvals, bidx = jax.lax.top_k(bprio, k_blk)  # (nby, nbx, k_blk)
    bok = bvals > -jnp.inf

    ridx_b = jnp.broadcast_to(ridx[:, None, :], (nby, nbx, k_row))
    sel_sorted = jnp.take_along_axis(ridx_b, bidx, axis=2)
    gidx = order[sel_sorted]  # raw indices
    gidx = jnp.where(bok, gidx, n)  # sentinel row

    counts = jnp.sum(bok, axis=2).reshape(-1).astype(jnp.int32)
    return gidx.reshape(nby * nbx, k_blk), counts, origins.astype(jnp.int32)


def _tile_interval(p, r, B, nb):
    """Inclusive tile-index interval [t0, t1] whose blocks intersect p +- r.

    Intersection test (identical to _select_candidates / render_block_rows):
    block t intersects iff t*B - 0.5 <= p + r and p - r <= t*B + B - 0.5,
    i.e. t1 = floor((p + r + 0.5)/B) and t0 = ceil((p - r + 0.5)/B) - 1.
    Returns (t0, t1) clamped to [0, nb-1] plus an `offscreen` mask for empty
    intersections (tests/test_render.py checks this against the brute-force
    inequality).
    """
    t1u = jnp.floor((p + r + 0.5) / B)
    t0u = jnp.ceil((p - r + 0.5) / B) - 1.0
    offscreen = (t1u < 0.0) | (t0u > float(nb - 1))
    t0 = jnp.clip(t0u, 0.0, nb - 1).astype(jnp.int32)
    t1 = jnp.clip(t1u, 0.0, nb - 1).astype(jnp.int32)
    return t0, t1, offscreen


_RANK_BITS = 19
_RANK_M = 1 << _RANK_BITS
_SENT_RANK = jnp.int32(1 << 30)
_COARSE = 4  # fine tiles per coarse tile edge


def dupsort_applicable(n: int, camera: Camera, cfg: RasterConfig) -> bool:
    _, nbx, nby = block_origins(camera, cfg)
    ncx, ncy = -(-nbx // _COARSE), -(-nby // _COARSE)
    ntt = nbx * nby + ncx * ncy + 2  # fine + coarse + global + sentinel space
    return n < _RANK_M and ntt * _RANK_M < 2 ** 31


def _select_candidates_dupsort(pre: Preprocessed, order: jnp.ndarray,
                               camera: Camera, cfg: RasterConfig):
    """Duplication-sort binning: the TPU answer to the CUDA (tileID|depth)
    radix sort (upstream diff-gaussian-rasterization rasterizer_impl.cu,
    consumed at /root/reference/main.py:148-156).

    Each depth-ranked gaussian emits at most 4 packed int32 keys
    tile*2^19 + rank into ONE level: fine 64px tiles when its screen rect
    spans <= 2x2 of them, coarse 256px tiles when <= 2x2 of those, else a
    global bucket.  A single single-key int32 sort of the 4N keys then
    yields contiguous depth-ordered per-tile segments; every block's
    candidate list = its fine segment + its parent coarse segment + the
    global segment, merged by one small batched sort of ranks.  Coarse and
    global candidates may not intersect a given block's rect -- _build_F
    masks those exactly (log_opa = -inf), so the blended image equals the
    XLA reference path wherever the per-stream depth-first caps
    (k_tile/k_coarse/k_global) are not hit.

    This replaces 13 top_k passes over N plus 169 top_k passes over 8192
    (~26 ms at 245k gaussians) with one 4N sort (~4 ms): XLA TPU sorts are
    ~100k keys/ms, so selection cost is dominated by total sorted keys.
    """
    B = cfg.block
    origins, nbx, nby = block_origins(camera, cfg)
    n = pre.pix_x.shape[0]
    n4 = 4 * n
    ncx, ncy = -(-nbx // _COARSE), -(-nby // _COARSE)
    nf = nbx * nby
    nc = ncx * ncy
    gid = nf + nc  # global bucket tile id

    sx = pre.pix_x[order]
    sy = pre.pix_y[order]
    sr = pre.radius[order]
    sv = pre.valid[order]

    fx0, fx1, offx = _tile_interval(sx, sr, B, nbx)
    fy0, fy1, offy = _tile_interval(sy, sr, B, nby)
    valid = sv & ~(offx | offy)
    spx, spy = fx1 - fx0, fy1 - fy0
    lvl0 = valid & (spx <= 1) & (spy <= 1)
    cx0, cx1 = fx0 // _COARSE, fx1 // _COARSE
    cy0, cy1 = fy0 // _COARSE, fy1 // _COARSE
    cspx, cspy = cx1 - cx0, cy1 - cy0
    lvl1 = valid & ~lvl0 & (cspx <= 1) & (cspy <= 1)
    lvl2 = valid & ~lvl0 & ~lvl1

    rank = jnp.arange(n, dtype=jnp.int32)
    sent_key = jnp.int32(2 ** 31 - 1)
    keys = []
    for dy in (0, 1):
        for dx in (0, 1):
            ft = (fy0 + dy) * nbx + (fx0 + dx)
            fok = lvl0 & (dx <= spx) & (dy <= spy)
            ct = nf + (cy0 + dy) * ncx + (cx0 + dx)
            cok = lvl1 & (dx <= cspx) & (dy <= cspy)
            gok = lvl2 & (dx == 0) & (dy == 0)
            tile = jnp.where(fok, ft, jnp.where(cok, ct, gid))
            ok = fok | cok | gok
            keys.append(jnp.where(ok, tile * _RANK_M + rank, sent_key))
    skeys = jnp.sort(jnp.concatenate(keys))

    ntt = nf + nc + 1
    bounds = jnp.searchsorted(
        skeys, jnp.arange(ntt + 1, dtype=jnp.int32) * _RANK_M
    ).astype(jnp.int32)

    def windows(tile_ids, k):
        """Depth-first rank windows (len(tile_ids), k) padded with _SENT_RANK."""
        s = bounds[tile_ids]
        e = bounds[tile_ids + 1]
        w = s[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
        kk = skeys[jnp.minimum(w, n4 - 1)]
        return jnp.where(w < e[:, None], kk & (_RANK_M - 1), _SENT_RANK)

    bx = jnp.arange(nbx, dtype=jnp.int32)
    by = jnp.arange(nby, dtype=jnp.int32)
    t_f = (by[:, None] * nbx + bx[None, :]).reshape(-1)  # block-major = tile
    k0 = min(cfg.k_tile, n)
    k1 = min(cfg.k_coarse, n)
    k2 = min(cfg.k_global, n)
    ranks_f = windows(t_f, k0)  # (nblocks, k0)
    ranks_c_all = windows(nf + jnp.arange(nc, dtype=jnp.int32), k1)  # (nc, k1)
    parent = ((by[:, None] // _COARSE) * ncx
              + (bx[None, :] // _COARSE)).reshape(-1)
    ranks_c = ranks_c_all[parent]
    ranks_g = jnp.broadcast_to(
        windows(jnp.full((1,), gid, jnp.int32), k2), (nf, k2)
    )

    merged = jnp.sort(
        jnp.concatenate([ranks_f, ranks_c, ranks_g], axis=1), axis=1
    )
    counts = jnp.sum(merged < _SENT_RANK, axis=1).astype(jnp.int32)
    gidx = jnp.where(
        merged < _SENT_RANK,
        order[jnp.minimum(merged, n - 1)],
        n,  # sentinel planes row
    )
    return gidx, counts, origins.astype(jnp.int32)


def _depth_bits(ntt: int) -> int:
    """Depth-quantization bits so (ntt+1) * 2^bits stays inside int32."""
    return 31 - int(ntt + 1).bit_length()


def _dup_levels(pre: Preprocessed, camera: Camera, cfg: RasterConfig):
    """Level/tile assignment shared by dup-sort selection and cap sizing.

    Each valid gaussian lands in exactly ONE stream — fine B-px tiles when
    its screen rect spans <= 2x2 of them, coarse 4B-px tiles when <= 2x2 of
    those, else the single global bucket — and emits up to 4 tiles of that
    stream (the (dy, dx) corners of its rect).  Returns the per-gaussian
    level masks plus the tile-grid geometry consumed by _dup_tile.
    """
    B = cfg.block
    origins, nbx, nby = block_origins(camera, cfg)
    ncx, ncy = -(-nbx // _COARSE), -(-nby // _COARSE)
    nf = nbx * nby
    nc = ncx * ncy

    fx0, fx1, offx = _tile_interval(pre.pix_x, pre.radius, B, nbx)
    fy0, fy1, offy = _tile_interval(pre.pix_y, pre.radius, B, nby)
    valid = pre.valid & ~(offx | offy)
    spx, spy = fx1 - fx0, fy1 - fy0
    lvl0 = valid & (spx <= 1) & (spy <= 1)
    cx0, cx1 = fx0 // _COARSE, fx1 // _COARSE
    cy0, cy1 = fy0 // _COARSE, fy1 // _COARSE
    cspx, cspy = cx1 - cx0, cy1 - cy0
    lvl1 = valid & ~lvl0 & (cspx <= 1) & (cspy <= 1)
    lvl2 = valid & ~lvl0 & ~lvl1
    return dict(
        fx0=fx0, fy0=fy0, spx=spx, spy=spy, cx0=cx0, cy0=cy0,
        cspx=cspx, cspy=cspy, lvl0=lvl0, lvl1=lvl1, lvl2=lvl2,
        nf=nf, nc=nc, ncx=ncx, gid=nf + nc,
        origins=origins, nbx=nbx, nby=nby,
    )


def _dup_tile(lv: dict, dx: int, dy: int):
    """(tile_id, ok) for duplication corner (dy, dx) of every gaussian."""
    ft = (lv["fy0"] + dy) * lv["nbx"] + (lv["fx0"] + dx)
    fok = lv["lvl0"] & (dx <= lv["spx"]) & (dy <= lv["spy"])
    ct = lv["nf"] + (lv["cy0"] + dy) * lv["ncx"] + (lv["cx0"] + dx)
    cok = lv["lvl1"] & (dx <= lv["cspx"]) & (dy <= lv["cspy"])
    gok = lv["lvl2"] & (dx == 0) & (dy == 0)
    tile = jnp.where(fok, ft, jnp.where(cok, ct, lv["gid"]))
    return tile, fok | cok | gok


def required_raster_caps(
    means3d: jnp.ndarray,
    cov6: jnp.ndarray,
    opacity: jnp.ndarray,
    camera: Camera,
    cfg: RasterConfig = RasterConfig(),
) -> dict:
    """Measured per-stream candidate maxima of this geometry: the cap values
    at which render_with_aux reports n_dropped == 0 on BOTH implementations.

    The CUDA rasterizer this path replaces has no caps — every gaussian
    touching a tile is blended, forward and backward
    (/root/reference/main.py:148-156, extra.py:271-304) — so callers that
    need drop-free parity (the fitting path, whose gradients are biased by
    any truncation) size the static caps from a measured frame with this
    helper instead of doubling blindly.  Selection is geometry-only, so no
    SH/color evaluation runs.

    Returns {"k_tile", "k_coarse", "k_global", "k_row", "k_block"} ints.
    """
    zeros3 = jnp.zeros((means3d.shape[0], 3), jnp.float32)
    pre = preprocess(
        means3d, cov6, opacity, None, camera, 0, cfg, colors_precomp=zeros3
    )
    lv = _dup_levels(pre, camera, cfg)
    nf, nc, gid = lv["nf"], lv["nc"], lv["gid"]
    hist = jnp.zeros((nf + nc + 1,), jnp.int32)
    for dy in (0, 1):
        for dx in (0, 1):
            tile, ok = _dup_tile(lv, dx, dy)
            hist = hist.at[jnp.where(ok, tile, 0)].add(
                ok.astype(jnp.int32), mode="drop"
            )
    row_cnt, blk_cnt = _xla_stream_counts(pre, camera, cfg)
    return {
        "k_tile": int(jnp.max(hist[:nf])),
        "k_coarse": int(jnp.max(hist[nf : nf + nc])) if nc else 0,
        "k_global": int(hist[gid]),
        "k_row": int(jnp.max(row_cnt)),
        "k_block": int(jnp.max(blk_cnt)),
        # how many fine tiles exceed the CURRENT k_tile cap: the number of
        # blocks the two-tier path (cfg.k_dense/n_dense) must re-blend for
        # a drop-free render
        "n_fine_over": int(jnp.sum(hist[:nf] > min(cfg.k_tile,
                                                   means3d.shape[0]))),
    }


def bump_caps_for_dropfree(
    cfg: RasterConfig,
    means3d: jnp.ndarray,
    cov6: jnp.ndarray,
    opacity: jnp.ndarray,
    camera: Camera,
) -> RasterConfig:
    """Resize cfg so a re-render of THIS geometry is drop-free.

    The app-level half of the measured-resize policy (the CUDA reference
    renders uncapped every frame, /root/reference/main.py:148-156): stream
    configs bump the tier gaussian budgets from required_stream_caps;
    windowed configs bump the per-stream K caps (pallas two-tier) and the
    XLA row/block caps from required_raster_caps.  Headroom +25-50%
    rounded up so later frames rarely re-trigger.  Returns a cfg ``>=``
    the input in every cap (idempotent at the measured geometry)."""
    if cfg.stream:
        from gsmpm_tpu.render.stream_raster import required_stream_caps

        need = required_stream_caps(means3d, cov6, opacity, camera, cfg)

        def upg(cur, needed, floor):
            return max(cur, floor, -(-int(needed * 1.5) // 32) * 32)

        new = cfg._replace(
            stream_g2=upg(cfg.stream_g2, need["stream_g2"], 256),
            stream_g3=upg(cfg.stream_g3, need["stream_g3"], 64),
            stream_g4=upg(cfg.stream_g4, need["stream_g4"], 16),
        )
        if new == cfg:
            # the overflow came from a mid-frame pose this end-of-frame
            # measurement doesn't see: double as fallback
            new = cfg._replace(
                stream_g2=2 * cfg.stream_g2,
                stream_g3=2 * cfg.stream_g3,
                stream_g4=2 * cfg.stream_g4,
            )
        return new

    need = required_raster_caps(means3d, cov6, opacity, camera, cfg)

    def up(cur, needed):
        return max(cur, -(-int(needed * 1.25) // 128) * 128)

    _, nbx, nby = block_origins(camera, cfg)
    new = cfg._replace(
        k_dense=up(cfg.k_dense, need["k_tile"]),
        n_dense=max(cfg.n_dense, min(need["n_fine_over"] + 4, nbx * nby)),
        k_coarse=up(cfg.k_coarse, need["k_coarse"]),
        k_global=up(cfg.k_global, need["k_global"]),
        k_row=up(cfg.k_row, need["k_row"]),
        k_block=up(cfg.k_block, need["k_block"]),
    )
    if new == cfg:  # measurement already fits: double as fallback
        new = cfg._replace(
            k_dense=2 * max(cfg.k_dense, cfg.k_tile),
            n_dense=min(2 * max(cfg.n_dense, 8), nbx * nby),
            k_row=2 * cfg.k_row, k_block=2 * cfg.k_block,
        )
    return new


def _select_candidates_dupsort_v2(pre: Preprocessed, camera: Camera,
                                  cfg: RasterConfig,
                                  return_internals: bool = False):
    """Depth-in-key duplication-sort binning (round-2 redesign).

    The TPU answer to the CUDA (tileID|depth) radix sort (upstream
    diff-gaussian-rasterization rasterizer_impl.cu, consumed at
    /root/reference/main.py:148-156), shaped by the measured cost model of
    this chip (scripts/probe_gather*.py): XLA sorts are cheap (~1.2 ms for
    1M int32) but every gather costs ~6-20 ns per *index*, so the v1
    design's depth-reorder of the geometry planes (4 gathers x N indices,
    ~13 ms) and its rank-keyed windows were the whole selection cost.

    v2 emits keys in ORIGINAL particle order with the depth quantized into
    the key's low bits (bitcast of a positive f32 is order-preserving, so
    the top `depth_bits` of the float carry the depth order):

        key  = tile * 2^depth_bits + depth_q        (int32)
        pay  = gaussian index                        (int32)

    Each gaussian emits at most 4 (key, pay) pairs into ONE level: fine
    B-px tiles when its screen rect spans <= 2x2 of them, coarse 4B-px
    tiles when <= 2x2 of those, else a global bucket.  One 2-operand
    lax.sort of the 4N pairs yields contiguous depth-ordered per-tile
    segments; each block merges its fine + parent-coarse + global windows
    with one small row-sort keyed on depth_q.  Total gather volume: one
    (2, 4N) window gather of ~sum(k) indices — nothing else.

    Returns (gidx (nblocks, K), counts (nblocks,), origins (nblocks, 2),
    n_dropped) where K = k_tile + k_coarse + k_global, gidx rows are
    depth-ordered real candidates first (padding slots point at gaussian 0
    and are masked by counts), and n_dropped counts candidates that
    exceeded a per-stream depth-first cap (the CUDA binning has no caps;
    a non-zero n_dropped means the image may differ — VERDICT round 1
    weakness #3).
    """
    n = pre.pix_x.shape[0]
    n4 = 4 * n
    lv = _dup_levels(pre, camera, cfg)
    origins, nbx, nby = lv["origins"], lv["nbx"], lv["nby"]
    nf, nc, ncx, gid = lv["nf"], lv["nc"], lv["ncx"], lv["gid"]
    ntt = nf + nc + 1
    db = _depth_bits(ntt)
    M = jnp.int32(1 << db)
    sent = jnp.int32(2 ** 31 - 1)

    # order-preserving depth quantization (depth > 0 wherever valid)
    dq = jax.lax.shift_right_logical(
        jax.lax.bitcast_convert_type(
            jnp.maximum(pre.depth, cfg.z_near), jnp.int32
        ),
        31 - db,
    )

    gidx_row = jnp.arange(n, dtype=jnp.int32)
    keys = []
    for dy in (0, 1):
        for dx in (0, 1):
            tile, ok = _dup_tile(lv, dx, dy)
            keys.append(jnp.where(ok, tile * M + dq, sent))
    keys = jnp.concatenate(keys)
    pays = jnp.tile(gidx_row, 4)
    skeys, spay = jax.lax.sort((keys, pays), num_keys=1)

    bounds = jnp.searchsorted(
        skeys, jnp.arange(ntt + 1, dtype=jnp.int32) * M
    ).astype(jnp.int32)

    st = jnp.stack([skeys, spay])  # (2, 4N)

    def windows(tile_ids, k):
        """(len(tile_ids), k) depth-first (dq, gidx) windows, SENT-padded."""
        s = bounds[tile_ids]
        e = bounds[tile_ids + 1]
        w = s[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
        wf = jnp.minimum(w, n4 - 1).reshape(-1)
        kk = st[:, wf].reshape(2, *w.shape)
        live = w < e[:, None]
        dqw = jnp.where(live, kk[0] & (M - 1), sent)
        gw = jnp.where(live, kk[1], 0)
        return dqw, gw

    bx = jnp.arange(nbx, dtype=jnp.int32)
    by = jnp.arange(nby, dtype=jnp.int32)
    t_f = (by[:, None] * nbx + bx[None, :]).reshape(-1)
    k0 = min(cfg.k_tile, n)
    k1 = min(cfg.k_coarse, n)
    k2 = min(cfg.k_global, n)
    dq_f, g_f = windows(t_f, k0)
    dq_c_all, g_c_all = windows(nf + jnp.arange(nc, dtype=jnp.int32), k1)
    parent = ((by[:, None] // _COARSE) * ncx
              + (bx[None, :] // _COARSE)).reshape(-1)
    dq_c, g_c = dq_c_all[parent], g_c_all[parent]
    dq_g, g_g = windows(jnp.full((1,), gid, jnp.int32), k2)
    dq_g = jnp.broadcast_to(dq_g, (nf, k2))
    g_g = jnp.broadcast_to(g_g, (nf, k2))

    dq_all = jnp.concatenate([dq_f, dq_c, dq_g], axis=1)
    g_all = jnp.concatenate([g_f, g_c, g_g], axis=1)
    mdq, gidx = jax.lax.sort((dq_all, g_all), num_keys=1, dimension=1)
    counts = jnp.sum(mdq < sent, axis=1).astype(jnp.int32)

    # cap-overflow accounting: candidates beyond a stream's depth-first cap
    seg = bounds[1:] - bounds[:-1]  # (ntt,) per-tile segment lengths
    caps = jnp.concatenate([
        jnp.full((nf,), k0, jnp.int32),
        jnp.full((nc,), k1, jnp.int32),
        jnp.full((1,), k2, jnp.int32),
    ])
    n_dropped = jnp.sum(jnp.maximum(seg - caps, 0))

    if return_internals:
        internals = dict(
            st=st, bounds=bounds, M=M, sent=sent, n4=n4, nf=nf, nc=nc,
            parent=parent, seg=seg, k0=k0, k1=k1, k2=k2,
            dq_c_all=dq_c_all, g_c_all=g_c_all,
            dq_g1=dq_g[0:1], g_g1=g_g[0:1],
        )
        return gidx, counts, origins.astype(jnp.int32), n_dropped, internals
    return gidx, counts, origins.astype(jnp.int32), n_dropped


def _stream_windows(itl: dict, tile_ids: jnp.ndarray, k: int):
    """Depth-first (dq, gidx) windows over arbitrary tiles from the shared
    dup-sort internals (the nested helper of _select_candidates_dupsort_v2,
    reusable for the dense tier)."""
    st, bounds = itl["st"], itl["bounds"]
    M, sent, n4 = itl["M"], itl["sent"], itl["n4"]
    s = bounds[tile_ids]
    e = bounds[tile_ids + 1]
    w = s[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
    wf = jnp.minimum(w, n4 - 1).reshape(-1)
    kk = st[:, wf].reshape(2, *w.shape)
    live = w < e[:, None]
    dqw = jnp.where(live, kk[0] & (M - 1), sent)
    gw = jnp.where(live, kk[1], 0)
    return dqw, gw


def _render_pallas_two_tier(pre: Preprocessed, camera, bg,
                            cfg: RasterConfig):
    """Two-tier dense-block rendering (cfg.k_dense > 0).

    Tier 1 is the standard windowed path at k_tile for every block; the
    cfg.n_dense fine tiles with the largest sorted segments get a tier-2
    window at k_dense (one extra n_dense x k_dense gather instead of
    nblocks x k_dense) and their blocks are re-blended and scattered over
    the tier-1 output.  With k_dense sized to the measured per-tile maximum
    (required_raster_caps) the render is DROP-FREE at a fraction of the
    uniform-K cost on concentrated scenes.

    Returns (image, n_dropped) with n_dropped counting overflow beyond
    k_dense on the dense tiles, beyond k_tile on the rest, and beyond the
    coarse/global caps.
    """
    from gsmpm_tpu.render.pallas_blend import blend_blocks_pallas

    gidx, counts, origins, _, itl = _select_candidates_dupsort_v2(
        pre, camera, cfg, return_internals=True
    )
    cand = _gather_candidates(pre, gidx, counts)
    blocks = blend_blocks_pallas(cand, counts, origins, bg, cfg)

    nf, sent = itl["nf"], itl["sent"]
    n = pre.pix_x.shape[0]
    seg_f = itl["seg"][:nf]
    nd = min(cfg.n_dense, nf)
    kd = min(cfg.k_dense, n)
    dcnt, dtiles = jax.lax.top_k(seg_f, nd)

    dq_d, g_d = _stream_windows(itl, dtiles, kd)
    dq_c = itl["dq_c_all"][itl["parent"][dtiles]]
    g_c = itl["g_c_all"][itl["parent"][dtiles]]
    dq_g = jnp.broadcast_to(itl["dq_g1"], (nd, itl["k2"]))
    g_g = jnp.broadcast_to(itl["g_g1"], (nd, itl["k2"]))
    dq_all = jnp.concatenate([dq_d, dq_c, dq_g], axis=1)
    g_all = jnp.concatenate([g_d, g_c, g_g], axis=1)
    mdq, gidx_d = jax.lax.sort((dq_all, g_all), num_keys=1, dimension=1)
    counts_d = jnp.sum(mdq < sent, axis=1).astype(jnp.int32)

    cand_d = _gather_candidates(pre, gidx_d, counts_d)
    blocks_d = blend_blocks_pallas(
        cand_d, counts_d, origins[dtiles], bg, cfg
    )
    blocks = blocks.at[dtiles].set(blocks_d)

    # drop accounting: fine tiles at their EFFECTIVE caps + coarse/global
    over_f = jnp.maximum(seg_f - itl["k0"], 0)
    over_f_dense = jnp.maximum(dcnt - itl["k0"], 0)  # replaced by kd below
    dropped = (
        jnp.sum(over_f) - jnp.sum(over_f_dense)
        + jnp.sum(jnp.maximum(dcnt - kd, 0))
        + jnp.sum(jnp.maximum(itl["seg"][nf:nf + itl["nc"]] - itl["k1"], 0))
        + jnp.maximum(itl["seg"][-1] - itl["k2"], 0)
    )
    return assemble_blocks(blocks, camera, cfg), dropped


def _gather_candidates(pre: Preprocessed, gidx: jnp.ndarray,
                       counts: jnp.ndarray) -> jnp.ndarray:
    """(10, nblocks, K) candidate planes for the blend kernel.

    One gather of nblocks*K indices from the (10, N) planes (no sentinel
    column — an unaligned N+1 concat relayouts the whole array); padding
    slots are count-masked to log_opa = -1e30 so they blend to zero.
    """
    planes = _raw_planes_nosentinel(pre)
    nb, K = gidx.shape
    cand = planes[:, gidx.reshape(-1)].reshape(10, nb, K)
    live = jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None]
    logo = jnp.where(live, cand[5], -1e30)
    return jnp.concatenate([cand[:5], logo[None], cand[6:]], axis=0)


def _raw_planes_nosentinel(pre: Preprocessed) -> jnp.ndarray:
    """(10, N) candidate planes, row order as _raw_planes (no sentinel)."""
    logo = jnp.where(
        pre.valid & (pre.opacity > 0),
        jnp.log(jnp.maximum(pre.opacity, 1e-38)),
        -1e30,
    )
    rows = [
        pre.pix_x, pre.pix_y, pre.conic_a, pre.conic_b, pre.conic_c,
        logo, pre.color_r, pre.color_g, pre.color_b, pre.radius,
    ]
    return jnp.stack(rows, axis=0)


def _raw_planes(pre: Preprocessed) -> jnp.ndarray:
    """(10, N+1) raw candidate planes + the -inf sentinel column.

    Column-major (planes) layout on purpose: the candidate gather then runs
    along the 128-lane axis (planes[:, gidx], ~0.05 ms for 184k candidates
    at 245k gaussians) whereas building row-major (N, 10) rows costs a
    lane->sublane relayout of the whole array (~7 ms measured). Row order:
    [pix_x, pix_y, conic_a, conic_b, conic_c, log_opa, r, g, b, radius];
    pallas_blend._build_F consumes this layout directly.
    """
    logo = jnp.where(
        pre.valid & (pre.opacity > 0),
        jnp.log(jnp.maximum(pre.opacity, 1e-38)),
        -1e30,
    )
    rows = [
        pre.pix_x, pre.pix_y, pre.conic_a, pre.conic_b, pre.conic_c,
        logo, pre.color_r, pre.color_g, pre.color_b, pre.radius,
    ]
    planes = jnp.stack(rows, axis=0)  # (10, N); row 9 radius (rect mask)
    sentinel = jnp.zeros((10, 1), planes.dtype).at[5, 0].set(-1e30)
    return jnp.concatenate([planes, sentinel], axis=1)


def _render_pallas_fwd_impl(pre: Preprocessed, camera, bg,
                            cfg: RasterConfig):
    """Pallas path forward: v2 dup-sort selection + gather + MXU blend.

    Returns (image, n_dropped).  No depth argsort: selection v2 carries the
    quantized depth inside its sort keys.  cfg.packed selects the
    packed-stream layout (candidate gather + kernel DMA proportional to the
    real candidate total instead of nblocks*K).
    """
    if cfg.stream:
        from gsmpm_tpu.render.stream_raster import render_stream

        return render_stream(pre, camera, bg, cfg)
    if cfg.k_dense > 0:
        return _render_pallas_two_tier(pre, camera, bg, cfg)
    gidx, counts, origins, dropped = _select_candidates_dupsort_v2(
        pre, camera, cfg
    )
    if cfg.packed:
        return _render_pallas_packed(
            pre, gidx, counts, origins, dropped, bg, camera, cfg
        )
    from gsmpm_tpu.render.pallas_blend import blend_blocks_pallas

    cand_raw = _gather_candidates(pre, gidx, counts)
    blocks = blend_blocks_pallas(cand_raw, counts, origins, bg, cfg)
    return assemble_blocks(blocks, camera, cfg), dropped


def _render_pallas_packed(pre: Preprocessed, gidx, counts, origins, dropped,
                          bg, camera, cfg: RasterConfig):
    """Pack the merged per-block candidate lists into one compact stream.

    Block b owns slots [offs[b], offs[b] + ceil(count_b/C)*C); offsets are
    C-aligned (C is the blend chunk, a multiple of 128) so the kernels'
    dynamic-offset DMAs stay lane-aligned.  The packed candidate gather is
    T_cap indices instead of nblocks*K (~4.5x smaller at the bench scene's
    mean count of ~107/768)."""
    from gsmpm_tpu.render.pallas_blend import _blend_meta, blend_packed_pallas

    nb, K = gidx.shape
    C, n_chunks, _ = _blend_meta(
        cfg.k_tile + cfg.k_coarse + cfg.k_global, cfg
    )
    t_cap = min(cfg.t_cap, nb * n_chunks * C)
    t_cap = -(-t_cap // C) * C
    counts_c = jnp.minimum(counts, K)
    aligned = ((counts_c + C - 1) // C) * C
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(aligned).astype(jnp.int32)]
    )[:-1]
    fits = offs + aligned <= t_cap
    counts_eff = jnp.where(fits, counts_c, 0)
    dropped = dropped + jnp.sum(jnp.where(fits, 0, counts_c))

    # slot -> block map WITHOUT searchsorted/row-gathers (both lower to
    # per-needle row addressing, ~8.5 ms at t_cap=65536 measured): scatter
    # one marker per block start, cumsum, then only 1-D lane gathers
    p = jnp.arange(t_cap, dtype=jnp.int32)
    mark = jnp.zeros((t_cap + 1,), jnp.int32).at[
        jnp.minimum(offs, t_cap)].add(1, mode="drop")[:t_cap]
    b = jnp.clip(jnp.cumsum(mark) - 1, 0, nb - 1)
    j = p - offs[b]
    live = (j >= 0) & (j < counts_eff[b])
    src = b * K + jnp.clip(j, 0, K - 1)
    pg = jnp.where(live, gidx.reshape(-1)[src], 0)

    planes = _raw_planes_nosentinel(pre)
    cand = planes[:, pg]  # (10, t_cap)
    logo = jnp.where(live, cand[5], -1e30)
    cand = jnp.concatenate([cand[:5], logo[None], cand[6:]], axis=0)
    x0 = origins[:, 0].astype(jnp.float32)[b]
    y0 = origins[:, 1].astype(jnp.float32)[b]
    blocks = blend_packed_pallas(cand, x0, y0, counts_eff, offs, bg, cfg)
    return assemble_blocks(blocks, camera, cfg), dropped


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

    impl="pallas" (the "auto" default on TPU) runs the dup-sort selection +
    MXU tile-blend kernel (render/pallas_blend.py); impl="xla" is the
    fully differentiable reference path (and the only path on CPU compile
    targets outside tests' interpret mode).
    """
    img, _ = render_with_aux(
        means3d, cov6, opacity, shs, camera, bg, sh_degree, cfg,
        colors_precomp,
    )
    return img


def render_with_aux(
    means3d: jnp.ndarray,
    cov6: jnp.ndarray,
    opacity: jnp.ndarray,
    shs: Optional[jnp.ndarray],
    camera: Camera,
    bg: jnp.ndarray,
    sh_degree: int = 3,
    cfg: RasterConfig = RasterConfig(),
    colors_precomp: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """render() + aux: (image, n_dropped).

    n_dropped counts intersecting candidates silently truncated by the
    static per-stream caps (k_tile/k_coarse/k_global on the pallas path,
    k_row/k_block on the XLA path).  The CUDA reference has no caps, so a
    non-zero n_dropped flags a frame whose image may deviate — callers
    (apps/simulate.py) surface it as a warning.
    """
    impl = cfg.impl
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        # natively differentiable: the blend pairs a Pallas forward with
        # the Pallas reverse-walk backward (render/pallas_blend.py), the
        # candidate gather transposes to a scatter-add, selection is
        # integer-valued (no tangents)
        pre = preprocess(
            means3d, cov6, opacity, shs, camera, sh_degree, cfg,
            colors_precomp,
        )
        return _render_pallas_fwd_impl(pre, camera, bg, cfg)
    return _render_xla(
        means3d, cov6, opacity, shs, camera, bg, colors_precomp,
        sh_degree=sh_degree, cfg=cfg,
    )


def _render_xla(means3d, cov6, opacity, shs, camera, bg, colors_precomp,
                *, sh_degree, cfg):
    pre = preprocess(
        means3d, cov6, opacity, shs, camera, sh_degree, cfg, colors_precomp
    )
    key = jnp.where(pre.valid, pre.depth, jnp.inf)
    order = jnp.argsort(key)
    img = _blend_blocks(pre, order, camera, bg, cfg)
    dropped = _xla_dropped_count(pre, camera, cfg)
    return img, dropped


def _xla_stream_counts(pre: Preprocessed, camera: Camera, cfg: RasterConfig):
    """(row_cnt (nby,), blk_cnt (nby, nbx)) intersection counts of the XLA
    path's two selection stages (row interval test, then block rect test)."""
    B = cfg.block
    _, nbx, nby = block_origins(camera, cfg)
    y0s = jnp.arange(nby, dtype=jnp.float32)[:, None] * B
    inter_y = (
        (pre.pix_y[None, :] + pre.radius[None, :] >= y0s - 0.5)
        & (pre.pix_y[None, :] - pre.radius[None, :] <= y0s + B - 0.5)
        & pre.valid[None, :]
    )  # (nby, N)
    row_cnt = jnp.sum(inter_y, axis=1)
    x0s = jnp.arange(nbx, dtype=jnp.float32)[:, None] * B
    inter_x = (
        (pre.pix_x[None, :] + pre.radius[None, :] >= x0s - 0.5)
        & (pre.pix_x[None, :] - pre.radius[None, :] <= x0s + B - 0.5)
    )  # (nbx, N)
    blk_cnt = jnp.sum(
        inter_y[:, None, :] & inter_x[None, :, :], axis=2
    )  # (nby, nbx)
    return row_cnt, blk_cnt


def _xla_dropped_count(pre: Preprocessed, camera: Camera, cfg: RasterConfig):
    """Candidates beyond the XLA path's k_row/k_block caps (see render_with_aux)."""
    n = pre.pix_x.shape[0]
    k_row = min(cfg.k_row, n)
    k_blk = min(cfg.k_block, k_row)
    row_cnt, blk_cnt = _xla_stream_counts(pre, camera, cfg)
    row_drop = jnp.sum(jnp.maximum(row_cnt - k_row, 0))
    blk_drop = jnp.sum(jnp.maximum(blk_cnt - k_blk, 0))
    return (row_drop + blk_drop).astype(jnp.int32)


