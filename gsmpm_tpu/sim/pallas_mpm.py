"""Pallas TPU kernels for the tile-bucketed separable MPM transfer.

The MXU/VPU implementation of the per-chunk math in sim/tiles.py
(p2g_chunk_ref / g2p_chunk_ref are the golden models; design in
sim/TILED_DESIGN.md).  One grid step = one chunk of S particles belonging to
one tile:

P2G: build 16-slot per-axis spline bases (16,S) on the VPU, apply the
per-axis boundary clamp (domain-edge contributions fold onto the
boundary cells inside the kernel, so the XLA side never pad-folds), expand
the five (y,z) basis pairs to (256,S) in octant-blocked column order
(b,c,yl,zl), and accumulate the 22 q-scaled x-side row groups against them
on the MXU.  The window is emitted octant-decomposed as a (256,64) block:
row = oct*32 + comp*8 + xl with oct = a*4+b*2+c, col = yl*8 + zl.  Octant
(a,b,c) of tile t belongs entirely to padded-grid tile t+(a,b,c), so the
XLA-side fold is 8 in-order strided-slice adds -- no transposes anywhere.

G2P: per-tile input is the 8 surrounding padded-grid tiles packed as a
(192,64) block (row = oct*24 + comp*8 + xl); the kernel reassembles the
(48,256) window with a lane concat, runs the five pair matmuls
(48,256)@(256,S), and reduces with the x-side bases to v, grad_v and APIC
C; advection and F_trial update happen in-register before the (QROWS,S)
block is written back.

No scatter, no gather, no atomics anywhere -- parity with the reference's
ti.atomic_add P2G (/root/reference/mpm_solver/utils.py:89-134) comes from the
algebraic identity of the separable B-spline expansion, tested against the
oracle in tests/test_tiles.py / tests/test_pallas_mpm.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsmpm_tpu.sim.state import GridConfig
from gsmpm_tpu.sim.tiles import (
    LOCAL_MAX,
    LOCAL_MIN,
    PAD_LO,
    QROWS,
    RC,
    RDRIFT,
    RF,
    RFT,
    RMASS,
    RVOL,
    RV,
    RX,
    SAFE_MAX,
    SAFE_MIN,
    T_TILE,
    TileConfig,
    TiledState,
    W_WIN,
)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# f32 operands on the MXU default to a single bf16 pass (~3e-3 rel error,
# which compounds over substeps). Mosaic doesn't support Precision.HIGH, and
# HIGHEST costs 6 passes; _mm3 below hand-rolls the 3-pass bf16 split
# (a_hi+a_lo)@(b_hi+b_lo) dropping the lo*lo term -- ~1e-6 rel error at half
# the MXU time of HIGHEST.
_MM_PRECISION = jax.lax.Precision.HIGHEST


def _mm3(a, b, dn):
    """f32 x f32 matmul as 3 bf16 MXU passes (~bf16x3 / Precision.HIGH)."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    mm = functools.partial(
        jax.lax.dot_general, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    return mm(a_hi, b_hi) + (mm(a_lo, b_hi) + mm(a_hi, b_lo))


def _clamp_bases(slots, torg, g, *bases):
    """Fold out-of-domain slot weight onto the boundary slots (VPU only).

    Domain-boundary clamp: padded cell torg+k clips to core range
    [PAD_LO, PAD_LO+g-1] (same semantics as the reference's implicit OOB
    clamp, /root/reference/mpm_solver/utils.py:114). The clamped region is
    always a contiguous edge range of slots, so this is a pair of masked
    column sums per basis -- no (16,16) matmuls (those cost ~1ms/substep in
    MXU issue latency across 1.3k chunks). For interior tiles lo<=0 and
    hi>=15, every mask is empty and the bases pass through unchanged.
    """
    lo = PAD_LO - torg                  # first valid slot
    hi = PAD_LO + g - 1.0 - torg        # last valid slot
    below = slots < lo
    above = slots > hi
    inside = (~below) & (~above)
    at_lo = slots == lo
    at_hi = slots == hi
    out = []
    for b in bases:
        s_lo = jnp.sum(jnp.where(below, b, 0.0), axis=0, keepdims=True)
        s_hi = jnp.sum(jnp.where(above, b, 0.0), axis=0, keepdims=True)
        out.append(jnp.where(inside, b, 0.0)
                   + jnp.where(at_lo, s_lo, 0.0)
                   + jnp.where(at_hi, s_hi, 0.0))
    return out


def _axis_bases_k(xrow, torg, inv_dx, g, S, dtype):
    """(1,S) positions -> (16,S) w, dw, u bases (mirrors tiles._axis_bases).

    All three are boundary-clamped via _clamp_bases.
    """
    gp = xrow * inv_dx
    basef = jnp.floor(gp - 0.5)
    fx = gp - basef
    basep = jnp.clip(basef, -1.0, g - 1.0) + PAD_LO
    local = jnp.clip(basep - torg.astype(dtype), LOCAL_MIN, LOCAL_MAX)
    slots = jax.lax.broadcasted_iota(jnp.int32, (W_WIN, S), 0).astype(dtype)
    k = slots - local  # (16, S) float slot distance
    kf = k
    w0 = 0.5 * (1.5 - fx) ** 2
    w1 = 0.75 - (fx - 1.0) ** 2
    w2 = 0.5 * (fx - 0.5) ** 2
    is0 = k == 0.0
    is1 = k == 1.0
    is2 = k == 2.0
    w = jnp.where(is0, w0, jnp.where(is1, w1, jnp.where(is2, w2, 0.0)))
    d0 = (fx - 1.5) * inv_dx
    d1 = -2.0 * (fx - 1.0) * inv_dx
    d2 = (fx - 0.5) * inv_dx
    dw = jnp.where(is0, d0, jnp.where(is1, d1, jnp.where(is2, d2, 0.0)))
    u = w * (kf - fx)
    return _clamp_bases(slots, torg, g, w, dw, u)


def _pair_bc(y16, z16):
    """(16,S) x (16,S) -> (256,S) pair basis in (b, c, yl, zl) row order.

    Row b*128 + c*64 + yl*8 + zl = y16[b*8+yl] * z16[c*8+zl]; octant (b,c)
    occupies the contiguous row block [((b*2+c)*64, +64) so the window's
    columns are octant-blocked.
    """
    blocks = []
    for b in (0, 1):
        y_rep = jnp.repeat(y16[b * 8:(b + 1) * 8], T_TILE, axis=0)  # (64,S)
        for c in (0, 1):
            z_til = jnp.tile(z16[c * 8:(c + 1) * 8], (T_TILE, 1))   # (64,S)
            blocks.append(y_rep * z_til)
    return jnp.concatenate(blocks, axis=0)


def _p2g_kernel(tile_ref, first_ref, live_ref, q_ref, sig_ref,
                out_ref, *, S, g, dx, inv_dx, dt, nt):
    c = pl.program_id(0)
    dtype = q_ref.dtype
    # tile origin from the 1-D tile id: a 2-D (NCHUNK, 3) scalar-prefetch
    # operand gets its minor dim padded to 128 SMEM lanes, which overflows
    # the 1 MB SMEM at n_grid=100 (nchunk 3157 -> 1.6 MB); the scalar
    # div/mod here costs nothing
    t = tile_ref[c]
    tx = ((t // (nt * nt)) * T_TILE).astype(dtype)
    ty = (((t // nt) % nt) * T_TILE).astype(dtype)
    tz = ((t % nt) * T_TILE).astype(dtype)

    # dead chunks (slack for the occupied-tile cap) skip all work;
    # their windows were already written by their tile's live chunks
    @pl.when(live_ref[c] == 1)
    def _():
        wx, dwx, ux = _axis_bases_k(q_ref[RX:RX + 1], tx, inv_dx, g, S, dtype)
        wy, dwy, uy = _axis_bases_k(q_ref[RX + 1:RX + 2], ty, inv_dx, g, S, dtype)
        wz, dwz, uz = _axis_bases_k(q_ref[RX + 2:RX + 3], tz, inv_dx, g, S, dtype)

        m = q_ref[RMASS:RMASS + 1]
        negdtv = -dt * q_ref[RVOL:RVOL + 1]
        mdx = m * dx

        # pair (w,w): rows = [m] + [m v_r]*3 + [m dx C_r0 via ux]*3 + [-dtV s_r0 via dwx]*3
        X_ww = jnp.concatenate(
            [wx * m]
            + [wx * (m * q_ref[RV + r:RV + r + 1]) for r in range(3)]
            + [ux * (mdx * q_ref[RC + 3 * r:RC + 3 * r + 1]) for r in range(3)]
            + [dwx * (negdtv * sig_ref[3 * r:3 * r + 1]) for r in range(3)],
            axis=0,
        )  # (160, S)
        X_uy = jnp.concatenate(
            [wx * (mdx * q_ref[RC + 3 * r + 1:RC + 3 * r + 2]) for r in range(3)],
            axis=0,
        )
        X_uz = jnp.concatenate(
            [wx * (mdx * q_ref[RC + 3 * r + 2:RC + 3 * r + 3]) for r in range(3)],
            axis=0,
        )
        X_dy = jnp.concatenate(
            [wx * (negdtv * sig_ref[3 * r + 1:3 * r + 2]) for r in range(3)],
            axis=0,
        )
        X_dz = jnp.concatenate(
            [wx * (negdtv * sig_ref[3 * r + 2:3 * r + 3]) for r in range(3)],
            axis=0,
        )

        dn = (((1,), (1,)), ((), ()))
        r_ww = _mm3(X_ww, _pair_bc(wy, wz), dn)   # (160, 256)
        r_uy = _mm3(X_uy, _pair_bc(uy, wz), dn)   # (48, 256)
        r_uz = _mm3(X_uz, _pair_bc(wy, uz), dn)
        r_dy = _mm3(X_dy, _pair_bc(dwy, wz), dn)
        r_dz = _mm3(X_dz, _pair_bc(wy, dwz), dn)

        # per-component window planes (16, 256): rows x-slot, cols (b,c,yl,zl)
        parts = [r_ww[0:16]]
        for r in range(3):
            mom = (
                r_ww[16 * (1 + r):16 * (2 + r)]
                + r_ww[16 * (4 + r):16 * (5 + r)]
                + r_ww[16 * (7 + r):16 * (8 + r)]
                + r_uy[16 * r:16 * (r + 1)]
                + r_uz[16 * r:16 * (r + 1)]
                + r_dy[16 * r:16 * (r + 1)]
                + r_dz[16 * r:16 * (r + 1)]
            )
            parts.append(mom)

        # octant-decomposed (32,64) pieces: oct (a,b,c) -> padded tile t+(a,b,c)
        pieces = []
        for a in (0, 1):
            for bc in range(4):
                pieces.append(jnp.concatenate(
                    [parts[comp][a * 8:a * 8 + 8, bc * 64:(bc + 1) * 64]
                     for comp in range(4)], axis=0,
                ))

        @pl.when(first_ref[c] == 1)
        def _():
            for o, piece in enumerate(pieces):
                out_ref[0, o * 32:(o + 1) * 32, :] = piece

        @pl.when((first_ref[c] != 1) & (live_ref[c] == 1))
        def _():
            for o, piece in enumerate(pieces):
                out_ref[0, o * 32:(o + 1) * 32, :] += piece

def p2g_tiled_pallas(ts: TiledState, sig, grid: GridConfig, tc: TileConfig,
                     dt) -> jnp.ndarray:
    """(QROWS,NP) q + (16,NP) sig -> octant windows (ntiles, 256, 64).

    Chunk count comes from the arrays (not tc), so a sharded caller can
    pass a per-device slice of the chunk tables.
    """
    S = tc.S
    nchunk = ts.chunk_tile.shape[0]

    kernel = functools.partial(
        _p2g_kernel, S=S, g=float(tc.n_grid), dx=float(grid.dx),
        inv_dx=float(grid.inv_dx), dt=float(dt), nt=tc.nt,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nchunk,),
        in_specs=[
            pl.BlockSpec((QROWS, S), lambda c, t, f, lv: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, S), lambda c, t, f, lv: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8 * 4 * T_TILE, T_TILE * T_TILE),
            lambda c, t, f, lv: (t[c], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    windows = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (tc.ntiles, 8 * 4 * T_TILE, T_TILE * T_TILE), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(ts.chunk_tile, ts.chunk_first, ts.chunk_live, ts.q, sig)

    # zero windows of unoccupied tiles (their blocks are never written)
    occupied = jnp.zeros((tc.ntiles,), bool).at[ts.chunk_tile].set(True)
    return jnp.where(occupied[:, None, None], windows, 0.0)


def _g2p_kernel(tile_ref, live_ref, q_ref, ext_ref, out_ref,
                *, S, g, inv_dx, dt, nt):
    c = pl.program_id(0)
    dtype = q_ref.dtype
    # origin from the 1-D tile id (see _p2g_kernel: a 2-D torg operand
    # would be lane-padded in SMEM and overflow it at n_grid=100)
    t = tile_ref[c]
    tx = ((t // (nt * nt)) * T_TILE).astype(dtype)
    ty = (((t // nt) % nt) * T_TILE).astype(dtype)
    tz = ((t % nt) * T_TILE).astype(dtype)

    @pl.when(live_ref[c] != 1)
    def _():
        out_ref[:] = q_ref[:]

    @pl.when(live_ref[c] == 1)
    def _():
        wx, dwx, ux = _axis_bases_k(q_ref[RX:RX + 1], tx, inv_dx, g, S, dtype)
        wy, dwy, uy = _axis_bases_k(q_ref[RX + 1:RX + 2], ty, inv_dx, g, S, dtype)
        wz, dwz, uz = _axis_bases_k(q_ref[RX + 2:RX + 3], tz, inv_dx, g, S, dtype)

        # reassemble the (48, 256) window from 8 octant blocks: row comp*16+
        # (a*8+xl), col (b,c,yl,zl) -- a lane concat of four clean 64-wide parts
        Wbc = []
        for b in (0, 1):
            for cz in (0, 1):
                rows = []
                for comp in range(3):
                    for a in (0, 1):
                        o = a * 4 + b * 2 + cz
                        rows.append(ext_ref[0, o * 24 + comp * 8:
                                            o * 24 + comp * 8 + 8, :])
                Wbc.append(jnp.concatenate(rows, axis=0))  # (48, 64)
        W = jnp.concatenate(Wbc, axis=1)  # (48, 256)

        dn = (((1,), (0,)), ((), ()))
        t_ww = _mm3(W, _pair_bc(wy, wz), dn)    # (48, S)
        t_uy = _mm3(W, _pair_bc(uy, wz), dn)
        t_uz = _mm3(W, _pair_bc(wy, uz), dn)
        t_dy = _mm3(W, _pair_bc(dwy, wz), dn)
        t_dz = _mm3(W, _pair_bc(wy, dwz), dn)

        def red(xb, t, r):
            return jnp.sum(xb * t[16 * r:16 * (r + 1)], axis=0, keepdims=True)

        coef = 4.0 * inv_dx
        new_v = [red(wx, t_ww, r) for r in range(3)]           # (1,S) each
        grad = [[red(dwx, t_ww, r), red(wx, t_dy, r), red(wx, t_dz, r)]
                for r in range(3)]
        new_C = [[coef * red(ux, t_ww, r), coef * red(wx, t_uy, r),
                  coef * red(wx, t_uz, r)] for r in range(3)]

        valid = q_ref[RMASS:RMASS + 1] > 0
        out_ref[:] = q_ref[:]
        new_x = []
        for a in range(3):
            xa = q_ref[RX + a:RX + a + 1]
            nx = jnp.where(valid, xa + dt * new_v[a], xa)
            new_x.append(nx)
            out_ref[RX + a:RX + a + 1] = nx
            out_ref[RV + a:RV + a + 1] = jnp.where(valid, new_v[a], 0.0)
        for r in range(3):
            for cc in range(3):
                out_ref[RC + 3 * r + cc:RC + 3 * r + cc + 1] = jnp.where(
                    valid, new_C[r][cc], 0.0
                )
                acc = jnp.zeros_like(new_v[0])
                for k in range(3):
                    gk = grad[r][k] * dt + (1.0 if k == r else 0.0)
                    acc = acc + gk * q_ref[RF + 3 * k + cc:RF + 3 * k + cc + 1]
                out_ref[RFT + 3 * r + cc:RFT + 3 * r + cc + 1] = jnp.where(
                    valid, acc, q_ref[RF + 3 * r + cc:RF + 3 * r + cc + 1]
                )

        drift = jnp.zeros_like(new_v[0], dtype=jnp.bool_)
        for a, ta in zip(range(3), (tx, ty, tz)):
            gp = new_x[a] * inv_dx
            basep = jnp.clip(jnp.floor(gp - 0.5), -1.0, g - 1.0) + PAD_LO
            local = basep - ta
            drift = drift | (local < SAFE_MIN) | (local > SAFE_MAX)
        out_ref[RDRIFT:RDRIFT + 1] = (valid & drift).astype(dtype)

def g2p_tiled_pallas(ts: TiledState, ext, grid: GridConfig,
                     tc: TileConfig, dt) -> jnp.ndarray:
    """q (QROWS,NP) + octant grid (ntiles, 192, 64) -> new q (QROWS,NP)."""
    S = tc.S
    nchunk = ts.chunk_tile.shape[0]

    kernel = functools.partial(
        _g2p_kernel, S=S, g=float(tc.n_grid), inv_dx=float(grid.inv_dx),
        dt=float(dt), nt=tc.nt,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchunk,),
        in_specs=[
            pl.BlockSpec((QROWS, S), lambda c, t, lv: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8 * 3 * T_TILE, T_TILE * T_TILE),
                         lambda c, t, lv: (t[c], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((QROWS, S), lambda c, t, lv: (0, c),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QROWS, ts.q.shape[1]), jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(ts.chunk_tile, ts.chunk_live, ts.q, ext)


# ---------------------------------------------------------------------------
# second-order basis reductions for the hand-written transfer VJPs
# (sim/transfer_vjp.py): <win_c, d/dx_a {W, U^k, D^k}> per particle
# ---------------------------------------------------------------------------

def _axis_bases2_k(xrow, torg, inv_dx, g, S, dtype):
    """_axis_bases_k plus the second-order bases ddw (piecewise-constant
    spline second derivative {1,-2,1} inv_dx^2) and du = dw (k - fx) -
    w inv_dx, all boundary-clamped."""
    gp = xrow * inv_dx
    basef = jnp.floor(gp - 0.5)
    fx = gp - basef
    basep = jnp.clip(basef, -1.0, g - 1.0) + PAD_LO
    local = jnp.clip(basep - torg.astype(dtype), LOCAL_MIN, LOCAL_MAX)
    slots = jax.lax.broadcasted_iota(jnp.int32, (W_WIN, S), 0).astype(dtype)
    k = slots - local
    kf = k
    w0 = 0.5 * (1.5 - fx) ** 2
    w1 = 0.75 - (fx - 1.0) ** 2
    w2 = 0.5 * (fx - 0.5) ** 2
    is0 = k == 0.0
    is1 = k == 1.0
    is2 = k == 2.0
    w = jnp.where(is0, w0, jnp.where(is1, w1, jnp.where(is2, w2, 0.0)))
    d0 = (fx - 1.5) * inv_dx
    d1 = -2.0 * (fx - 1.0) * inv_dx
    d2 = (fx - 0.5) * inv_dx
    dw = jnp.where(is0, d0, jnp.where(is1, d1, jnp.where(is2, d2, 0.0)))
    dd = inv_dx * inv_dx
    ddw = jnp.where(is0, dd, jnp.where(is1, -2.0 * dd,
                                       jnp.where(is2, dd, 0.0)))
    ddw = ddw * jnp.ones_like(w)
    u = w * (kf - fx)
    du = dw * (kf - fx) - w * inv_dx
    return _clamp_bases(slots, torg, g, w, dw, u, ddw, du)


def _sored_kernel(tile_ref, live_ref, q_ref, win_ref, out_ref,
                  *, S, g, inv_dx, nt, ncomp):
    c = pl.program_id(0)
    dtype = q_ref.dtype
    t = tile_ref[c]
    tx = ((t // (nt * nt)) * T_TILE).astype(dtype)
    ty = (((t // nt) % nt) * T_TILE).astype(dtype)
    tz = ((t % nt) * T_TILE).astype(dtype)

    out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    @pl.when(live_ref[c] == 1)
    def _():
        wx, dwx, ux, ddx_, dux = _axis_bases2_k(
            q_ref[RX:RX + 1], tx, inv_dx, g, S, dtype)
        wy, dwy, uy, ddy_, duy = _axis_bases2_k(
            q_ref[RX + 1:RX + 2], ty, inv_dx, g, S, dtype)
        wz, dwz, uz, ddz_, duz = _axis_bases2_k(
            q_ref[RX + 2:RX + 3], tz, inv_dx, g, S, dtype)

        W = win_ref[0]  # (ncomp*16, 256)
        dn = (((1,), (0,)), ((), ()))
        pairs = {
            "ww": _pair_bc(wy, wz), "dw": _pair_bc(dwy, wz),
            "wd": _pair_bc(wy, dwz), "uw": _pair_bc(uy, wz),
            "wu": _pair_bc(wy, uz), "Du": _pair_bc(duy, wz),
            "ud": _pair_bc(uy, dwz), "du_": _pair_bc(dwy, uz),
            "uD": _pair_bc(wy, duz), "ad": _pair_bc(ddy_, wz),
            "dd": _pair_bc(dwy, dwz), "da": _pair_bc(wy, ddz_),
        }
        T = {k: _mm3(W, p, dn) for k, p in pairs.items()}  # (ncomp*16, S)

        def red(xb, key, cc):
            return jnp.sum(xb * T[key][16 * cc:16 * (cc + 1)], axis=0,
                           keepdims=True)

        # row layout per comp c (21 rows): dW[a] (3), dU[a][k] (9), dD[a][k]
        for cc in range(ncomp):
            base = cc * 21
            out_ref[base + 0:base + 1] = red(dwx, "ww", cc)
            out_ref[base + 1:base + 2] = red(wx, "dw", cc)
            out_ref[base + 2:base + 3] = red(wx, "wd", cc)
            dU = [
                [red(dux, "ww", cc), red(dwx, "uw", cc), red(dwx, "wu", cc)],
                [red(ux, "dw", cc), red(wx, "Du", cc), red(wx, "du_", cc)],
                [red(ux, "wd", cc), red(wx, "ud", cc), red(wx, "uD", cc)],
            ]  # dU[a?][k]: rows indexed [a][k] — see mapping below
            # careful: table above is [row=a][col=k] with
            # a=0: (du ww), (dwx uw), (dwx wu)
            # a=1: (ux dw), (wx Du), (wx du_)
            # a=2: (ux wd), (wx ud), (wx uD)
            for a in range(3):
                for k in range(3):
                    out_ref[base + 3 + a * 3 + k:base + 4 + a * 3 + k] = \
                        dU[a][k]
            dD = [
                [red(ddx_, "ww", cc), red(dwx, "dw", cc),
                 red(dwx, "wd", cc)],
                [red(dwx, "dw", cc), red(wx, "ad", cc), red(wx, "dd", cc)],
                [red(dwx, "wd", cc), red(wx, "dd", cc), red(wx, "da", cc)],
            ]
            for a in range(3):
                for k in range(3):
                    out_ref[base + 12 + a * 3 + k:base + 13 + a * 3 + k] = \
                        dD[a][k]


def sored_tiled_pallas(q, win_planes, chunk_tile, chunk_live,
                       grid: GridConfig, tc: TileConfig, ncomp: int = 3):
    """Per-particle second-order reductions (see transfer_vjp._sored_chunk).

    q (QROWS, NP); win_planes (ntiles, ncomp*16, 256) in the kernels'
    (b,c,yl,zl) column order.  Returns (ncomp*21_pad, NP) rows:
    comp c rows [21c, 21c+3) = <win_c, d_a W>, [21c+3+3a+k] = <win_c,
    d_a U^k>, [21c+12+3a+k] = <win_c, d_a D^k>.
    """
    S = tc.S
    nchunk = chunk_tile.shape[0]
    nrows = ncomp * 21
    nrows_pad = -(-nrows // 8) * 8

    kernel = functools.partial(
        _sored_kernel, S=S, g=float(tc.n_grid), inv_dx=float(grid.inv_dx),
        nt=tc.nt, ncomp=ncomp,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchunk,),
        in_specs=[
            pl.BlockSpec((QROWS, S), lambda c, t, lv: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ncomp * 16, 256), lambda c, t, lv: (t[c], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nrows_pad, S), lambda c, t, lv: (0, c),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nrows_pad, q.shape[1]), jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(chunk_tile, chunk_live, q, win_planes)
