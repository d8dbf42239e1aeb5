"""Hand-written VJPs for the tiled MPM transfers (VERDICT r3 item 3).

The fitting adjoint was the training step's dominant cost: jax.grad through
the XLA planes kernels spends ~1.6 s/step in scatter<->gather transposes
(BASELINE.md).  These custom VJPs exploit the transfers' self-adjoint
structure so the BACKWARD runs on the same fused Pallas kernels as the
forward:

- The cotangent of G2P's grid input is a P2G-shaped scatter: calling the
  forward P2G kernel with transformed per-particle payloads
  (mass 1, v := v-hat_eff, C := C-hat_eff/dx, sigma := grad-hat, dt := -1)
  produces exactly  d gv = sum_p [W v-hat + U^k C-hat_eff + D^k grad-hat].
- The cotangents of P2G's particle inputs are G2P-shaped gathers: calling
  the forward G2P kernel with ext := the window cotangent and F := I
  recovers  <W-hat, W>, <W-hat, U^k> (from the C rows / 4 inv_dx), and
  <W-hat, D^k> (from F_trial - I at dt = 1).
- Only the POSITION gradients' second-order terms (reductions against
  d/dx of the basis products, which need the ddw / du bases the forward
  kernels do not build) run outside the reuse, in the explicit-matmul chunk
  form of sim/tiles.py (_sored_chunk below).

Parity target: the Taichi adjoint kernels the reference hand-drives
(/root/reference/mpm_solver/solver.py:71-90, kernel.grad of
utils.py p2g_opt/g2p_opt).  Gradients are validated against jax.grad of the
einsum reference implementation in tests/test_transfer_vjp.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gsmpm_tpu.sim.state import GridConfig
from gsmpm_tpu.sim.tiles import (
    PAD_LO,
    QROWS,
    RC,
    RF,
    RFT,
    RMASS,
    RVOL,
    RV,
    RX,
    RYIELD,
    T_TILE,
    TileConfig,
    TiledState,
    W_WIN,
    _axis_bases,
    _tile_origin,
    g2p_tiled_ref,
    p2g_tiled_ref,
)


# test hook (VERDICT r4 weak #3): the production TPU adjoint runs the
# Pallas kernels, which CI on CPU would otherwise never execute — setting
# FORCE_PALLAS = True routes the VJP chunks through the kernels in
# interpret mode (pallas_mpm's interpret=_use_interpret() picks it up),
# so tests/test_transfer_vjp.py pins the SAME code path the chip runs.
FORCE_PALLAS = False


def _use_pallas() -> bool:
    return FORCE_PALLAS or jax.default_backend() == "tpu"


def _mk_ts(q, ct, cf, cl):
    """Minimal TiledState for the transfer kernels (aux/material/orig and
    the flags are not consumed by p2g/g2p)."""
    z = jnp.zeros((q.shape[1],), jnp.int32)
    return TiledState(
        q=q, aux=jnp.zeros((1, q.shape[1]), q.dtype), material=z, orig=z,
        chunk_tile=ct, chunk_first=cf, chunk_live=cl,
        need_rebucket=jnp.asarray(False), ok=jnp.asarray(True),
    )


def _p2g_call(ts, sig, grid, tc, dt):
    if _use_pallas():
        from gsmpm_tpu.sim.pallas_mpm import p2g_tiled_pallas

        return p2g_tiled_pallas(ts, sig, grid, tc, dt)
    return p2g_tiled_ref(ts, sig, grid, tc, dt, chunk_impl="mm")


def _g2p_call(ts, ext, grid, tc, dt):
    if _use_pallas():
        from gsmpm_tpu.sim.pallas_mpm import g2p_tiled_pallas

        return g2p_tiled_pallas(ts, ext, grid, tc, dt)
    return g2p_tiled_ref(ts, ext, grid, tc, dt, chunk_impl="mm")


# ---------------------------------------------------------------------------
# second-order basis reductions (the dx terms kernel reuse cannot produce)
# ---------------------------------------------------------------------------

def _axis_bases2(xrow, torg, grid: GridConfig, tc: TileConfig):
    """w, dw, u (as tiles._axis_bases) PLUS ddw and du.

    ddw = d(dw)/dx: the quadratic spline's second derivative is piecewise
    constant {1, -2, 1} * inv_dx^2.  du = d(u)/dx with u = w*(k - fx):
    du = dw*(k - fx) - w*inv_dx  (fx carries inv_dx per unit x).
    Domain clamping folds out-of-range slots onto the boundary cells with
    the same M matrix as the forward bases.
    """
    g = tc.n_grid
    inv_dx = grid.inv_dx
    gp = xrow * inv_dx
    basef = jnp.floor(gp - 0.5)
    fx = gp - basef
    basep = jnp.clip(basef, -1, g - 1).astype(jnp.int32) + PAD_LO
    local = jnp.clip(basep - torg, 0, 13)
    slots = jnp.arange(W_WIN, dtype=jnp.int32)[:, None]
    k = slots - local[None, :]
    kf = k.astype(xrow.dtype)
    w0 = 0.5 * (1.5 - fx) ** 2
    w1 = 0.75 - (fx - 1.0) ** 2
    w2 = 0.5 * (fx - 0.5) ** 2
    w = jnp.where(k == 0, w0[None], jnp.where(k == 1, w1[None],
                                              jnp.where(k == 2, w2[None], 0.0)))
    d0 = (fx - 1.5) * inv_dx
    d1 = -2.0 * (fx - 1.0) * inv_dx
    d2 = (fx - 0.5) * inv_dx
    dw = jnp.where(k == 0, d0[None], jnp.where(k == 1, d1[None],
                                               jnp.where(k == 2, d2[None], 0.0)))
    dd = inv_dx * inv_dx
    ddw = jnp.where(k == 0, dd, jnp.where(k == 1, -2.0 * dd,
                                          jnp.where(k == 2, dd, 0.0)))
    ddw = jnp.broadcast_to(ddw, w.shape).astype(w.dtype)
    u = w * (kf - fx[None, :])
    du = dw * (kf - fx[None, :]) - w * inv_dx
    j = jnp.arange(W_WIN, dtype=jnp.int32)[:, None]
    kk = jnp.arange(W_WIN, dtype=jnp.int32)[None, :]
    tk = jnp.clip(kk + torg, PAD_LO, PAD_LO + g - 1) - torg
    M = (tk == j).astype(w.dtype)
    return M @ w, M @ dw, M @ u, M @ ddw, M @ du


def _sored_chunk(q, win, tid, grid: GridConfig, tc: TileConfig):
    """Second-order reductions of one chunk against a window.

    q: (QROWS, S) real particle rows (positions only are read).
    win: (NCOMP, 16, 256) window planes in [comp][i][(j*16+k)] layout.
    Returns sd[comp][a][k] ((S,) each) with
        sdU[c][a][k] = <win_c, d/dx_a U^k>      U^0 = u w w etc.
        sdD[c][a][k] = <win_c, d/dx_a D^k>      D^0 = dw w w etc.
    and sdW[c][a] = <win_c, d/dx_a W> (= <win_c, D^a>, for convenience).
    """
    torg = _tile_origin(tid, tc)
    wx, dwx, ux, ddx_, dux = _axis_bases2(q[RX + 0], torg[0], grid, tc)
    wy, dwy, uy, ddy_, duy = _axis_bases2(q[RX + 1], torg[1], grid, tc)
    wz, dwz, uz, ddz_, duz = _axis_bases2(q[RX + 2], torg[2], grid, tc)
    S = q.shape[1]
    ncomp = win.shape[0]

    def pair(a16, b16):
        """(16,S) x (16,S) -> (256,S) in the kernels' (b, c, yl, zl) column
        order (pallas_mpm._pair_bc): row (b*2+c)*64 + yl*8 + zl."""
        blocks = []
        for b in (0, 1):
            a_rep = jnp.repeat(a16[b * 8:(b + 1) * 8], T_TILE, axis=0)
            for c in (0, 1):
                b_til = jnp.tile(b16[c * 8:(c + 1) * 8], (T_TILE, 1))
                blocks.append(a_rep * b_til)
        return jnp.concatenate(blocks, axis=0)

    # (y,z) pair tables needed across the d/dx_a {W, U^k, D^k} table
    P = {
        "ww": pair(wy, wz), "dw": pair(dwy, wz), "wd": pair(wy, dwz),
        "uw": pair(uy, wz), "wu": pair(wy, uz),
        "Du": pair(duy, wz), "uD": pair(wy, duz),
        "ad": pair(ddy_, wz), "da": pair(wy, ddz_),
        "dd": pair(dwy, dwz), "ud": pair(uy, dwz), "du_": pair(dwy, uz),
    }
    X = jnp.stack([wx, dwx, ux, ddx_, dux])  # (5, 16, S)

    G = win.reshape(ncomp, 16, 256)

    def mmX(Gc):  # (16,256) -> (5, S, 256)
        return jax.lax.dot_general(
            X, jnp.broadcast_to(Gc, (5,) + Gc.shape),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    def red(A, key):  # (S, 256) x table -> (S,)
        return jnp.sum(A * P[key].T, axis=1)

    XW, XD, XU, XDD, XDU = 0, 1, 2, 3, 4
    out_W, out_U, out_D = [], [], []
    for c in range(ncomp):
        A = mmX(G[c])  # A[x-basis] = (S,256)
        # <win, d_a W>: (dw,w,w), (w,dw,w), (w,w,dw)
        out_W.append([red(A[XD], "ww"), red(A[XW], "dw"), red(A[XW], "wd")])
        # d_a U^k
        dU = [[None] * 3 for _ in range(3)]
        dU[0][0] = red(A[XDU], "ww")   # du w w
        dU[1][0] = red(A[XU], "dw")    # u dw w
        dU[2][0] = red(A[XU], "wd")    # u w dw
        dU[0][1] = red(A[XD], "uw")    # dw u w
        dU[1][1] = red(A[XW], "Du")    # w du w
        dU[2][1] = red(A[XW], "ud")    # w u dw
        dU[0][2] = red(A[XD], "wu")    # dw w u
        dU[1][2] = red(A[XW], "du_")   # w dw u
        dU[2][2] = red(A[XW], "uD")    # w w du
        out_U.append(dU)
        # d_a D^k
        dD = [[None] * 3 for _ in range(3)]
        dD[0][0] = red(A[XDD], "ww")   # ddw w w
        dD[1][0] = red(A[XD], "dw")    # dw dw w
        dD[2][0] = red(A[XD], "wd")    # dw w dw
        dD[0][1] = red(A[XD], "dw")    # dw dw w  (same product)
        dD[1][1] = red(A[XW], "ad")    # w ddw w
        dD[2][1] = red(A[XW], "dd")    # w dw dw
        dD[0][2] = red(A[XD], "wd")    # dw w dw
        dD[1][2] = red(A[XW], "dd")    # w dw dw
        dD[2][2] = red(A[XW], "da")    # w w ddw
        out_D.append(dD)
    return out_W, out_U, out_D


def _sored_all(q, windows, chunk_tile, cl, grid, tc, ncomp):
    """vmap _sored_chunk over chunks; windows (ntiles, NCOMP, 16, 256).

    On TPU the fused Pallas kernel (pallas_mpm.sored_tiled_pallas) computes
    the same reductions with the pair tables resident in VMEM — the XLA
    form below materializes ~4 GB/call of pair tables to HBM and dominated
    the hand-written VJP's cost (BASELINE.md).
    """
    if _use_pallas():
        from gsmpm_tpu.sim.pallas_mpm import sored_tiled_pallas

        nt = windows.shape[0]
        wp = windows.reshape(nt, ncomp * 16, 256)
        rows = sored_tiled_pallas(q, wp, chunk_tile, cl, grid, tc, ncomp)
        W = jnp.stack([
            jnp.stack([rows[21 * c + a] for a in range(3)])
            for c in range(ncomp)
        ])
        U = jnp.stack([
            jnp.stack([
                jnp.stack([rows[21 * c + 3 + 3 * a + k] for k in range(3)])
                for a in range(3)
            ]) for c in range(ncomp)
        ])
        D = jnp.stack([
            jnp.stack([
                jnp.stack([rows[21 * c + 12 + 3 * a + k] for k in range(3)])
                for a in range(3)
            ]) for c in range(ncomp)
        ])
        return W, U, D
    nchunk = chunk_tile.shape[0]
    S = tc.S
    qc = q.reshape(QROWS, nchunk, S).transpose(1, 0, 2)
    wc = windows[chunk_tile]  # (nchunk, NCOMP, 16, 256)

    def one(qk, wk, t):
        oW, oU, oD = _sored_chunk(qk, wk, t, grid, tc)
        W = jnp.stack([jnp.stack(r) for r in oW])          # (ncomp,3,S)
        U = jnp.stack([jnp.stack([jnp.stack(a) for a in r]) for r in oU])
        D = jnp.stack([jnp.stack([jnp.stack(a) for a in r]) for r in oD])
        return W, U, D

    W, U, D = jax.vmap(one)(qc, wc, chunk_tile)
    # back to (ncomp, [3[,3]], NP)
    def backp(x):
        # (nchunk, ..., S) -> (..., nchunk*S)
        perm = tuple(range(1, x.ndim - 1)) + (0, x.ndim - 1)
        return x.transpose(perm).reshape(x.shape[1:-1] + (nchunk * S,))

    return backp(W), backp(U), backp(D)


def _win_to_planes(windows):
    """Octant windows (ntiles, 256, 64) -> per-comp (ntiles, 4, 16, 256).

    Inverse of the kernel's piece layout: octant o = a*4 + bc rows
    [o*32 + comp*8, +8) cols 64*[bc] map to plane[comp][a*8+xl][(bc*64 +
    yl*8 + zl)] with (b,c,yl,zl) column order = bc*64 + yl*8 + zl.
    """
    nt = windows.shape[0]
    w = windows.reshape(nt, 8, 4, 8, 64)  # (t, oct, comp, xl, col)
    a = w.reshape(nt, 2, 4, 4, 8, 64)     # (t, a, bc, comp, xl, col)
    a = a.transpose(0, 3, 1, 4, 2, 5)     # (t, comp, a, xl, bc, col)
    return a.reshape(nt, 4, 16, 256)


def _ext_to_planes(ext):
    """G2P ext (ntiles, 192, 64) -> (ntiles, 3, 16, 256) window planes.

    ext rows = oct*24 + comp*8 + xl with oct = a*4 + b*2 + c; plane layout
    [comp][a*8+xl][((b*2+c)*64 + yl*8 + zl)].
    """
    nt = ext.shape[0]
    w = ext.reshape(nt, 8, 3, 8, 64)      # (t, oct, comp, xl, col)
    a = w.reshape(nt, 2, 4, 3, 8, 64)     # (t, a, bc, comp, xl, col)
    a = a.transpose(0, 3, 1, 4, 2, 5)     # (t, comp, a, xl, bc, col)
    return a.reshape(nt, 3, 16, 256)


# ---------------------------------------------------------------------------
# P2G with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def p2g_fit(q, sig, ct, cf, cl, grid, tc, dt):
    """Differentiable tiled P2G: (q, sig) -> octant windows."""
    return _p2g_call(_mk_ts(q, ct, cf, cl), sig, grid, tc, dt)


def _p2g_fit_fwd(q, sig, ct, cf, cl, grid, tc, dt):
    out = p2g_fit(q, sig, ct, cf, cl, grid, tc, dt)
    return out, (q, sig, ct, cf, cl)


def _p2g_fit_bwd(grid, tc, dt, res, What):
    q, sig, ct, cf, cl = res
    m = q[RMASS]
    vol = q[RVOL]
    valid = m > 0
    dx = grid.dx
    kappa = 4.0 * grid.inv_dx

    # fake-G2P call 1: ext := momentum-cotangent planes, F := I, dt := 1
    # recovers <What_r, W> (v rows), <What_r, U^k> (C rows / kappa),
    # <What_r, D^k> (F_trial - I)
    nt = What.shape[0]
    wp = What.reshape(nt, 8, 4, 8, 64)
    ext1 = wp[:, :, 1:4].reshape(nt, 8 * 3 * T_TILE, T_TILE * T_TILE)
    qf = q
    eyerows = jnp.zeros((QROWS, q.shape[1]), q.dtype)
    for d in (0, 4, 8):
        eyerows = eyerows.at[RF + d].set(1.0)
    qf = jnp.where(
        (jnp.arange(QROWS) >= RF)[:, None]
        & (jnp.arange(QROWS) < RF + 9)[:, None],
        eyerows, q,
    )
    out1 = _g2p_call(_mk_ts(qf, ct, cf, cl), ext1, grid, tc, 1.0)
    Vred = [out1[RV + r] for r in range(3)]
    Ured = [[out1[RC + 3 * r + k] / kappa for k in range(3)] for r in range(3)]
    Dred = [[out1[RFT + 3 * r + k] - (1.0 if k == r else 0.0)
             for k in range(3)] for r in range(3)]

    # fake-G2P call 2: mass-plane cotangent in comp 0 -> <What_0, D^a>
    ext0 = jnp.concatenate(
        [wp[:, :, 0:1], jnp.zeros_like(wp[:, :, 0:2])], axis=2
    ).reshape(nt, 8 * 3 * T_TILE, T_TILE * T_TILE)
    out0 = _g2p_call(_mk_ts(qf, ct, cf, cl), ext0, grid, tc, 1.0)
    D0 = [out0[RFT + 0 + k] - (1.0 if k == 0 else 0.0) for k in range(3)]

    dv = jnp.stack([jnp.where(valid, m * Vred[r], 0.0) for r in range(3)])
    dC = jnp.stack([
        jnp.where(valid, m * dx * Ured[r][k], 0.0)
        for r in range(3) for k in range(3)
    ])
    dsig16 = jnp.zeros_like(sig)
    for r in range(3):
        for k in range(3):
            dsig16 = dsig16.at[3 * r + k].set(
                jnp.where(valid, -dt * vol * Dred[r][k], 0.0)
            )

    # dx: first-order terms from the recovered reductions
    dxa = [jnp.where(valid, m * D0[a], 0.0) for a in range(3)]
    for r in range(3):
        vr = m * q[RV + r]
        for a in range(3):
            dxa[a] = dxa[a] + jnp.where(valid, vr * Dred[r][a], 0.0)
    # dx: second-order terms against d_a U^k and d_a D^k
    win_planes = _win_to_planes(What)[:, 1:4]  # momentum comps only
    _, U2, D2 = _sored_all(q, win_planes, ct, cl, grid, tc, 3)
    for r in range(3):
        for k in range(3):
            cU = m * dx * q[RC + 3 * r + k]
            cD = -dt * vol * sig[3 * r + k]
            for a in range(3):
                dxa[a] = dxa[a] + jnp.where(
                    valid, cU * U2[r, a, k] + cD * D2[r, a, k], 0.0
                )

    dq = jnp.zeros_like(q)
    for a in range(3):
        dq = dq.at[RX + a].set(dxa[a])
        dq = dq.at[RV + a].set(dv[a])
    for i in range(9):
        dq = dq.at[RC + i].set(dC[i])
    zi = np.zeros(ct.shape, dtype=jax.dtypes.float0)
    return dq, dsig16, zi, zi, zi


p2g_fit.defvjp(_p2g_fit_fwd, _p2g_fit_bwd)


# ---------------------------------------------------------------------------
# G2P with custom VJP (fitting semantics: F' written to RFT; RF untouched)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def g2p_fit(q, ext, ct, cf, cl, grid, tc, dt):
    """Differentiable tiled G2P: (q, ext) -> q' (RX/RV/RC/RFT updated)."""
    return _g2p_call(_mk_ts(q, ct, cf, cl), ext, grid, tc, dt)


def _g2p_fit_fwd(q, ext, ct, cf, cl, grid, tc, dt):
    out = g2p_fit(q, ext, ct, cf, cl, grid, tc, dt)
    return out, (q, ext, ct, cf, cl)


def _g2p_fit_bwd(grid, tc, dt, res, ghat):
    q, ext, ct, cf, cl = res
    m = q[RMASS]
    valid = m > 0
    dx = grid.dx
    kappa = 4.0 * grid.inv_dx

    # recover grad_rk = (F'_trial (I basis) ... ) from the forward outputs:
    # F'_rc = F_rc + dt sum_k grad_rk F_kc  cannot be inverted for general
    # F, so recompute grad with a dedicated fake call (F := I, dt := 1)
    eyerows = jnp.zeros((QROWS, q.shape[1]), q.dtype)
    for d in (0, 4, 8):
        eyerows = eyerows.at[RF + d].set(1.0)
    qI = jnp.where(
        (jnp.arange(QROWS) >= RF)[:, None]
        & (jnp.arange(QROWS) < RF + 9)[:, None],
        eyerows, q,
    )
    outI = _g2p_call(_mk_ts(qI, ct, cf, cl), ext, grid, tc, 1.0)
    gradv = [[outI[RFT + 3 * r + k] - (1.0 if k == r else 0.0)
              for k in range(3)] for r in range(3)]

    # effective cotangents
    vhat = [ghat[RV + r] + dt * ghat[RX + r] for r in range(3)]
    # grad-hat_rk = dt * sum_c Fhat'_rc F_kc
    gh = [[dt * sum(ghat[RFT + 3 * r + c] * q[RF + 3 * k + c]
                    for c in range(3)) for k in range(3)] for r in range(3)]
    Chat = [[kappa * ghat[RC + 3 * r + k] for k in range(3)]
            for r in range(3)]

    # d ext: fake-P2G with payloads (m=1, vol=1, v=vhat, C=Chat/dx,
    # sig=grad-hat, dt=-1): mom_r = W vhat_r + U^k Chat_rk + D^k gh_rk
    qf = q
    qf = qf.at[RMASS].set(valid.astype(q.dtype))
    qf = qf.at[RVOL].set(valid.astype(q.dtype))
    for r in range(3):
        qf = qf.at[RV + r].set(jnp.where(valid, vhat[r], 0.0))
        for k in range(3):
            qf = qf.at[RC + 3 * r + k].set(
                jnp.where(valid, Chat[r][k] / dx, 0.0)
            )
    sigf = jnp.zeros((16, q.shape[1]), q.dtype)
    for r in range(3):
        for k in range(3):
            sigf = sigf.at[3 * r + k].set(jnp.where(valid, gh[r][k], 0.0))
    win = _p2g_call(_mk_ts(qf, ct, cf, cl), sigf, grid, tc, -1.0)
    nt = win.shape[0]
    wp = win.reshape(nt, 8, 4, 8, 64)
    dext = wp[:, :, 1:4].reshape(nt, 8 * 3 * T_TILE, T_TILE * T_TILE)

    # F'_rc = sum_k (delta_rk + dt grad_rk) F_kc (valid), F_kc (invalid);
    # RF rows pass through unchanged.  So
    #   dF_kc = Fhat_RF_kc + Fhat_RFT_kc + valid * dt sum_r grad_rk Fhat_RFT_rc
    dF = []
    for k in range(3):
        for c in range(3):
            acc = (
                ghat[RF + 3 * k + c]
                + ghat[RFT + 3 * k + c]
                + jnp.where(
                    valid,
                    dt * sum(gradv[r][k] * ghat[RFT + 3 * r + c]
                             for r in range(3)),
                    0.0,
                )
            )
            dF.append(acc)

    # dx: identity + first-order (v-hat against D^a) + second-order
    dxa = [ghat[RX + a] * 0.0 for a in range(3)]
    # first-order: sum_r vhat_r <gv_r, d_a W> = sum_r vhat_r grad_v[r][a]
    for r in range(3):
        for a in range(3):
            dxa[a] = dxa[a] + jnp.where(valid, vhat[r] * gradv[r][a], 0.0)
    ext_planes = _ext_to_planes(ext)
    _, U2, D2 = _sored_all(q, ext_planes, ct, cl, grid, tc, 3)
    for r in range(3):
        for k in range(3):
            for a in range(3):
                dxa[a] = dxa[a] + jnp.where(
                    valid,
                    Chat[r][k] * U2[r, a, k] + gh[r][k] * D2[r, a, k],
                    0.0,
                )

    dq = jnp.zeros_like(q)
    for a in range(3):
        dq = dq.at[RX + a].set(ghat[RX + a] + dxa[a])
    for i in range(9):
        dq = dq.at[RF + i].set(dF[i])
    # passthrough rows (mass, vol, yield, ...) carry their cotangents
    dq = dq.at[RMASS].set(ghat[RMASS])
    dq = dq.at[RVOL].set(ghat[RVOL])
    dq = dq.at[RYIELD].set(ghat[RYIELD])
    # invalid slots: G2P passes x, F through; v/C zeroed
    for a in range(3):
        dq = dq.at[RX + a].set(
            jnp.where(valid, dq[RX + a], ghat[RX + a])
        )
    zi = np.zeros(ct.shape, dtype=jax.dtypes.float0)
    return dq, dext, zi, zi, zi


g2p_fit.defvjp(_g2p_fit_fwd, _g2p_fit_bwd)
