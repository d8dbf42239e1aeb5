"""Tile-bucketed separable MPM transfer — TPU-native hot path.

See TILED_DESIGN.md (this directory) for the full design rationale.  Summary:
XLA scatter/gather on TPU is index-bound (~9 ns/index), so the P2G/G2P
transfers (parity /root/reference/mpm_solver/utils.py:89-134,218-282) are
reformulated with **no random access**: particles are bucketed into 8-cell
grid tiles, each tile owning a 16^3-cell window, and the quadratic-B-spline
tensor-product structure turns both transfers into dense per-chunk matmuls
(MXU) plus static window folds (streaming).

This module holds everything that is NOT the Pallas kernel: tile geometry,
the packed particle layout, rebucketing, window fold/extract, the pure-JAX
reference implementation of the per-chunk math (used on CPU and as the
golden model for the Pallas kernels in sim/pallas_mpm.py), and the substep
driver.

The tiled path is forward-only; the differentiable fitting path keeps the
XLA transfer in sim/kernels.py.
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass, field
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gsmpm_tpu.ops.constitutive import compute_stress_soa
from gsmpm_tpu.sim.state import GridConfig, MPMModel
from gsmpm_tpu.sim.kernels import SoAState, grid_update_soa

# packed q row indices
RX = 0       # 0..2   position (grid coords)
RV = 3       # 3..5   velocity
RC = 6       # 6..14  APIC C (row-major)
RF = 15      # 15..23 F (post return-map)
RFT = 24     # 24..32 F_trial
RMASS = 33
RVOL = 34
RYIELD = 35
RDRIFT = 36  # scratch: G2P writes per-particle drift flag here
QROWS = 40

# aux row indices (per-particle material params, permuted with q)
AMU, ALAM, AVISC = 0, 1, 2
AUXROWS = 8

T_TILE = 8     # cells per tile per axis
W_WIN = 16     # window cells per axis (= 2 padded-grid tiles)
PAD_LO = 4     # padded coord = cell + PAD_LO; window origin of tile t = 8t
LOCAL_MIN, LOCAL_MAX = 0, 13       # valid base slots inside a window
SAFE_MIN, SAFE_MAX = 1, 12         # drift trigger outside this range


class TileConfig(NamedTuple):
    """Static tiling geometry for a given (n_grid, n_particles)."""

    n_grid: int
    n_particles: int
    S: int = 256            # chunk rows (particles per kernel step)
    n_occ_cap: int = 0      # max occupied tiles (0 = ntiles)

    @property
    def nt(self) -> int:    # tiles per axis
        return -(-self.n_grid // T_TILE)

    @property
    def ntiles(self) -> int:
        return self.nt ** 3

    @property
    def occ_cap(self) -> int:
        return self.n_occ_cap or self.ntiles

    @property
    def nchunk(self) -> int:
        return -(-self.n_particles // self.S) + self.occ_cap

    @property
    def np_rows(self) -> int:  # padded particle slots
        return self.nchunk * self.S

    @property
    def pad_axis(self) -> int:  # padded grid cells per axis
        return (self.nt + 1) * T_TILE


def default_tile_config(n_grid: int, n_particles: int) -> TileConfig:
    nt = -(-n_grid // T_TILE)
    # cap occupied tiles so NP stays bounded for big grids; rebucket reports
    # overflow and the caller falls back to the XLA path
    cap = min(nt ** 3, max(512, 4 * max(1, n_particles // 256)))
    return TileConfig(n_grid, n_particles, S=256, n_occ_cap=cap)


@jax.tree_util.register_dataclass
@dataclass
class TiledState:
    """Scan-carried particle state in tile-sorted packed layout."""

    q: jnp.ndarray            # (QROWS, NP) f32
    aux: jnp.ndarray          # (AUXROWS, NP) f32: mu, lam, viscosity
    material: jnp.ndarray     # (NP,) int32
    orig: jnp.ndarray         # (NP,) int32 original index, -1 = padding
    chunk_tile: jnp.ndarray   # (NCHUNK,) int32
    chunk_first: jnp.ndarray  # (NCHUNK,) int32 (1 = first chunk of its tile)
    chunk_live: jnp.ndarray   # (NCHUNK,) int32 (1 = holds real slots)
    need_rebucket: jnp.ndarray  # () bool
    ok: jnp.ndarray           # () bool — tiled layout valid (occ <= cap)


# ---------------------------------------------------------------------------
# pack / unpack
# ---------------------------------------------------------------------------

def pack_q(soa: SoAState) -> jnp.ndarray:
    """SoA planes -> (QROWS, N) packed matrix."""
    rows = (
        list(soa.x) + list(soa.v) + list(soa.C) + list(soa.F)
        + list(soa.F_trial)
        + [soa.mass, soa.vol, soa.yield_stress]
    )
    n = soa.mass.shape[0]
    q = jnp.stack(rows + [jnp.zeros_like(soa.mass)] * (QROWS - len(rows)))
    return q


def unpack_q(q: jnp.ndarray, soa_template: SoAState) -> SoAState:
    """(QROWS, N) in ORIGINAL order -> SoAState (cov/init_cov from template)."""
    return soa_template._replace(
        x=tuple(q[RX + i] for i in range(3)),
        v=tuple(q[RV + i] for i in range(3)),
        C=tuple(q[RC + i] for i in range(9)),
        F=tuple(q[RF + i] for i in range(9)),
        F_trial=tuple(q[RFT + i] for i in range(9)),
        mass=q[RMASS],
        vol=q[RVOL],
        yield_stress=q[RYIELD],
    )


def to_original_order(ts: TiledState, n: int) -> jnp.ndarray:
    """Gathers ts.q back to original particle order -> (QROWS, n)."""
    idx = jnp.where(ts.orig >= 0, ts.orig, n)
    out = jnp.zeros((QROWS, n + 1), ts.q.dtype).at[:, idx].set(ts.q)
    return out[:, :n]


# ---------------------------------------------------------------------------
# rebucketing
# ---------------------------------------------------------------------------

def _pad_pattern(tc: TileConfig, grid: GridConfig, slot_tile: jnp.ndarray):
    """Default q columns for padding slots: tile-center x, F=I, mass=0."""
    nt = tc.nt
    t3 = jnp.stack([
        slot_tile // (nt * nt), (slot_tile // nt) % nt, slot_tile % nt
    ])  # (3, NP)
    x = (t3.astype(jnp.float32) * T_TILE + T_TILE / 2 + 0.5) * grid.dx
    pat = jnp.zeros((QROWS, slot_tile.shape[0]), jnp.float32)
    pat = pat.at[RX:RX + 3].set(x)
    for d in (0, 4, 8):
        pat = pat.at[RF + d].set(1.0)
        pat = pat.at[RFT + d].set(1.0)
    return pat


def rebucket(ts: TiledState, grid: GridConfig, tc: TileConfig) -> TiledState:
    """Sort particles into tile buckets with S-aligned per-tile ranges."""
    g, nt, S, NP = tc.n_grid, tc.nt, tc.S, tc.np_rows
    ntiles = tc.ntiles
    x = ts.q[RX:RX + 3]
    valid = ts.orig >= 0

    cell = jnp.clip(jnp.floor(x * grid.inv_dx), 0, g - 1).astype(jnp.int32)
    t3 = cell // T_TILE
    tid = (t3[0] * nt + t3[1]) * nt + t3[2]
    tid = jnp.where(valid, tid, ntiles)

    counts = jnp.zeros((ntiles + 1,), jnp.int32).at[tid].add(1)
    occ = counts[:ntiles] > 0
    n_occ = jnp.sum(occ.astype(jnp.int32))
    ok = n_occ <= tc.occ_cap

    padded = -(-counts[:ntiles] // S) * S
    dst_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)]
    )  # (ntiles+1,)
    total_used = dst_start[-1]

    order = jnp.argsort(tid, stable=True)
    tid_sorted = tid[order]
    first_pos = jnp.searchsorted(tid_sorted, jnp.arange(ntiles + 1))
    rank = jnp.arange(NP, dtype=jnp.int32) - first_pos[
        jnp.clip(tid_sorted, 0, ntiles)
    ].astype(jnp.int32)
    valid_sorted = tid_sorted < ntiles
    dest = jnp.where(
        valid_sorted, dst_start[jnp.clip(tid_sorted, 0, ntiles - 1)] + rank, NP
    )

    src = jnp.full((NP,), -1, jnp.int32).at[dest].set(
        order.astype(jnp.int32), mode="drop"
    )
    has_src = src >= 0
    src_c = jnp.clip(src, 0, NP - 1)

    # chunk -> tile first (searchsorted over nchunk positions, not NP slots),
    # then slot_tile by repeat: slot s lives in chunk s // S
    cpos = jnp.arange(tc.nchunk, dtype=jnp.int32) * S
    chunk_tile0 = jnp.clip(
        jnp.searchsorted(dst_start, cpos, side="right") - 1,
        0, ntiles - 1,
    ).astype(jnp.int32)
    slot_tile = jnp.repeat(chunk_tile0, S)

    pat = _pad_pattern(tc, grid, slot_tile)
    new_q = jnp.where(has_src[None, :], ts.q[:, src_c], pat)
    new_aux = jnp.where(has_src[None, :], ts.aux[:, src_c], 0.0)
    new_mat = jnp.where(has_src, ts.material[src_c], 0)
    new_orig = jnp.where(has_src, ts.orig[src_c], -1)

    # chunk tables
    active = cpos < total_used
    last_tile = slot_tile[jnp.clip(total_used - 1, 0, NP - 1)]
    chunk_tile = jnp.where(active, chunk_tile0, last_tile).astype(jnp.int32)
    chunk_first = (
        active & (cpos == dst_start[jnp.clip(chunk_tile, 0, ntiles - 1)])
    ).astype(jnp.int32)

    return TiledState(
        q=new_q, aux=new_aux, material=new_mat, orig=new_orig,
        chunk_tile=chunk_tile, chunk_first=chunk_first,
        chunk_live=active.astype(jnp.int32),
        need_rebucket=jnp.asarray(False),
        ok=jnp.asarray(ok),
    )


def bootstrap(
    soa: SoAState, model: MPMModel, grid: GridConfig, tc: TileConfig
) -> TiledState:
    """Initial TiledState from SoA state + per-particle model params."""
    n, NP = tc.n_particles, tc.np_rows
    q = pack_q(soa)
    q = jnp.pad(q, ((0, 0), (0, NP - n)))
    aux = jnp.zeros((AUXROWS, NP), jnp.float32)
    aux = aux.at[AMU, :n].set(model.mu)
    aux = aux.at[ALAM, :n].set(model.lam)
    aux = aux.at[AVISC, :n].set(model.viscosity)
    material = jnp.pad(model.material.astype(jnp.int32), (0, NP - n))
    orig = jnp.concatenate([
        jnp.arange(n, dtype=jnp.int32),
        jnp.full((NP - n,), -1, jnp.int32),
    ])
    ts = TiledState(
        q=q, aux=aux, material=material, orig=orig,
        chunk_tile=jnp.zeros((tc.nchunk,), jnp.int32),
        chunk_first=jnp.zeros((tc.nchunk,), jnp.int32),
        chunk_live=jnp.zeros((tc.nchunk,), jnp.int32),
        need_rebucket=jnp.asarray(False), ok=jnp.asarray(True),
    )
    return rebucket(ts, grid, tc)


# ---------------------------------------------------------------------------
# window fold / extract (XLA, static shapes)
# ---------------------------------------------------------------------------

def fold_windows(windows: jnp.ndarray, tc: TileConfig) -> jnp.ndarray:
    """Octant P2G windows (ntiles, 256, 64) -> blocked grid (T,T,T,32,64).

    Octant o = a*4+b*2+c of tile t (rows [o*32, o*32+32), row comp*8+xl,
    col yl*8+zl) belongs entirely to padded-grid tile t+(a,b,c), so the
    fold is 8 in-order slice adds -- no transposes, no relayouts. Domain
    boundary clamping already happened inside the transfer kernels (clamp
    matrix), so there is no pad folding here.
    """
    nt, T = tc.nt, tc.nt + 1
    acc = jnp.zeros((T, T, T, 4 * T_TILE, T_TILE * T_TILE), windows.dtype)
    o = 0
    for a in (0, 1):
        for b in (0, 1):
            for c in (0, 1):
                oc = windows[:, o * 32:(o + 1) * 32, :].reshape(
                    nt, nt, nt, 4 * T_TILE, T_TILE * T_TILE
                )
                acc = acc.at[a:a + nt, b:b + nt, c:c + nt].add(oc)
                o += 1
    return acc


def extract_windows(gvb: jnp.ndarray, tc: TileConfig) -> jnp.ndarray:
    """Blocked grid velocities (T,T,T,24,64) -> octant blocks (ntiles,192,64).

    Inverse addressing of fold_windows: tile t's G2P input stacks the 8
    padded-grid tiles t+(a,b,c) (rows oct*24 + comp*8 + xl, col yl*8+zl).
    Pure in-order slices + one concat -- no transposes.
    """
    nt = tc.nt
    parts = []
    for a in (0, 1):
        for b in (0, 1):
            for c in (0, 1):
                parts.append(
                    gvb[a:a + nt, b:b + nt, c:c + nt].reshape(
                        tc.ntiles, 3 * T_TILE, T_TILE * T_TILE
                    )
                )
    return jnp.concatenate(parts, axis=1)


# ---------------------------------------------------------------------------
# per-chunk separable transfer math — pure-JAX reference implementation
# ---------------------------------------------------------------------------

def _axis_bases(xrow, torg, grid: GridConfig, tc: TileConfig):
    """Per-axis 16-slot spline bases for one chunk.

    xrow: (S,) positions along the axis; torg: window origin in cells
    (= 8*tile_coord - PAD_LO ... expressed so that local slot = padded base
    - 8*tile).  Returns (w, dw, u) each (16, S); dw is inv_dx-scaled, u is
    the unscaled APIC moment basis w*(i - fx).
    """
    g = tc.n_grid
    gp = xrow * grid.inv_dx
    basef = jnp.floor(gp - 0.5)
    fx = gp - basef
    basep = jnp.clip(basef, -1, g - 1).astype(jnp.int32) + PAD_LO
    local = jnp.clip(basep - torg, LOCAL_MIN, LOCAL_MAX)
    slots = jnp.arange(W_WIN, dtype=jnp.int32)[:, None]
    k = slots - local[None, :]
    kf = k.astype(xrow.dtype)
    w0 = 0.5 * (1.5 - fx) ** 2
    w1 = 0.75 - (fx - 1.0) ** 2
    w2 = 0.5 * (fx - 0.5) ** 2
    w = jnp.where(
        k == 0, w0[None], jnp.where(k == 1, w1[None],
                                    jnp.where(k == 2, w2[None], 0.0))
    )
    d0 = (fx - 1.5) * grid.inv_dx
    d1 = -2.0 * (fx - 1.0) * grid.inv_dx
    d2 = (fx - 0.5) * grid.inv_dx
    dw = jnp.where(
        k == 0, d0[None], jnp.where(k == 1, d1[None],
                                    jnp.where(k == 2, d2[None], 0.0))
    )
    u = w * (kf - fx[None, :])
    # domain-boundary clamp: fold out-of-domain stencil weight onto the
    # boundary cell (slot torg+k clips to core [PAD_LO, PAD_LO+g-1]);
    # mirrors the reference's implicit OOB clamp (utils.py:114)
    j = jnp.arange(W_WIN, dtype=jnp.int32)[:, None]
    kk = jnp.arange(W_WIN, dtype=jnp.int32)[None, :]
    tk = jnp.clip(kk + torg, PAD_LO, PAD_LO + g - 1) - torg
    M = (tk == j).astype(w.dtype)
    return M @ w, M @ dw, M @ u, fx


def _tile_origin(tid, tc: TileConfig):
    nt = tc.nt
    t3 = (tid // (nt * nt), (tid // nt) % nt, tid % nt)
    return tuple(t * T_TILE for t in t3)  # window origin in padded coords


def p2g_chunk_ref(q, sig, tid, grid: GridConfig, tc: TileConfig, dt):
    """One chunk's P2G octant window: q (QROWS,S), sig (16,S) -> (256, 64).

    Row = oct*32 + comp*8 + xl with oct = a*4+b*2+c, col = yl*8+zl. Same
    separable term structure as the Pallas kernel (TILED_DESIGN.md);
    einsum stands in for the MXU matmuls.
    """
    torg = _tile_origin(tid, tc)
    wx, dwx, uxa, _ = _axis_bases(q[RX + 0], torg[0], grid, tc)
    wy, dwy, uya, _ = _axis_bases(q[RX + 1], torg[1], grid, tc)
    wz, dwz, uza, _ = _axis_bases(q[RX + 2], torg[2], grid, tc)
    m = q[RMASS]
    vol = q[RVOL]
    dx = grid.dx

    def tri(ax, ay, az, coef):
        return jnp.einsum("is,js,ks,s->ijk", ax, ay, az, coef)

    win = [tri(wx, wy, wz, m)]
    for r in range(3):
        mom = tri(wx, wy, wz, m * q[RV + r])
        mom += tri(uxa, wy, wz, m * dx * q[RC + 3 * r + 0])
        mom += tri(wx, uya, wz, m * dx * q[RC + 3 * r + 1])
        mom += tri(wx, wy, uza, m * dx * q[RC + 3 * r + 2])
        mom += tri(dwx, wy, wz, -dt * vol * sig[3 * r + 0])
        mom += tri(wx, dwy, wz, -dt * vol * sig[3 * r + 1])
        mom += tri(wx, wy, dwz, -dt * vol * sig[3 * r + 2])
        win.append(mom)
    # (4,16,16,16) -> octant rows (a,b,c,comp,xl) x cols (yl,zl)
    w4 = jnp.stack(win).reshape(4, 2, T_TILE, 2, T_TILE, 2, T_TILE)
    return w4.transpose(1, 3, 5, 0, 2, 4, 6).reshape(
        8 * 4 * T_TILE, T_TILE * T_TILE
    )


def g2p_chunk_ref(q, ext, tid, grid: GridConfig, tc: TileConfig, dt):
    """One chunk's G2P: q (QROWS,S), octant grid ext (192,64) -> new q."""
    torg = _tile_origin(tid, tc)
    wx, dwx, uxa, _ = _axis_bases(q[RX + 0], torg[0], grid, tc)
    wy, dwy, uya, _ = _axis_bases(q[RX + 1], torg[1], grid, tc)
    wz, dwz, uza, _ = _axis_bases(q[RX + 2], torg[2], grid, tc)
    gv = ext.reshape(2, 2, 2, 3, T_TILE, T_TILE, T_TILE).transpose(
        3, 0, 4, 1, 5, 2, 6
    ).reshape(3, W_WIN, W_WIN, W_WIN)

    def tri(r, ax, ay, az):
        return jnp.einsum("ijk,is,js,ks->s", gv[r], ax, ay, az)

    new_v = [tri(r, wx, wy, wz) for r in range(3)]
    grad = [[tri(r, dwx, wy, wz), tri(r, wx, dwy, wz), tri(r, wx, wy, dwz)]
            for r in range(3)]
    coef = 4.0 * grid.inv_dx
    new_C = [[coef * tri(r, uxa, wy, wz), coef * tri(r, wx, uya, wz),
              coef * tri(r, wx, wy, uza)] for r in range(3)]

    valid = q[RMASS] > 0
    dt_ = jnp.asarray(dt, q.dtype)
    new_x = [q[RX + a] + dt_ * new_v[a] for a in range(3)]
    # F_trial = (I + dt grad) @ F
    eye = np.eye(3)
    Ft = []
    for r in range(3):
        for c in range(3):
            acc = 0.0
            for k in range(3):
                gk = grad[r][k] * dt_ + (1.0 if k == r else 0.0)
                acc = acc + gk * q[RF + 3 * k + c]
            Ft.append(acc)

    out = q
    for a in range(3):
        out = out.at[RX + a].set(jnp.where(valid, new_x[a], q[RX + a]))
        out = out.at[RV + a].set(jnp.where(valid, new_v[a], 0.0))
    for r in range(3):
        for c in range(3):
            out = out.at[RC + 3 * r + c].set(
                jnp.where(valid, new_C[r][c], 0.0)
            )
            out = out.at[RFT + 3 * r + c].set(
                jnp.where(valid, Ft[3 * r + c], q[RF + 3 * r + c])
            )
    # drift flag on the advected position
    g = tc.n_grid
    drift = jnp.zeros_like(q[RMASS], dtype=bool)
    for a in range(3):
        gp = out[RX + a] * grid.inv_dx
        basep = jnp.clip(jnp.floor(gp - 0.5), -1, g - 1).astype(jnp.int32) \
            + PAD_LO
        local = basep - torg[a]
        drift = drift | (local < SAFE_MIN) | (local > SAFE_MAX)
    out = out.at[RDRIFT].set((valid & drift).astype(q.dtype))
    return out


def p2g_chunk_mm(q, sig, tid, grid: GridConfig, tc: TileConfig, dt):
    """p2g_chunk_ref restructured as explicit matmuls over shared pair
    tables (the MXU-shaped contraction order the Pallas kernel uses).

    Grouping the 7 separable terms per momentum component by their x-basis
    turns the window into
        win_r = wx @ W1_r^T + (uxa*c_r0 + dwx*s_r0) @ ww^T
    with W1_r a per-s-scaled combination of five (256, S) y/z pair tables
    shared across components.  jnp.einsum's pairwise contraction of the
    same math materializes (16, 16, S) intermediates per term (28 of them)
    — measured 20 ms/substep vs this form's matmul-bound cost.  The
    jax.grad transpose of a matmul is a matmul, which is why the
    differentiable fitting path routes through this implementation.
    """
    torg = _tile_origin(tid, tc)
    wx, dwx, uxa, _ = _axis_bases(q[RX + 0], torg[0], grid, tc)
    wy, dwy, uya, _ = _axis_bases(q[RX + 1], torg[1], grid, tc)
    wz, dwz, uza, _ = _axis_bases(q[RX + 2], torg[2], grid, tc)
    m = q[RMASS]
    vol = q[RVOL]
    dx = grid.dx
    S = q.shape[1]

    def pair(a, b):  # (16,S),(16,S) -> (256_jk, S)
        return (a[:, None, :] * b[None, :, :]).reshape(16 * 16, S)

    ww = pair(wy, wz)
    uw = pair(uya, wz)
    wu = pair(wy, uza)
    dw = pair(dwy, wz)
    wd = pair(wy, dwz)

    def mm(x16, w256):  # (16,S) @ (256,S)^T -> (16,256)
        return jax.lax.dot_general(
            x16, w256, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    win = [mm(wx, ww * m[None, :])]
    for r in range(3):
        c0 = m * dx * q[RC + 3 * r + 0]
        c1 = m * dx * q[RC + 3 * r + 1]
        c2 = m * dx * q[RC + 3 * r + 2]
        s0 = -dt * vol * sig[3 * r + 0]
        s1 = -dt * vol * sig[3 * r + 1]
        s2 = -dt * vol * sig[3 * r + 2]
        w1 = (ww * (m * q[RV + r])[None, :] + uw * c1[None, :]
              + wu * c2[None, :] + dw * s1[None, :] + wd * s2[None, :])
        x2 = uxa * c0[None, :] + dwx * s0[None, :]
        win.append(mm(wx, w1) + mm(x2, ww))
    w4 = jnp.stack(win).reshape(4, 16, 16, 16).reshape(
        4, 2, T_TILE, 2, T_TILE, 2, T_TILE
    )
    return w4.transpose(1, 3, 5, 0, 2, 4, 6).reshape(
        8 * 4 * T_TILE, T_TILE * T_TILE
    )


def g2p_chunk_mm(q, ext, tid, grid: GridConfig, tc: TileConfig, dt):
    """g2p_chunk_ref restructured as matmuls + pair-table row reductions
    (see p2g_chunk_mm).  Per velocity component r the three contractions
        A_r = wx^T G_r,  B_r = dwx^T G_r,  U_r = uxa^T G_r   ((S, 256))
    feed every output: v_r = <A_r, ww>, grad = (<B_r, ww>, <A_r, dw>,
    <A_r, wd>), C_r = 4 inv_dx (<U_r, ww>, <A_r, uw>, <A_r, wu>), with
    <X, P> the per-row dot against a (256, S) pair table."""
    torg = _tile_origin(tid, tc)
    wx, dwx, uxa, _ = _axis_bases(q[RX + 0], torg[0], grid, tc)
    wy, dwy, uya, _ = _axis_bases(q[RX + 1], torg[1], grid, tc)
    wz, dwz, uza, _ = _axis_bases(q[RX + 2], torg[2], grid, tc)
    S = q.shape[1]
    gv = ext.reshape(2, 2, 2, 3, T_TILE, T_TILE, T_TILE).transpose(
        3, 0, 4, 1, 5, 2, 6
    ).reshape(3, W_WIN, W_WIN * W_WIN)  # (3, 16_i, 256_jk)

    def pair(a, b):
        return (a[:, None, :] * b[None, :, :]).reshape(16 * 16, S)

    ww = pair(wy, wz)
    uw = pair(uya, wz)
    wu = pair(wy, uza)
    dw = pair(dwy, wz)
    wd = pair(wy, dwz)

    X = jnp.stack([wx, dwx, uxa])  # (3, 16, S)

    def mm3(G):  # (16,256) -> (3, S, 256): [wx^T G, dwx^T G, uxa^T G]
        return jax.lax.dot_general(
            X, jnp.broadcast_to(G, (3,) + G.shape),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    def red(A, P):  # (S, 256) x (256, S) -> (S,)
        return jnp.sum(A * P.T, axis=1)

    new_v, grad, new_C = [], [], []
    coef = 4.0 * grid.inv_dx
    for r in range(3):
        A, B, U = mm3(gv[r])
        new_v.append(red(A, ww))
        grad.append([red(B, ww), red(A, dw), red(A, wd)])
        new_C.append([coef * red(U, ww), coef * red(A, uw),
                      coef * red(A, wu)])

    valid = q[RMASS] > 0
    dt_ = jnp.asarray(dt, q.dtype)
    new_x = [q[RX + a] + dt_ * new_v[a] for a in range(3)]
    Ft = []
    for r in range(3):
        for c in range(3):
            acc = 0.0
            for k in range(3):
                gk = grad[r][k] * dt_ + (1.0 if k == r else 0.0)
                acc = acc + gk * q[RF + 3 * k + c]
            Ft.append(acc)

    out = q
    for a in range(3):
        out = out.at[RX + a].set(jnp.where(valid, new_x[a], q[RX + a]))
        out = out.at[RV + a].set(jnp.where(valid, new_v[a], 0.0))
    for r in range(3):
        for c in range(3):
            out = out.at[RC + 3 * r + c].set(
                jnp.where(valid, new_C[r][c], 0.0)
            )
            out = out.at[RFT + 3 * r + c].set(
                jnp.where(valid, Ft[3 * r + c], q[RF + 3 * r + c])
            )
    g = tc.n_grid
    drift = jnp.zeros_like(q[RMASS], dtype=bool)
    for a in range(3):
        gp = out[RX + a] * grid.inv_dx
        basep = jnp.clip(jnp.floor(gp - 0.5), -1, g - 1).astype(jnp.int32) \
            + PAD_LO
        local = basep - torg[a]
        drift = drift | (local < SAFE_MIN) | (local > SAFE_MAX)
    out = out.at[RDRIFT].set((valid & drift).astype(q.dtype))
    return out


def p2g_tiled_ref(ts: TiledState, sig: jnp.ndarray, grid, tc: TileConfig, dt,
                  chunk_impl: str = "ref"):
    """All chunks via vmap; returns octant windows (ntiles, 256, 64)."""
    chunk = p2g_chunk_mm if chunk_impl == "mm" else p2g_chunk_ref
    nchunk = ts.chunk_tile.shape[0]
    qc = ts.q.reshape(QROWS, nchunk, tc.S).transpose(1, 0, 2)
    sc = sig.reshape(16, nchunk, tc.S).transpose(1, 0, 2)
    cw = jax.vmap(
        lambda q, s, t: chunk(q, s, t, grid, tc, dt)
    )(qc, sc, ts.chunk_tile)
    return jnp.zeros(
        (tc.ntiles, 8 * 4 * T_TILE, T_TILE * T_TILE), cw.dtype
    ).at[ts.chunk_tile].add(cw)


def g2p_tiled_ref(ts: TiledState, windows: jnp.ndarray, grid, tc, dt,
                  chunk_impl: str = "ref"):
    chunk = g2p_chunk_mm if chunk_impl == "mm" else g2p_chunk_ref
    nchunk = ts.chunk_tile.shape[0]
    qc = ts.q.reshape(QROWS, nchunk, tc.S).transpose(1, 0, 2)
    wc = windows[ts.chunk_tile]
    out = jax.vmap(
        lambda q, w, t: chunk(q, w, t, grid, tc, dt)
    )(qc, wc, ts.chunk_tile)
    return out.transpose(1, 0, 2).reshape(QROWS, ts.q.shape[1])


# ---------------------------------------------------------------------------
# substep driver
# ---------------------------------------------------------------------------

def substep_tiled(
    ts: TiledState,
    model: MPMModel,
    bcs,
    time,
    grid: GridConfig,
    tc: TileConfig,
    dt: float,
    impl: str = "ref",
    axis_name=None,
    rebucket_on_drift: bool = True,
    grid_reduce=None,
    grid_exchange=None,
) -> TiledState:
    """One MLS-MPM substep in the tiled layout.

    Same op order as sim/kernels.py:substep_soa (parity
    /root/reference/mpm_solver/solver.py:27-52): particle BCs -> stress ->
    P2G -> grid update/BCs -> G2P.

    axis_name: chunk-sharded multi-device mode (parallel/tiled_sharded.py)
    -- the folded grid is psum-reduced across the mesh axis; rebucketing is
    the sharded caller's responsibility (rebucket_on_drift=False).

    grid_reduce / grid_exchange: spatial-decomposition hooks
    (parallel/halo_tiled.py) — grid_reduce(acc) replaces the full-grid psum
    with a neighbor halo accumulation on the blocked (T,T,T,32,64) layout;
    grid_exchange(grid_v) masks non-owned tiles and fetches owner-computed
    boundary velocities after the grid update + BCs.
    """
    if rebucket_on_drift:
        ts = jax.lax.cond(
            ts.need_rebucket, lambda s: rebucket(s, grid, tc), lambda s: s, ts
        )

    q = ts.q
    # particle-phase BCs (impulse) on the packed rows
    if bcs.particle_ops:
        x_aos = q[RX:RX + 3].T
        v_aos = q[RV:RV + 3].T
        for op in bcs.particle_ops:
            v_aos = op.apply_particles(x_aos, v_aos, q[RMASS], time, dt)
        q = q.at[RV:RV + 3].set(v_aos.T)

    # stress (XLA elementwise; cheap)
    F_trial = tuple(q[RFT + i] for i in range(9))
    new_F, stress, new_yield = compute_stress_soa(
        F_trial, ts.material, ts.aux[AMU], ts.aux[ALAM], q[RYIELD],
        model.alpha, model.hardening, model.xi, model.plastic_viscosity,
        model.softening, dt, active_materials=model.active_materials,
    )
    for i in range(9):
        q = q.at[RF + i].set(new_F[i])
    q = q.at[RYIELD].set(new_yield)
    sig = jnp.concatenate([
        jnp.stack(stress), jnp.zeros((16 - 9, q.shape[1]), q.dtype)
    ])
    ts = dataclasses.replace(ts, q=q)

    # P2G -> octant windows -> fold -> blocked grid (T,T,T,32,64)
    if impl == "pallas":
        from gsmpm_tpu.sim.pallas_mpm import g2p_tiled_pallas, p2g_tiled_pallas

        windows = p2g_tiled_pallas(ts, sig, grid, tc, dt)
    else:
        windows = p2g_tiled_ref(ts, sig, grid, tc, dt)
    acc = fold_windows(windows, tc)
    if grid_reduce is not None:
        # spatial-decomposition hook (parallel/halo_tiled.py): accumulate
        # only the boundary x-tile slabs from slab neighbors instead of a
        # full-grid psum
        acc = grid_reduce(acc)
    elif axis_name is not None:
        acc = jax.lax.psum(acc, axis_name)
    grid_v = grid_update_soa(
        acc[:, :, :, 0:T_TILE],
        (acc[:, :, :, T_TILE:2 * T_TILE],
         acc[:, :, :, 2 * T_TILE:3 * T_TILE],
         acc[:, :, :, 3 * T_TILE:4 * T_TILE]),
        model.gravity, dt,
    )  # 3 planes of (T,T,T,8,64)

    if bcs.grid_ops:
        grid_v = _apply_grid_bcs_blocked(grid_v, bcs, time, dt, grid, tc)
    if grid_exchange is not None:
        # ownership masking + owner-to-neighbor velocity halos
        grid_v = grid_exchange(grid_v)

    # extract per-tile octant blocks -> G2P
    gvb = jnp.concatenate(grid_v, axis=3)  # (T,T,T,24,64)
    win_in = extract_windows(gvb, tc)
    if impl == "pallas":
        new_q = g2p_tiled_pallas(ts, win_in, grid, tc, dt)
    else:
        new_q = g2p_tiled_ref(ts, win_in, grid, tc, dt)

    need = jnp.max(new_q[RDRIFT]) > 0
    return dataclasses.replace(ts, q=new_q, need_rebucket=need)


def _apply_grid_bcs_blocked(grid_v, bcs, time, dt, grid: GridConfig,
                            tc: TileConfig):
    """Grid-phase BCs/colliders on the blocked (T,T,T,8,64) velocity planes."""
    T = tc.nt + 1
    sh = (T, T, T, T_TILE, T_TILE * T_TILE)
    # core-cell coordinates of every blocked cell: x = 8*tx + row,
    # y = 8*ty + lane//8, z = 8*tz + lane%8, each minus PAD_LO (pad
    # cells get out-of-range coords; they carry zero mass/velocity and
    # are never read back by G2P thanks to the kernel clamp matrix)
    lane = jax.lax.broadcasted_iota(jnp.int32, sh, 4)
    li = [jax.lax.broadcasted_iota(jnp.int32, sh, 3),
          lane // T_TILE, lane % T_TILE]
    coords = jnp.stack([
        (jax.lax.broadcasted_iota(jnp.int32, sh, d) * T_TILE
         + li[d] - PAD_LO).astype(jnp.float32)
        for d in range(3)], axis=-1,
    ).reshape(-1, 3)
    gv_aos = jnp.stack(grid_v, axis=-1).reshape(-1, 3)
    for op in bcs.grid_ops:
        gv_aos = op.apply_grid(gv_aos, coords, time, dt, grid.dx)
    return tuple(gv_aos[:, r].reshape(sh) for r in range(3))


# ---------------------------------------------------------------------------
# differentiable fitting substeps (VERDICT r3 item 3)
# ---------------------------------------------------------------------------

def substep_tiled_fitting(
    ts: TiledState,
    model: MPMModel,
    bcs,
    time,
    grid: GridConfig,
    tc: TileConfig,
    dt: float,
    chunk_impl: str = "mm",
    axis_name=None,
) -> TiledState:
    """One DIFFERENTIABLE fitting substep in the tiled layout.

    Fitting semantics parity (p2g2p_forward,
    /root/reference/mpm_solver/solver.py:54-69): Green-strain StVK stress on
    F (no return map, /root/reference/mpm_solver/utils.py:57-76), no
    particle-phase BCs, F advanced directly by G2P (F <- F_trial,
    utils.py:344).

    Runs the separable einsum formulation (p2g_chunk_ref/g2p_chunk_ref):
    both transfer directions are per-chunk matmuls over the 16-slot axis
    bases, so jax.grad's transposes are ALSO matmuls — this is the
    TPU-native answer to the reference's hand-driven Taichi adjoint kernels
    (solver.py:71-90), replacing the XLA scatter/gather adjoint whose
    index-bound transpose dominates the training step (BASELINE.md).

    Rebucketing happens INSIDE the differentiated window exactly as in the
    forward engine (a lax.cond on the drift flag): the rebucket is a
    permutation — argsort indices are integer-valued, the payload moves by
    gathers — so gradients flow through it; the impact phase of a fitting
    frame drifts several cells over 30 substeps, which a fixed bucketing
    cannot absorb.
    """
    from gsmpm_tpu.ops.constitutive import cauchy_stress_stvk_green_soa

    def _rb(s):
        s2 = rebucket(s, grid, tc)
        # sticky: an earlier overflow (dropped particles) must not be
        # masked by a later successful rebucket
        return dataclasses.replace(s2, ok=s2.ok & s.ok)

    ts = jax.lax.cond(ts.need_rebucket, _rb, lambda s: s, ts)
    q = ts.q
    F = tuple(q[RF + i] for i in range(9))
    stress = cauchy_stress_stvk_green_soa(F, ts.aux[AMU], ts.aux[ALAM])
    sig = jnp.concatenate([
        jnp.stack(stress), jnp.zeros((16 - 9, q.shape[1]), q.dtype)
    ])

    if chunk_impl == "vjp":
        # hand-written transfer VJPs (sim/transfer_vjp.py): forward AND
        # backward run the fused kernels (Pallas on TPU) — the r3 item-3
        # adjoint tier
        from gsmpm_tpu.sim.transfer_vjp import g2p_fit, p2g_fit

        windows = p2g_fit(q, sig, ts.chunk_tile, ts.chunk_first,
                          ts.chunk_live, grid, tc, dt)
    else:
        windows = p2g_tiled_ref(ts, sig, grid, tc, dt,
                                chunk_impl=chunk_impl)
    acc = fold_windows(windows, tc)
    if axis_name is not None:
        # particle-sharded fitting (parallel/sharded.py): every device
        # buckets its own particle shard over the FULL grid; the folded
        # blocked grid psums across the data axis (the psum is linear, so
        # jax.grad's transpose is the same psum — the adjoint stays on the
        # fused kernels)
        acc = jax.lax.psum(acc, axis_name)
    grid_v = grid_update_soa(
        acc[:, :, :, 0:T_TILE],
        (acc[:, :, :, T_TILE:2 * T_TILE],
         acc[:, :, :, 2 * T_TILE:3 * T_TILE],
         acc[:, :, :, 3 * T_TILE:4 * T_TILE]),
        model.gravity, dt,
    )
    if bcs.grid_ops:
        grid_v = _apply_grid_bcs_blocked(grid_v, bcs, time, dt, grid, tc)

    gvb = jnp.concatenate(grid_v, axis=3)
    win_in = extract_windows(gvb, tc)
    if chunk_impl == "vjp":
        from gsmpm_tpu.sim.transfer_vjp import g2p_fit

        new_q = g2p_fit(ts.q, win_in, ts.chunk_tile, ts.chunk_first,
                        ts.chunk_live, grid, tc, dt)
    else:
        new_q = g2p_tiled_ref(ts, win_in, grid, tc, dt,
                              chunk_impl=chunk_impl)
    # fitting path advances F directly, no return map
    new_q = new_q.at[RF:RF + 9].set(new_q[RFT:RFT + 9])

    drifted = ts.need_rebucket | (jnp.max(new_q[RDRIFT]) > 0)
    return dataclasses.replace(ts, q=new_q, need_rebucket=drifted)


def run_substeps_tiled_fitting(
    soa: SoAState,
    model: MPMModel,
    bcs,
    time,
    n_substeps: int,
    grid: GridConfig,
    dt: float,
    tc: Optional[TileConfig] = None,
    chunk_impl: str = "mm",
    axis_name=None,
):
    """Differentiable fitting window in the tiled layout.

    Returns (soa', time', ok): ok is False when the occupied-tile cap
    overflowed at bootstrap or a particle drifted out of its tile's safe
    window mid-scan (fixed bucketing) — the caller must redo the frame on
    the XLA fitting path (sim/solver.py:run_substeps(fitting=True)).

    Memory policy matches the reference's own (store particles, recompute
    the grid in backward, /root/reference/mpm_solver/solver.py:74-78):
    jax.checkpoint per substep keeps only the scan carries.
    """
    n = soa.mass.shape[0]
    if tc is None:
        tc = default_tile_config(grid.n_grid, n)
    ts0 = bootstrap(soa, model, grid, tc)

    def body(carry, _):
        ts, t = carry
        ts = substep_tiled_fitting(ts, model, bcs, t, grid, tc, dt,
                                   chunk_impl=chunk_impl,
                                   axis_name=axis_name)
        return (ts, t + dt), None

    body = jax.checkpoint(body)
    (ts, time), _ = jax.lax.scan(body, (ts0, time), None, length=n_substeps)
    q = to_original_order(ts, n)
    # mid-scan rebucketing absorbs drift; ok is the occupied-tile cap only
    ok = ts.ok
    return unpack_q(q, soa), time, ok


def frame_tiled(
    ts: TiledState,
    soa_template: SoAState,
    model: MPMModel,
    bcs,
    time,
    n_substeps: int,
    grid: GridConfig,
    tc: TileConfig,
    dt: float,
    impl: str = "pallas",
):
    """One frame of substeps with a PERSISTENT tiled state.

    Unlike run_substeps_tiled, the TiledState carries across frames (no
    per-frame bootstrap/pack); only the original-order SoA view for
    rendering/postprocess is regenerated. Returns (ts, soa, time); check
    ts.ok -- False means the occupied-tile cap overflowed and the caller
    must redo the frame on the XLA path from its saved pre-frame state.
    """
    def body(carry, _):
        ts_, t = carry
        ts_ = substep_tiled(ts_, model, bcs, t, grid, tc, dt, impl=impl)
        return (ts_, t + dt), None

    (ts, time), _ = jax.lax.scan(body, (ts, time), None, length=n_substeps)
    q = to_original_order(ts, tc.n_particles)
    return ts, unpack_q(q, soa_template), time


def run_substeps_tiled(
    soa: SoAState,
    model: MPMModel,
    bcs,
    time,
    n_substeps: int,
    grid: GridConfig,
    dt: float,
    impl: str = "ref",
    tc: Optional[TileConfig] = None,
):
    """Scan n_substeps in tiled layout; converts SoA <-> tiled at the ends.

    Falls back particle-for-particle exactly (same substep semantics as
    substep_soa); the caller is responsible for choosing the tiled path only
    for forward simulation (fitting keeps the differentiable XLA path).
    """
    n = soa.mass.shape[0]
    if tc is None:
        tc = default_tile_config(grid.n_grid, n)
    ts0 = bootstrap(soa, model, grid, tc)

    def body(carry, _):
        ts, t = carry
        ts = substep_tiled(ts, model, bcs, t, grid, tc, dt, impl=impl)
        return (ts, t + dt), None

    (ts, time), _ = jax.lax.scan(body, (ts0, time), None, length=n_substeps)
    q = to_original_order(ts, n)
    return unpack_q(q, soa), time, ts.ok
