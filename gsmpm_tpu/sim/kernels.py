"""SoA (planes) MLS-MPM substep kernels — the TPU hot path.

Same physics as sim/solver.py's public p2g/g2p/substep (parity targets:
/root/reference/mpm_solver/utils.py p2g:89-134, g2p:218-282,
grid_normalization_and_gravity:177-183), but laid out for the TPU VPU:
every per-particle quantity is a flat (N,) plane, the 27-node stencil is an
unrolled static loop of fused elementwise formulas, and the Eulerian grid
lives as four (G^3,) planes.  Versus the (N,3,3)/(N,27,3) AoS formulation
this lifts VPU lane occupancy from ~3/128 to full, worth ~100x on the
constitutive+transfer math (see BENCH notes in git history).

The scatter itself stays an XLA scatter-add (27 stacked (N,) segments); on
TPU XLA serializes colliding updates deterministically, so results are
reproducible run-to-run (the reference's ti.atomic_add is not).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gsmpm_tpu.ops import m33
from gsmpm_tpu.ops.constitutive import cauchy_stress_stvk_green_soa, compute_stress_soa
from gsmpm_tpu.sim.state import GridConfig, MPMModel, MPMState


class SoAState(NamedTuple):
    """Planes mirror of MPMState (sim/state.py)."""

    x: Tuple  # 3 x (N,)
    v: Tuple  # 3 x (N,)
    F: Tuple  # 9 x (N,)
    F_trial: Tuple  # 9 x (N,)
    C: Tuple  # 9 x (N,)
    vol: jnp.ndarray
    density: jnp.ndarray
    mass: jnp.ndarray
    init_cov: Tuple  # 6 x (N,)
    cov: Tuple  # 6 x (N,)
    yield_stress: jnp.ndarray


def soa_from_state(s: MPMState) -> SoAState:
    return SoAState(
        x=m33.vec_from_aos(s.x),
        v=m33.vec_from_aos(s.v),
        F=m33.from_aos(s.F),
        F_trial=m33.from_aos(s.F_trial),
        C=m33.from_aos(s.C),
        vol=s.vol,
        density=s.density,
        mass=s.mass,
        init_cov=tuple(s.init_cov[:, i] for i in range(6)),
        cov=tuple(s.cov[:, i] for i in range(6)),
        yield_stress=s.yield_stress,
    )


def state_from_soa(s: SoAState) -> MPMState:
    return MPMState(
        x=m33.vec_to_aos(s.x),
        v=m33.vec_to_aos(s.v),
        F=m33.to_aos(s.F),
        F_trial=m33.to_aos(s.F_trial),
        C=m33.to_aos(s.C),
        vol=s.vol,
        density=s.density,
        mass=s.mass,
        init_cov=jnp.stack(s.init_cov, axis=-1),
        cov=jnp.stack(s.cov, axis=-1),
        yield_stress=s.yield_stress,
    )


# ---------------------------------------------------------------------------
# per-axis quadratic B-spline stencil (planes form of ops/bspline.py)
# ---------------------------------------------------------------------------

def _axis_stencil(xa: jnp.ndarray, inv_dx: float):
    """One axis: (base int32, fx, (w0,w1,w2), (dw0,dw1,dw2) * inv_dx)."""
    gp = xa * inv_dx
    base = jnp.floor(gp - 0.5).astype(jnp.int32)
    fx = gp - base.astype(xa.dtype)
    w = (0.5 * (1.5 - fx) ** 2, 0.75 - (fx - 1.0) ** 2, 0.5 * (fx - 0.5) ** 2)
    dw = ((fx - 1.5) * inv_dx, -2.0 * (fx - 1.0) * inv_dx, (fx - 0.5) * inv_dx)
    return base, fx, w, dw


def _stencil(x: Tuple, grid: GridConfig):
    sten = [_axis_stencil(x[a], grid.inv_dx) for a in range(3)]
    bases = [s[0] for s in sten]
    fxs = [s[1] for s in sten]
    ws = [s[2] for s in sten]
    dws = [s[3] for s in sten]
    g = grid.n_grid
    # clamped per-axis node coordinates for each stencil offset 0..2
    nodes = [
        [jnp.clip(bases[a] + o, 0, g - 1) for o in range(3)] for a in range(3)
    ]
    return fxs, ws, dws, nodes


# ---------------------------------------------------------------------------
# P2G
# ---------------------------------------------------------------------------

_PAD = 2  # padded-grid halo: base in [-1, G-1], node = base+off in [-1, G+1]


def p2g_soa(
    state: SoAState,
    stress: Tuple,
    grid: GridConfig,
    dt,
):
    """Sort-free-of-atomics P2G; returns (grid_mass (G^3,), 3 momentum planes).

    Parity: p2g (/root/reference/mpm_solver/utils.py:89-134) — same stencil,
    same APIC momentum and stress impulse.  The reference scatters 27N
    updates with ti.atomic_add; XLA's scatter-add serializes colliding
    updates and costs ~90ms per 27N scalar updates on a v5e chip, but its
    cost scales with the UPDATE COUNT, not the payload width.  So:

      1. compute all 27 offsets' contributions as one (108, N) block
         (4 quantities x 27 offsets, pure fused elementwise — the per-offset
         target is always base+offset, i.e. a CONSTANT shift of the base
         cell id, so every offset shares the same scatter index);
      2. ONE column scatter-add of N updates with a 108-high payload
         (~6 ms vs ~360 ms for 4x27N scalar updates);
      3. accumulate the 27 shifted per-cell partials into a (G+4)^3 padded
         grid with static pad/adds, then fold the halo onto edge cells
         (identical to the old per-node clamp for any base in [-1, G-1]).

    Deterministic (XLA serializes colliding adds) and exact — no prefix-sum
    cancellation, no atomics.
    """
    g = grid.n_grid
    gp = g + 2 * _PAD
    gp3 = gp * gp * gp
    dtype = state.mass.dtype

    # per-axis stencil data (fx from the unclamped base — parity with
    # ops/bspline.py; clamped base only for indexing)
    bases, fx = [], []
    for a in range(3):
        gpos = state.x[a] * grid.inv_dx
        base = jnp.floor(gpos - 0.5).astype(jnp.int32)
        fx.append(gpos - base.astype(dtype))
        bases.append(jnp.clip(base, -1, g - 1))
    fid = (
        (bases[0] + _PAD) * gp + (bases[1] + _PAD)
    ) * gp + (bases[2] + _PAD)

    v, C, sig = state.v, state.C, stress
    mass, vol = state.mass, state.vol

    ws, dws = [], []
    for a in range(3):
        f = fx[a]
        ws.append((0.5 * (1.5 - f) ** 2, 0.75 - (f - 1.0) ** 2, 0.5 * (f - 0.5) ** 2))
        dws.append((
            (f - 1.5) * grid.inv_dx,
            -2.0 * (f - 1.0) * grid.inv_dx,
            (f - 0.5) * grid.inv_dx,
        ))

    # per-offset contributions, (27*4, N)
    vals = []
    offsets = []
    for i in range(3):
        for j in range(3):
            for k in range(3):
                offsets.append((i, j, k))
                w = ws[0][i] * ws[1][j] * ws[2][k]
                dwv = (
                    dws[0][i] * ws[1][j] * ws[2][k],
                    ws[0][i] * dws[1][j] * ws[2][k],
                    ws[0][i] * ws[1][j] * dws[2][k],
                )
                dpos = ((i - fx[0]) * grid.dx, (j - fx[1]) * grid.dx,
                        (k - fx[2]) * grid.dx)
                wm = w * mass
                vals.append(wm)
                for r in range(3):
                    apic = (
                        C[3 * r + 0] * dpos[0]
                        + C[3 * r + 1] * dpos[1]
                        + C[3 * r + 2] * dpos[2]
                    )
                    sforce = (
                        sig[3 * r + 0] * dwv[0]
                        + sig[3 * r + 1] * dwv[1]
                        + sig[3 * r + 2] * dwv[2]
                    )
                    vals.append(wm * (v[r] + apic) - dt * vol * sforce)
    vals = jnp.stack(vals)  # (108, N)

    # one exact column scatter-add onto the padded base-cell grid
    T = jnp.zeros((108, gp3), dtype).at[:, fid].add(vals)

    # accumulate shifted partials into the padded grid
    T = T.reshape(27, 4, gp, gp, gp)
    acc = jnp.zeros((4, gp, gp, gp), dtype)
    for o, (i, j, k) in enumerate(offsets):
        acc = acc + jnp.pad(
            T[o], ((0, 0), (i, 2 - i), (j, 2 - j), (k, 2 - k))
        )[:, :gp, :gp, :gp]

    # fold halo onto edge cells (== the old per-node clamp to [0, g-1])
    def fold(a, axis):
        lo = jax.lax.slice_in_dim(a, _PAD - 1, _PAD, axis=axis)
        inner = jax.lax.slice_in_dim(a, _PAD, _PAD + g, axis=axis)
        hi = jax.lax.slice_in_dim(a, _PAD + g, _PAD + g + 2, axis=axis)
        first = jax.lax.slice_in_dim(inner, 0, 1, axis=axis) + lo
        mid = jax.lax.slice_in_dim(inner, 1, g - 1, axis=axis)
        last = jax.lax.slice_in_dim(inner, g - 1, g, axis=axis) + jnp.sum(
            hi, axis=axis, keepdims=True
        )
        return jnp.concatenate([first, mid, last], axis=axis)

    for axis in (1, 2, 3):
        acc = fold(acc, axis)
    acc = acc.reshape(4, g * g * g)
    return acc[0], (acc[1], acc[2], acc[3])


def grid_update_soa(grid_mass, grid_mom, gravity, dt):
    """Planes grid normalization + gravity (parity utils.py:177-183)."""
    has_mass = grid_mass > 1e-15
    inv = jnp.where(has_mass, 1.0 / jnp.where(has_mass, grid_mass, 1.0), 0.0)
    return tuple(
        jnp.where(has_mass, grid_mom[r] * inv + dt * gravity[r], 0.0)
        for r in range(3)
    )


# ---------------------------------------------------------------------------
# G2P
# ---------------------------------------------------------------------------

def g2p_soa(
    state: SoAState,
    grid_v: Tuple,
    grid: GridConfig,
    dt,
    incremental_cov: bool = False,
) -> SoAState:
    """Gather velocity, rebuild APIC C and grad v, advect.

    Parity: g2p (/root/reference/mpm_solver/utils.py:218-282).
    """
    g = grid.n_grid
    gp = g + 2 * _PAD
    dtype = state.x[0].dtype

    # Gather cost on TPU scales with the number of dynamic indices, so
    # instead of 27N node gathers we build the 27 shifted copies of the
    # grid densely (pure pads/slices — node value for offset o at base cell
    # c is grid[c+o]) and do ONE column gather indexed by the N base cell
    # ids.  Edge replication in the padded halo reproduces the old
    # per-node clamp to [0, g-1] for any base in [-1, g-1].
    bases, fxs = [], []
    for a in range(3):
        gpos = state.x[a] * grid.inv_dx
        base = jnp.floor(gpos - 0.5).astype(jnp.int32)
        fxs.append(gpos - base.astype(dtype))
        bases.append(jnp.clip(base, -1, g - 1))
    fid = (
        (bases[0] + _PAD) * gp + (bases[1] + _PAD)
    ) * gp + (bases[2] + _PAD)

    ws, dws = [], []
    for a in range(3):
        f = fxs[a]
        ws.append((0.5 * (1.5 - f) ** 2, 0.75 - (f - 1.0) ** 2, 0.5 * (f - 0.5) ** 2))
        dws.append((
            (f - 1.5) * grid.inv_dx,
            -2.0 * (f - 1.0) * grid.inv_dx,
            (f - 0.5) * grid.inv_dx,
        ))

    pad_lo, pad_hi = _PAD, _PAD + 2  # slices start at offset 0..2
    gv3d = jnp.stack(grid_v).reshape(3, g, g, g)
    gv_pad = jnp.pad(
        gv3d, ((0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi), (pad_lo, pad_hi)),
        mode="edge",
    )
    shifted = []
    offsets = [(i, j, k) for i in range(3) for j in range(3) for k in range(3)]
    for (i, j, k) in offsets:
        shifted.append(
            jax.lax.slice(
                gv_pad, (0, i, j, k), (3, i + gp, j + gp, k + gp)
            ).reshape(3, gp * gp * gp)
        )
    stack = jnp.concatenate(shifted, axis=0)  # (81, gp^3)
    gv_all = stack[:, fid].reshape(27, 3, -1)  # one N-index column gather

    zero = jnp.zeros_like(state.x[0])
    new_v = [zero, zero, zero]
    new_C = [zero] * 9
    grad_v = [zero] * 9
    for o, (i, j, k) in enumerate(offsets):
        w = ws[0][i] * ws[1][j] * ws[2][k]
        dwv = (
            dws[0][i] * ws[1][j] * ws[2][k],
            ws[0][i] * dws[1][j] * ws[2][k],
            ws[0][i] * ws[1][j] * dws[2][k],
        )
        # dpos unscaled (parity g2p:260)
        dpos = tuple((i, j, k)[a] - fxs[a] for a in range(3))
        gv = (gv_all[o, 0], gv_all[o, 1], gv_all[o, 2])
        for r in range(3):
            new_v[r] = new_v[r] + w * gv[r]
            for c in range(3):
                new_C[3 * r + c] = new_C[3 * r + c] + w * gv[r] * dpos[c]
                grad_v[3 * r + c] = grad_v[3 * r + c] + gv[r] * dwv[c]

    coef = grid.inv_dx * 4.0
    new_C = tuple(c * coef for c in new_C)
    new_v = tuple(new_v)
    grad_v = tuple(grad_v)

    new_x = tuple(state.x[a] + dt * new_v[a] for a in range(3))
    # F_trial = (I + grad_v dt) F
    new_F_trial = m33.matmul(
        m33.add_scaled_identity(m33.scale(grad_v, dt), 1.0), state.F
    )

    new_cov = state.cov
    if incremental_cov:
        # parity: update_cov (utils.py:186-215) — redundant with postprocess
        # F Sigma0 F^T (SURVEY quirk #5), kept behind the flag
        cov_m = m33.from_upper6(state.cov)
        delta = m33.add(
            m33.matmul(grad_v, cov_m), m33.matmul_t(cov_m, grad_v)
        )
        new_cov = m33.to_upper6(m33.add(cov_m, m33.scale(delta, dt)))

    return state._replace(
        x=new_x, v=new_v, C=new_C, F_trial=new_F_trial, cov=new_cov
    )


# ---------------------------------------------------------------------------
# one substep (planes)
# ---------------------------------------------------------------------------

def substep_soa(
    state: SoAState,
    model: MPMModel,
    bcs,
    time,
    grid: GridConfig,
    dt: float,
    incremental_cov: bool = False,
    axis_name: Optional[str] = None,
    fitting: bool = False,
) -> SoAState:
    """Planes twin of sim/solver.py:substep — same op order, same BCs."""
    # particle-phase BCs keep their (N,3) interface (cheap, off hot path)
    if not fitting and bcs.particle_ops:
        v_aos = m33.vec_to_aos(state.v)
        x_aos = m33.vec_to_aos(state.x)
        for op in bcs.particle_ops:
            v_aos = op.apply_particles(x_aos, v_aos, state.mass, time, dt)
        state = state._replace(v=m33.vec_from_aos(v_aos))

    # stress
    if fitting:
        stress = cauchy_stress_stvk_green_soa(state.F, model.mu, model.lam)
    else:
        new_F, stress, new_yield = compute_stress_soa(
            state.F_trial,
            model.material,
            model.mu,
            model.lam,
            state.yield_stress,
            model.alpha,
            model.hardening,
            model.xi,
            model.plastic_viscosity,
            model.softening,
            dt,
            active_materials=model.active_materials,
        )
        state = state._replace(F=new_F, yield_stress=new_yield)

    # P2G (+ cross-shard grid reduction)
    grid_mass, grid_mom = p2g_soa(state, stress, grid, dt)
    if axis_name is not None:
        grid_mass = jax.lax.psum(grid_mass, axis_name)
        grid_mom = jax.lax.psum(jnp.stack(grid_mom), axis_name)
        grid_mom = (grid_mom[0], grid_mom[1], grid_mom[2])

    grid_v = grid_update_soa(grid_mass, grid_mom, model.gravity, dt)

    # grid-phase BCs/colliders keep their (G^3,3) interface
    if bcs.grid_ops:
        g = grid.n_grid
        coords = jnp.stack(
            [
                jax.lax.broadcasted_iota(jnp.float32, (g, g, g), d)
                for d in range(3)
            ],
            axis=-1,
        ).reshape(-1, 3)
        gv_aos = jnp.stack(grid_v, axis=-1)
        for op in bcs.grid_ops:
            gv_aos = op.apply_grid(gv_aos, coords, time, dt, grid.dx)
        grid_v = tuple(gv_aos[:, r] for r in range(3))

    state = g2p_soa(state, grid_v, grid, dt, incremental_cov)
    if fitting:
        state = state._replace(F=state.F_trial)
    return state


def postprocess_soa(state: SoAState, rotate_sh: bool = False):
    """Planes postprocess: cov6 = F Sigma0 F^T (+ optional polar R).

    Parity: solver.postprocess (/root/reference/mpm_solver/solver.py:135-137).
    Returns (cov6 planes tuple, R planes Mat or None).
    """
    F = state.F_trial
    cov = m33.matmul_t(m33.matmul(F, m33.from_upper6(state.init_cov)), F)
    cov6 = m33.to_upper6(cov)
    R = m33.transpose(m33.polar_rotation(F)) if rotate_sh else None
    return cov6, R
