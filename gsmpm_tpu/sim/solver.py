"""Functional MLS-MPM solver: P2G scatter, grid update, G2P gather, substep scan.

Parity target: MPM_Simulator.p2g2p and the Taichi kernels it drives
(/root/reference/mpm_solver/solver.py:27-52, /root/reference/mpm_solver/utils.py).

TPU-native design:
- one pure function ``substep(state, model, bcs, time) -> state`` — no kernel
  launches, no atomics: P2G is a vectorized 27-node scatter-add XLA lowers to
  a deterministic sort/segment combiner; G2P is pure gathers;
- the per-frame loop is ``lax.scan`` over substeps (single compiled program
  per frame instead of ~400 kernel launches);
- multi-chip: pass ``axis_name`` — particles are sharded, each chip scatters
  its partial grid and the tiny dense grid is ``psum``-reduced over ICI (the
  spatial-decomposition answer to the reference's single-GPU atomics; see
  gsmpm_tpu/parallel/).
- out-of-domain particles clamp their stencil to the grid boundary (the
  reference's OOB writes are silently dropped by Taichi — SURVEY quirk #8;
  clamping is the explicit semantic here).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gsmpm_tpu.config import MPMConfig
from gsmpm_tpu.ops.bspline import (
    SPLINE_OFFSETS,
    quadratic_bspline_weights,
    stencil_dweights,
    stencil_weights,
)
from gsmpm_tpu.ops.constitutive import compute_stress_from_F_trial, cauchy_stress_stvk_green
from gsmpm_tpu.ops.svd3 import polar_rotation
from gsmpm_tpu.sim.boundary import BCSet
from gsmpm_tpu.sim.coupling import mat_from_upper, upper_from_mat
from gsmpm_tpu.sim.state import GridConfig, MPMModel, MPMState


# ---------------------------------------------------------------------------
# P2G / grid / G2P
# ---------------------------------------------------------------------------

def _stencil_nodes(base: jnp.ndarray, n_grid: int):
    """(N,3) base -> (N,27,3) clamped node coords and (N,27) flat indices."""
    offsets = jnp.asarray(SPLINE_OFFSETS, jnp.int32)
    nodes = base[:, None, :] + offsets[None, :, :]
    nodes = jnp.clip(nodes, 0, n_grid - 1)
    flat = (nodes[..., 0] * n_grid + nodes[..., 1]) * n_grid + nodes[..., 2]
    return nodes, flat


def p2g(
    state: MPMState,
    stress: jnp.ndarray,
    grid: GridConfig,
    dt,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter mass and APIC momentum + stress impulse to the grid.

    Parity: p2g kernel (/root/reference/mpm_solver/utils.py:89-134).
    Returns (grid_mass (G^3,), grid_mom (G^3, 3)) flattened.
    """
    base, fx, w, dw = quadratic_bspline_weights(state.x, grid.inv_dx)
    wN = stencil_weights(w)  # (N,27)
    dwN = stencil_dweights(w, dw, grid.inv_dx)  # (N,27,3)
    _, flat = _stencil_nodes(base, grid.n_grid)

    offsets = jnp.asarray(SPLINE_OFFSETS, state.x.dtype)
    dpos = (offsets[None, :, :] - fx[:, None, :]) * grid.dx  # (N,27,3)

    # APIC momentum: w * m * (v + C @ dpos)
    c_dpos = jnp.einsum("nij,nkj->nki", state.C, dpos)
    mom = wN[..., None] * (state.mass[:, None, None] * (state.v[:, None, :] + c_dpos))
    # stress force impulse: -dt * V * sigma @ dweight
    mom = mom - dt * state.vol[:, None, None] * jnp.einsum("nij,nkj->nki", stress, dwN)

    g3 = grid.n_grid ** 3
    grid_mass = jnp.zeros((g3,), state.x.dtype).at[flat.ravel()].add(
        (wN * state.mass[:, None]).ravel()
    )
    grid_mom = jnp.zeros((g3, 3), state.x.dtype).at[flat.ravel()].add(
        mom.reshape(-1, 3)
    )
    return grid_mass, grid_mom


def grid_update(
    grid_mass: jnp.ndarray,
    grid_mom: jnp.ndarray,
    gravity: jnp.ndarray,
    dt,
) -> jnp.ndarray:
    """Momentum -> velocity + gravity where mass > 1e-15.

    Parity: grid_normalization_and_gravity
    (/root/reference/mpm_solver/utils.py:177-183).
    """
    has_mass = grid_mass > 1e-15
    safe_mass = jnp.where(has_mass, grid_mass, 1.0)
    v = grid_mom / safe_mass[:, None] + dt * gravity[None, :]
    return jnp.where(has_mass[:, None], v, 0.0)


def g2p(
    state: MPMState,
    grid_v: jnp.ndarray,
    grid: GridConfig,
    dt,
    incremental_cov: bool = False,
) -> MPMState:
    """Gather velocities, rebuild APIC C and velocity gradient, advect.

    Parity: g2p kernel (/root/reference/mpm_solver/utils.py:218-282).
    """
    base, fx, w, dw = quadratic_bspline_weights(state.x, grid.inv_dx)
    wN = stencil_weights(w)
    dwN = stencil_dweights(w, dw, grid.inv_dx)
    _, flat = _stencil_nodes(base, grid.n_grid)

    gv = grid_v[flat.reshape(-1)].reshape(-1, 27, 3)  # (N,27,3)
    new_v = jnp.einsum("nk,nki->ni", wN, gv)
    offsets = jnp.asarray(SPLINE_OFFSETS, state.x.dtype)
    dpos = offsets[None, :, :] - fx[:, None, :]  # (N,27,3) — unscaled, parity g2p:260
    new_C = jnp.einsum("nki,nkj,nk->nij", gv, dpos, wN) * (grid.inv_dx * 4.0)
    grad_v = jnp.einsum("nki,nkj->nij", gv, dwN)

    new_x = state.x + dt * new_v
    eye = jnp.eye(3, dtype=state.x.dtype)
    new_F_trial = (eye[None] + grad_v * dt) @ state.F

    new_cov = state.cov
    if incremental_cov:
        # Parity: update_cov (/root/reference/mpm_solver/utils.py:186-215);
        # redundant with postprocess F Sigma0 F^T (SURVEY quirk #5), off by default.
        cov_mat = mat_from_upper(state.cov)
        cov_mat = cov_mat + dt * (
            grad_v @ cov_mat + cov_mat @ jnp.swapaxes(grad_v, -1, -2)
        )
        new_cov = upper_from_mat(cov_mat)

    return dataclasses.replace(
        state, x=new_x, v=new_v, C=new_C, F_trial=new_F_trial, cov=new_cov
    )


# ---------------------------------------------------------------------------
# one substep
# ---------------------------------------------------------------------------

def substep(
    state: MPMState,
    model: MPMModel,
    bcs: BCSet,
    time,
    grid: GridConfig,
    dt: float,
    incremental_cov: bool = False,
    axis_name: Optional[str] = None,
    fitting: bool = False,
) -> MPMState:
    """One MLS-MPM substep; pure function of (state, model, bcs, time).

    Parity: MPM_Simulator.p2g2p (/root/reference/mpm_solver/solver.py:27-52)
    and the fitting variant p2g2p_forward (solver.py:54-69), which swaps the
    SVD return-map stress for the Green-strain StVK stress and skips
    particle-phase BCs.

    The compute runs in the SoA planes layout (sim/kernels.py) — this AoS
    entry point converts at the boundary.  The AoS reference implementation
    below (_substep_aos) is kept as the differential-test oracle.
    """
    from gsmpm_tpu.sim.kernels import soa_from_state, state_from_soa, substep_soa

    soa = soa_from_state(state)
    soa = substep_soa(
        soa, model, bcs, time, grid, dt, incremental_cov, axis_name, fitting
    )
    return state_from_soa(soa)


def _substep_aos(
    state: MPMState,
    model: MPMModel,
    bcs: BCSet,
    time,
    grid: GridConfig,
    dt: float,
    incremental_cov: bool = False,
    axis_name: Optional[str] = None,
    fitting: bool = False,
) -> MPMState:
    """Reference AoS substep — readable oracle for tests/test_soa.py."""
    # particle-phase BCs (impulse)
    v = state.v
    if not fitting:
        for op in bcs.particle_ops:
            v = op.apply_particles(state.x, v, state.mass, time, dt)
    state = dataclasses.replace(state, v=v)

    # stress
    if fitting:
        stress = cauchy_stress_stvk_green(state.F, model.mu, model.lam)
        new_F = state.F
        new_yield = state.yield_stress
    else:
        res = compute_stress_from_F_trial(
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
        stress, new_F, new_yield = res.stress, res.F, res.yield_stress
    state = dataclasses.replace(state, F=new_F, yield_stress=new_yield)

    # P2G (+ grid reduction across particle shards when running sharded)
    grid_mass, grid_mom = p2g(state, stress, grid, dt)
    if axis_name is not None:
        grid_mass = jax.lax.psum(grid_mass, axis_name)
        grid_mom = jax.lax.psum(grid_mom, axis_name)

    # grid update + grid-phase BCs/colliders in registration order
    grid_v = grid_update(grid_mass, grid_mom, model.gravity, dt)
    if bcs.grid_ops:
        g = grid.n_grid
        coords = jnp.stack(
            [
                jax.lax.broadcasted_iota(jnp.float32, (g, g, g), d)
                for d in range(3)
            ],
            axis=-1,
        ).reshape(-1, 3)
        for op in bcs.grid_ops:
            grid_v = op.apply_grid(grid_v, coords, time, dt, grid.dx)

    # G2P
    state = g2p(state, grid_v, grid, dt, incremental_cov)
    if fitting:
        # fitting path advances F directly, no return map
        # (parity: g2p_opt writes particle_F[s+1] = (I + grad_v dt) F[s],
        # /root/reference/mpm_solver/utils.py:344)
        state = dataclasses.replace(state, F=state.F_trial)
    return state


def run_substeps(
    state: MPMState,
    model: MPMModel,
    bcs: BCSet,
    time,
    n_substeps: int,
    grid: GridConfig,
    dt: float,
    incremental_cov: bool = False,
    axis_name: Optional[str] = None,
    fitting: bool = False,
    checkpoint_policy: Optional[str] = "substep",
):
    """lax.scan over n_substeps; optionally remat each substep.

    The remat policy matches the reference's own memory strategy for the
    fitting path: keep particle state, recompute the grid in backward
    (/root/reference/mpm_solver/solver.py:71-78).

    The scan carries the SoA planes state (sim/kernels.py) — AoS<->SoA
    conversion happens once per call, not per substep.
    """
    from gsmpm_tpu.sim.kernels import soa_from_state, state_from_soa, substep_soa

    def body(carry, _):
        st, t = carry
        st = substep_soa(
            st, model, bcs, t, grid, dt, incremental_cov, axis_name, fitting
        )
        return (st, t + dt), None

    if checkpoint_policy == "substep":
        body = jax.checkpoint(body)

    (soa, time), _ = jax.lax.scan(
        body, (soa_from_state(state), time), None, length=n_substeps
    )
    return state_from_soa(soa), time


def postprocess(state: MPMState, rotate_sh: bool = False):
    """Frame-end: cov = F Sigma0 F^T and the SH polar rotation R.

    Parity: MPM_Simulator.postprocess (/root/reference/mpm_solver/solver.py:135-137)
    -> compute_cov_from_F + compute_R_from_F
    (/root/reference/mpm_solver/utils.py:376-433); both consume F_trial.
    Returns (cov6 (N,6), R (N,3,3)); R follows the reference's stored
    transpose convention (utils.py:398).
    """
    from gsmpm_tpu.ops import m33
    from gsmpm_tpu.sim.kernels import postprocess_soa, soa_from_state

    cov6_p, R_p = postprocess_soa(soa_from_state(state), rotate_sh)
    cov6 = jnp.stack(cov6_p, axis=-1)
    R = m33.to_aos(R_p) if R_p is not None else None
    return cov6, R


# ---------------------------------------------------------------------------
# facade
# ---------------------------------------------------------------------------

class MPMSolver:
    """Convenience driver owning state/model/BCs with jit-compiled stepping.

    Parity surface: MPM_Simulator (/root/reference/mpm_solver/solver.py:10-177).
    The underlying compute stays fully functional; this class only carries the
    pytrees and the compiled functions between frames.
    """

    def __init__(
        self,
        xyz,
        cov6,
        volumes,
        cfg: MPMConfig,
        init_velocity=None,
    ):
        from gsmpm_tpu.sim.state import init_model, init_state

        self.cfg = cfg
        self.grid = GridConfig(cfg.n_grid, cfg.grid_extent)
        self.model = init_model(cfg, xyz.shape[0])
        self.state = init_state(xyz, cov6, volumes, cfg, init_velocity)
        self.bcs = BCSet()
        self.time = jnp.float32(0.0)
        self._frame_fn = None
        # tiled Pallas transfer path: the default forward engine on TPU
        # (sim/tiles.py, sim/pallas_mpm.py); falls back to the dense XLA
        # path on overflow or when per-substep cov updates are requested
        self.use_tiled = (
            jax.default_backend() == "tpu" and not cfg.incremental_cov
        )
        self._ts = None
        self._tiled_fns = None

    def set_boundary_conditions(self, bc_configs):
        from gsmpm_tpu.sim.boundary import build_boundary_conditions

        bcset, self.state, self.model = build_boundary_conditions(
            bc_configs, self.cfg, self.state, self.model
        )
        self.bcs = BCSet(
            particle_ops=self.bcs.particle_ops + bcset.particle_ops,
            grid_ops=self.bcs.grid_ops + bcset.grid_ops,
        )
        self._frame_fn = None
        self._ts = None

    def set_bc_ground_only(self):
        """Parity: set_bc_ground_only (/root/reference/mpm_solver/solver.py:131-133)."""
        from gsmpm_tpu.sim.boundary import StickyGroundBC

        self.bcs = BCSet(
            particle_ops=self.bcs.particle_ops,
            grid_ops=self.bcs.grid_ops + (StickyGroundBC(),),
        )
        self._frame_fn = None
        self._ts = None

    def add_surface_collider(self, point, normal, surface="sticky", friction=0.0):
        from gsmpm_tpu.sim.boundary import make_surface_collider

        self.bcs = BCSet(
            particle_ops=self.bcs.particle_ops,
            grid_ops=self.bcs.grid_ops
            + (make_surface_collider(point, normal, surface, friction),),
        )
        self._frame_fn = None
        self._ts = None

    def step_frame(self, n_substeps: Optional[int] = None):
        """Advance one frame (n_substeps substeps) under a single jit."""
        n = int(n_substeps or self.cfg.steps_per_frame)
        if self.use_tiled and self._step_frame_tiled(n):
            return
        if self._frame_fn is None or self._frame_fn_steps != n:
            grid, dt, inc = self.grid, self.cfg.substep_dt, self.cfg.incremental_cov

            @jax.jit
            def frame(state, model, bcs, time):
                return run_substeps(
                    state, model, bcs, time, n, grid, dt, inc,
                    checkpoint_policy=None,
                )

            self._frame_fn = frame
            self._frame_fn_steps = n
        self.state, self.time = self._frame_fn(
            self.state, self.model, self.bcs, self.time
        )

    def invalidate_tiled(self):
        """Drop the tiled mirror (call after mutating self.state in place)."""
        self._ts = None

    def _step_frame_tiled(self, n: int) -> bool:
        """Tiled-Pallas frame; returns False if the caller must run XLA."""
        from gsmpm_tpu.sim.kernels import soa_from_state, state_from_soa
        from gsmpm_tpu.sim.tiles import (
            bootstrap, default_tile_config, frame_tiled,
        )

        if self._tiled_fns is None or self._tiled_fns[0] != n:
            grid, dt = self.grid, self.cfg.substep_dt
            tc = default_tile_config(
                self.cfg.n_grid, int(self.state.mass.shape[0])
            )

            @jax.jit
            def boot(state, model):
                return bootstrap(soa_from_state(state), model, grid, tc)

            @jax.jit
            def frame(ts, soa_tpl, model, bcs, time):
                ts, soa, time = frame_tiled(
                    ts, soa_tpl, model, bcs, time, n, grid, tc, dt,
                    impl="pallas",
                )
                return ts, state_from_soa(soa), time

            self._tiled_fns = (n, boot, frame)
            self._ts = None
        _, boot, frame = self._tiled_fns
        if self._ts is None:
            self._ts = boot(self.state, self.model)
            if not bool(self._ts.ok):  # occupied tiles exceed cap
                self.use_tiled = False
                return False
        soa_tpl = soa_from_state(self.state)
        ts, state, time = frame(
            self._ts, soa_tpl, self.model, self.bcs, self.time
        )
        if not bool(ts.ok):
            self.use_tiled = False  # overflow mid-frame: redo on XLA path
            self._ts = None
            return False
        self._ts, self.state, self.time = ts, state, time
        return True

    _postprocess_jit = staticmethod(
        jax.jit(partial(postprocess, rotate_sh=True))
    )

    def postprocess(self):
        cov6, R = MPMSolver._postprocess_jit(self.state)
        self.state = dataclasses.replace(self.state, cov=cov6)
        return cov6, R
