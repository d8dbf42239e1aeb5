"""MPM state and model-parameter pytrees.

Parity targets: MPM_model and MPM_state (/root/reference/mpm_solver/model.py).
TPU-native design: immutable dataclass pytrees of (N, ...) jnp arrays instead
of Taichi SoA fields; the Eulerian grid is *not* stored — it is rebuilt
functionally inside every substep (the reference's reset_grid_state+atomics
pattern collapses into pure scatter/gather).  yield_stress lives in the state
(not the model) because von-Mises hardening evolves it (SURVEY quirk #11).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gsmpm_tpu.config import MPMConfig

# Parity: /root/reference/mpm_solver/utils.py:5-10, extended with the fluid
# return map the reference ships but never dispatches (SURVEY quirk #12) and
# the "plasticine" name appearing in reference configs.
material_types = {
    "jelly": 0,
    "metal": 1,
    "sand": 2,
    "foam": 3,
    "fluid": 4,
    "water": 4,
    "plasticine": 5,
}


class GridConfig(NamedTuple):
    """Static Eulerian grid geometry (trace-time constants).

    Parity: MPM_model grid fields (/root/reference/mpm_solver/model.py:13-16).
    """

    n_grid: int
    grid_extent: float

    @property
    def dx(self) -> float:
        return self.grid_extent / self.n_grid

    @property
    def inv_dx(self) -> float:
        return self.n_grid / self.grid_extent


@jax.tree_util.register_dataclass
@dataclass
class MPMModel:
    """Per-particle material parameters + global physics constants.

    Parity: MPM_model (/root/reference/mpm_solver/model.py:6-73).  E and nu are
    reparameterized exactly like the reference: E = 10^logE,
    nu = 0.49*sigmoid(y) (/root/reference/mpm_solver/utils.py:349-362).
    """

    material: jnp.ndarray  # (N,) int32
    logE: jnp.ndarray  # (N,)
    y: jnp.ndarray  # (N,)
    mu: jnp.ndarray  # (N,)
    lam: jnp.ndarray  # (N,)
    viscosity: jnp.ndarray  # (N,)
    gravity: jnp.ndarray  # (3,)
    alpha: jnp.ndarray  # () Drucker-Prager friction coefficient
    xi: jnp.ndarray  # () von-Mises hardening coefficient
    plastic_viscosity: jnp.ndarray  # ()
    softening: jnp.ndarray  # ()
    hardening: int = field(metadata=dict(static=True), default=1)
    active_materials: Tuple[int, ...] = field(
        metadata=dict(static=True), default=(0,)
    )

    @property
    def n_particles(self) -> int:
        return self.material.shape[0]

    def E(self) -> jnp.ndarray:
        return 10.0 ** self.logE

    def nu(self) -> jnp.ndarray:
        return 0.49 / (1.0 + jnp.exp(-self.y))


def mu_lam_from_logE_y(logE: jnp.ndarray, y: jnp.ndarray):
    """Parity: compute_mu_lam_from_E_nu (/root/reference/mpm_solver/utils.py:349-362)."""
    E = 10.0 ** logE
    nu = 0.49 / (1.0 + jnp.exp(-y))
    mu = E / (2.0 * (1.0 + nu))
    lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    return mu, lam


def logE_y_from_E_nu(E: float, nu: float) -> Tuple[float, float]:
    """Inverse reparameterization (/root/reference/mpm_solver/model.py:42-43)."""
    return math.log10(E), -math.log(0.49 / nu - 1.0)


@jax.tree_util.register_dataclass
@dataclass
class MPMState:
    """All evolving per-particle state.

    Parity: MPM_state (/root/reference/mpm_solver/model.py:76-132); covariances
    6-packed [xx,xy,xz,yy,yz,zz].
    """

    x: jnp.ndarray  # (N,3) positions in grid space
    v: jnp.ndarray  # (N,3)
    F: jnp.ndarray  # (N,3,3) elastic deformation gradient (post return map)
    F_trial: jnp.ndarray  # (N,3,3)
    C: jnp.ndarray  # (N,3,3) APIC affine velocity
    vol: jnp.ndarray  # (N,)
    density: jnp.ndarray  # (N,)
    mass: jnp.ndarray  # (N,)
    init_cov: jnp.ndarray  # (N,6)
    cov: jnp.ndarray  # (N,6)
    yield_stress: jnp.ndarray  # (N,)

    @property
    def n_particles(self) -> int:
        return self.x.shape[0]


def init_model(cfg: MPMConfig, n_particles: int) -> MPMModel:
    """Build MPMModel from config; parity with MPM_model.__init__
    (/root/reference/mpm_solver/model.py:8-59)."""
    mat_id = material_types.get(cfg.material, -1)
    if mat_id < 0:
        raise TypeError(f"Material not supported yet: {cfg.material!r}")
    logE0, y0 = logE_y_from_E_nu(cfg.E, cfg.nu)
    logE = jnp.full((n_particles,), logE0, jnp.float32)
    y = jnp.full((n_particles,), y0, jnp.float32)
    mu, lam = mu_lam_from_logE_y(logE, y)
    sin_phi = math.sin(math.radians(cfg.friction_angle))
    alpha = math.sqrt(2.0 / 3.0) * 2.0 * sin_phi / (3.0 - sin_phi)
    return MPMModel(
        material=jnp.full((n_particles,), mat_id, jnp.int32),
        logE=logE,
        y=y,
        mu=mu,
        lam=lam,
        viscosity=jnp.full((n_particles,), cfg.viscosity, jnp.float32),
        gravity=jnp.asarray(cfg.gravity, jnp.float32),
        alpha=jnp.float32(alpha),
        xi=jnp.float32(cfg.xi),
        plastic_viscosity=jnp.float32(cfg.plastic_viscosity),
        softening=jnp.float32(cfg.softening),
        hardening=int(cfg.hardening),
        active_materials=(mat_id,),
    )


def init_state(
    xyz: jnp.ndarray,
    cov6: jnp.ndarray,
    volumes: jnp.ndarray,
    cfg: MPMConfig,
    init_velocity: Optional[jnp.ndarray] = None,
) -> MPMState:
    """Parity: MPM_state.__init__ (/root/reference/mpm_solver/model.py:78-122)."""
    n = xyz.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
    density = jnp.full((n,), cfg.density, jnp.float32)
    v0 = (
        jnp.zeros((n, 3), jnp.float32)
        if init_velocity is None
        else jnp.asarray(init_velocity, jnp.float32)
    )
    return MPMState(
        x=jnp.asarray(xyz, jnp.float32),
        v=v0,
        F=eye,
        F_trial=eye,
        C=jnp.zeros((n, 3, 3), jnp.float32),
        vol=jnp.asarray(volumes, jnp.float32),
        density=density,
        mass=density * jnp.asarray(volumes, jnp.float32),
        init_cov=jnp.asarray(cov6, jnp.float32).reshape(n, 6),
        cov=jnp.asarray(cov6, jnp.float32).reshape(n, 6),
        yield_stress=jnp.full((n,), cfg.yield_stress, jnp.float32),
    )
