"""Constitutive models: Kirchhoff stresses and plastic return mappings.

Parity target: /root/reference/mpm_solver/constitutive_models.py (Taichi
@ti.func per particle) and the dispatch kernel compute_stress_from_F_trial
(/root/reference/mpm_solver/utils.py:13-76).

TPU-native design: every law is a batched branch-free function over (N,3,3)
deformation gradients; the material switch is a jnp.where select over the
subset of materials actually present (static at trace time), not per-particle
control flow.  The von-Mises hardening side effect on yield_stress
(/root/reference/mpm_solver/constitutive_models.py:97-98) becomes an explicit
functional output (SURVEY quirk #11).

Material ids (parity: /root/reference/mpm_solver/utils.py:5-10, plus fluid —
the return map the reference defines but never calls, SURVEY quirk #12):
  0 jelly (fixed corotated), 1 metal (von Mises + StVK), 2 sand
  (Drucker-Prager), 3 foam (viscoplastic StVK), 4 fluid (cohesive fluid + StVK),
  5 plasticine (von Mises with softening + StVK).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from gsmpm_tpu.ops import m33
from gsmpm_tpu.ops.svd3 import svd3x3

MATERIAL_JELLY = 0
MATERIAL_METAL = 1
MATERIAL_SAND = 2
MATERIAL_FOAM = 3
MATERIAL_FLUID = 4
MATERIAL_PLASTICINE = 5

_I3 = jnp.eye(3, dtype=jnp.float32)


def _diag3(v: jnp.ndarray) -> jnp.ndarray:
    """(...,3) -> (...,3,3) diagonal."""
    return v[..., :, None] * _I3


# ---------------------------------------------------------------------------
# elastic Kirchhoff stresses
# ---------------------------------------------------------------------------

def kirchhoff_stress_fcr(F, U, V, J, mu, lam):
    """Fixed corotated: tau = 2 mu (F - R) F^T + lam J (J - 1) I.

    Parity: kirchoff_stress_FCR (/root/reference/mpm_solver/constitutive_models.py:10-20).
    """
    R = U @ jnp.swapaxes(V, -1, -2)
    term = 2.0 * mu[..., None, None] * ((F - R) @ jnp.swapaxes(F, -1, -2))
    return term + (lam * J * (J - 1.0))[..., None, None] * _I3


def kirchhoff_stress_stvk(F, U, V, sig, mu, lam):
    """Hencky-strain StVK: tau = U diag(2 mu eps + lam sum(eps)) V^T F^T.

    Parity: kirchoff_stress_StVK (/root/reference/mpm_solver/constitutive_models.py:23-38),
    including the sigma >= 0.01 clamp.
    """
    sig = jnp.maximum(sig, 0.01)
    eps = jnp.log(sig)
    tau_diag = 2.0 * mu[..., None] * eps + (lam * eps.sum(-1))[..., None]
    return U @ _diag3(tau_diag) @ jnp.swapaxes(V, -1, -2) @ jnp.swapaxes(F, -1, -2)


def kirchhoff_stress_drucker_prager(F, U, V, sig, mu, lam):
    """Parity: kirchoff_stress_Drucker_Prager
    (/root/reference/mpm_solver/constitutive_models.py:41-58)."""
    sig_safe = jnp.maximum(sig, 1e-6)
    log_sig = jnp.log(sig_safe)
    log_sum = log_sig.sum(-1, keepdims=True)
    center = (2.0 * mu[..., None] * log_sig + lam[..., None] * log_sum) / sig_safe
    return U @ _diag3(center) @ jnp.swapaxes(V, -1, -2) @ jnp.swapaxes(F, -1, -2)


def cauchy_stress_stvk_green(F, mu, lam, j_clamp: float = 1e-2):
    """Green-Lagrange StVK Cauchy stress — the autodiff-friendly fitting path.

    Parity: compute_stress_from_F_opt (/root/reference/mpm_solver/utils.py:57-76):
    E = (F^T F - I)/2; S = 2 mu E + lam tr(E) I; sigma = F S F^T / J, with
    |J| clamped to >= j_clamp.
    """
    J = jnp.linalg.det(F)
    J = jnp.where(jnp.abs(J) < j_clamp, j_clamp * jnp.sign(J) + (J == 0) * j_clamp, J)
    E = 0.5 * (jnp.swapaxes(F, -1, -2) @ F - _I3)
    trE = jnp.trace(E, axis1=-2, axis2=-1)
    S = 2.0 * mu[..., None, None] * E + (lam * trE)[..., None, None] * _I3
    return F @ S @ jnp.swapaxes(F, -1, -2) / J[..., None, None]


# ---------------------------------------------------------------------------
# plastic return mappings (all branch-free batched)
# ---------------------------------------------------------------------------

def von_mises_return_mapping(
    F_trial, mu, lam, yield_stress, hardening: int, xi, softening=None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """von Mises with optional hardening; returns (F, new_yield_stress).

    Parity: von_mises_return_mapping
    (/root/reference/mpm_solver/constitutive_models.py:62-103).  `softening`
    (plasticine variant) multiplies yield stress decay; None keeps metal
    behavior.
    """
    U, sig_old, V = svd3x3(F_trial)
    sig = jnp.maximum(sig_old, 0.01)
    eps = jnp.log(sig)
    mean_eps = eps.mean(-1, keepdims=True)
    tau = 2.0 * mu[..., None] * eps + (lam * eps.sum(-1))[..., None]
    cond = tau - tau.mean(-1, keepdims=True)
    cond_norm = jnp.linalg.norm(cond, axis=-1)
    yielding = cond_norm > yield_stress

    eps_hat = eps - mean_eps
    eps_hat_norm = jnp.linalg.norm(eps_hat, axis=-1) + 1e-6
    delta_gamma = eps_hat_norm - yield_stress / (2.0 * mu)
    eps_proj = eps - (delta_gamma / eps_hat_norm)[..., None] * eps_hat
    F_proj = U @ _diag3(jnp.exp(eps_proj)) @ jnp.swapaxes(V, -1, -2)

    F_new = jnp.where(yielding[..., None, None], F_proj, F_trial)
    d_yield = 2.0 * mu * xi * delta_gamma
    if softening is not None:
        d_yield = -softening * jnp.abs(d_yield)
    new_yield = jnp.where(
        yielding & (hardening == 1), yield_stress + d_yield, yield_stress
    )
    return F_new, new_yield


def sand_return_mapping(F_trial, mu, lam, alpha) -> jnp.ndarray:
    """Drucker-Prager sand projection.

    Parity: sand_return_mapping
    (/root/reference/mpm_solver/constitutive_models.py:105-140).
    """
    U, sig, V = svd3x3(F_trial)
    eps = jnp.log(jnp.maximum(jnp.abs(sig), 1e-14))
    tr = eps.sum(-1)
    eps_hat = eps - (tr / 3.0)[..., None]
    eps_hat_norm = jnp.linalg.norm(eps_hat, axis=-1)
    delta_gamma = eps_hat_norm + (3.0 * lam + 2.0 * mu) / (2.0 * mu) * tr * alpha

    Vt = jnp.swapaxes(V, -1, -2)
    # case: delta_gamma > 0 and tr <= 0 -> project onto yield surface
    safe_norm = jnp.maximum(eps_hat_norm, 1e-12)
    H = eps - eps_hat * (delta_gamma / safe_norm)[..., None]
    F_proj = U @ _diag3(jnp.exp(H)) @ Vt
    # case: delta_gamma > 0 and tr > 0 -> total failure, F = U V^T
    F_fail = U @ Vt

    yielding = delta_gamma > 0
    expanding = tr > 0
    F_new = jnp.where(
        yielding[..., None, None],
        jnp.where(expanding[..., None, None], F_fail, F_proj),
        F_trial,
    )
    return F_new


def _deviatoric_viscoplastic_project(
    F_trial, mu, yield_scale, yield_stress, plastic_viscosity, dt, visc_mult, sig_clamp
):
    """Shared core of the foam/fluid viscoplastic return maps."""
    U, sig_old, V = svd3x3(F_trial)
    sig = jnp.maximum(sig_old, sig_clamp)
    b_trial = sig * sig
    eps = jnp.log(sig)
    tr = eps.sum(-1)
    eps_hat = eps - (tr / 3.0)[..., None]
    s_trial = 2.0 * mu[..., None] * eps_hat
    s_norm = jnp.linalg.norm(s_trial, axis=-1)
    y = s_norm - yield_scale * jnp.sqrt(2.0 / 3.0) * yield_stress

    mu_hat = mu * b_trial.sum(-1) / 3.0
    denom = 1.0 + plastic_viscosity * visc_mult / (2.0 * jnp.maximum(mu_hat, 1e-12) * dt)
    s_new_norm = s_norm - y / denom
    scale = s_new_norm / jnp.maximum(s_norm, 1e-12)
    s_new = scale[..., None] * s_trial
    eps_new = s_new / (2.0 * mu[..., None]) + (tr / 3.0)[..., None]
    F_proj = U @ _diag3(jnp.exp(eps_new)) @ jnp.swapaxes(V, -1, -2)
    return jnp.where((y > 0)[..., None, None], F_proj, F_trial)


def viscoplasticity_return_mapping_stvk(
    F_trial, mu, yield_stress, plastic_viscosity, dt
) -> jnp.ndarray:
    """Foam/"toothpaste" viscoplastic StVK return map.

    Parity: viscoplasticity_return_mapping_with_StVK
    (/root/reference/mpm_solver/constitutive_models.py:216-259): 0.8x yield
    scale, viscosity factor 2, sigma clamp 0.01.
    """
    return _deviatoric_viscoplastic_project(
        F_trial, mu, 0.8, yield_stress, plastic_viscosity, dt, 2.0, 0.01
    )


def fluid_return_mapping(
    F_trial, mu, yield_stress, plastic_viscosity, dt
) -> jnp.ndarray:
    """Cohesive-fluid return map.

    Parity: fluid_return_mapping
    (/root/reference/mpm_solver/constitutive_models.py:142-213) — defined but
    never dispatched in the reference (SURVEY quirk #12); wired up here as
    material "fluid".
    """
    return _deviatoric_viscoplastic_project(
        F_trial, mu, 1.0, yield_stress, plastic_viscosity, dt, 1.0, 0.01
    )


# ---------------------------------------------------------------------------
# fused dispatch: return map + stress
# ---------------------------------------------------------------------------

class StressResult(NamedTuple):
    F: jnp.ndarray  # (N,3,3) post-return-map elastic deformation gradient
    stress: jnp.ndarray  # (N,3,3) symmetrized Kirchhoff stress
    yield_stress: jnp.ndarray  # (N,) possibly hardened


def compute_stress_from_F_trial(
    F_trial: jnp.ndarray,
    material: jnp.ndarray,
    mu: jnp.ndarray,
    lam: jnp.ndarray,
    yield_stress: jnp.ndarray,
    alpha,
    hardening: int,
    xi,
    plastic_viscosity,
    softening,
    dt,
    active_materials: Tuple[int, ...] = (0,),
) -> StressResult:
    """Vectorized material dispatch: return-map F_trial then Kirchhoff stress.

    Parity: compute_stress_from_F_trial (/root/reference/mpm_solver/utils.py:13-54)
    with the *intended* jelly branch (SURVEY quirk #1: the reference compares
    the field object, killing FCR for jelly; here material==0 really gets FCR).

    `active_materials` is static — only the laws present in the scene are
    traced, so single-material scenes pay for exactly one return map.
    """
    m = material
    F = F_trial
    new_yield = yield_stress

    def sel(mid, a, b):
        return jnp.where((m == mid)[..., None, None], a, b)

    if MATERIAL_METAL in active_materials:
        F_vm, y_vm = von_mises_return_mapping(
            F_trial, mu, lam, yield_stress, hardening, xi
        )
        F = sel(MATERIAL_METAL, F_vm, F)
        new_yield = jnp.where(m == MATERIAL_METAL, y_vm, new_yield)
    if MATERIAL_PLASTICINE in active_materials:
        F_pl, y_pl = von_mises_return_mapping(
            F_trial, mu, lam, yield_stress, hardening, xi, softening=softening
        )
        F = sel(MATERIAL_PLASTICINE, F_pl, F)
        new_yield = jnp.where(m == MATERIAL_PLASTICINE, y_pl, new_yield)
    if MATERIAL_SAND in active_materials:
        F = sel(MATERIAL_SAND, sand_return_mapping(F_trial, mu, lam, alpha), F)
    if MATERIAL_FOAM in active_materials:
        F = sel(
            MATERIAL_FOAM,
            viscoplasticity_return_mapping_stvk(
                F_trial, mu, yield_stress, plastic_viscosity, dt
            ),
            F,
        )
    if MATERIAL_FLUID in active_materials:
        F = sel(
            MATERIAL_FLUID,
            fluid_return_mapping(F_trial, mu, yield_stress, plastic_viscosity, dt),
            F,
        )

    J = jnp.linalg.det(F)
    U, sig, V = svd3x3(F)

    stress = jnp.zeros_like(F)
    if MATERIAL_JELLY in active_materials:
        stress = sel(MATERIAL_JELLY, kirchhoff_stress_fcr(F, U, V, J, mu, lam), stress)
    stvk_mats = [
        mm
        for mm in (MATERIAL_METAL, MATERIAL_FOAM, MATERIAL_FLUID, MATERIAL_PLASTICINE)
        if mm in active_materials
    ]
    if stvk_mats:
        stvk = kirchhoff_stress_stvk(F, U, V, sig, mu, lam)
        is_stvk = jnp.zeros_like(m, dtype=bool)
        for mm in stvk_mats:
            is_stvk = is_stvk | (m == mm)
        stress = jnp.where(is_stvk[..., None, None], stvk, stress)
    if MATERIAL_SAND in active_materials:
        stress = sel(
            MATERIAL_SAND, kirchhoff_stress_drucker_prager(F, U, V, sig, mu, lam), stress
        )

    stress = 0.5 * (stress + jnp.swapaxes(stress, -1, -2))
    return StressResult(F=F, stress=stress, yield_stress=new_yield)


# ---------------------------------------------------------------------------
# SoA ("planes") hot-path implementation — same physics, TPU-lane-efficient
# layout (see ops/m33.py docstring).  Cross-validated against the AoS
# dispatch above in tests/test_soa.py.
# ---------------------------------------------------------------------------

def _vm_return_soa(F_trial, mu, lam, yield_stress, hardening, xi, softening=None):
    """Planes von Mises return map; mirrors von_mises_return_mapping."""
    U, sig_raw, V = m33.svd3(F_trial)
    sig = tuple(jnp.maximum(s, 0.01) for s in sig_raw)
    eps = tuple(jnp.log(s) for s in sig)
    sum_eps = eps[0] + eps[1] + eps[2]
    mean_eps = sum_eps / 3.0
    tau = tuple(2.0 * mu * e + lam * sum_eps for e in eps)
    tau_mean = (tau[0] + tau[1] + tau[2]) / 3.0
    cond = tuple(t - tau_mean for t in tau)
    cond_norm = jnp.sqrt(cond[0] ** 2 + cond[1] ** 2 + cond[2] ** 2)
    yielding = cond_norm > yield_stress

    eps_hat = tuple(e - mean_eps for e in eps)
    ehn = jnp.sqrt(eps_hat[0] ** 2 + eps_hat[1] ** 2 + eps_hat[2] ** 2) + 1e-6
    delta_gamma = ehn - yield_stress / (2.0 * mu)
    ratio = delta_gamma / ehn
    eps_proj = tuple(e - ratio * eh for e, eh in zip(eps, eps_hat))
    F_proj = m33.matmul_t(
        m33.mul_diag_right(U, tuple(jnp.exp(e) for e in eps_proj)), V
    )
    F_new = m33.mwhere(yielding, F_proj, F_trial)
    d_yield = 2.0 * mu * xi * delta_gamma
    if softening is not None:
        d_yield = -softening * jnp.abs(d_yield)
    new_yield = jnp.where(
        yielding & (hardening == 1), yield_stress + d_yield, yield_stress
    )
    return F_new, new_yield


def _sand_return_soa(F_trial, mu, lam, alpha):
    """Planes Drucker-Prager sand projection; mirrors sand_return_mapping."""
    U, sig, V = m33.svd3(F_trial)
    eps = tuple(jnp.log(jnp.maximum(jnp.abs(s), 1e-14)) for s in sig)
    tr = eps[0] + eps[1] + eps[2]
    eps_hat = tuple(e - tr / 3.0 for e in eps)
    ehn = jnp.sqrt(eps_hat[0] ** 2 + eps_hat[1] ** 2 + eps_hat[2] ** 2)
    delta_gamma = ehn + (3.0 * lam + 2.0 * mu) / (2.0 * mu) * tr * alpha
    safe_norm = jnp.maximum(ehn, 1e-12)
    ratio = delta_gamma / safe_norm
    H = tuple(e - eh * ratio for e, eh in zip(eps, eps_hat))
    F_proj = m33.matmul_t(m33.mul_diag_right(U, tuple(jnp.exp(h) for h in H)), V)
    F_fail = m33.matmul_t(U, V)
    F_new = m33.mwhere(
        delta_gamma > 0, m33.mwhere(tr > 0, F_fail, F_proj), F_trial
    )
    return F_new


def _viscoplastic_return_soa(
    F_trial, mu, yield_scale, yield_stress, plastic_viscosity, dt, visc_mult, sig_clamp
):
    """Planes deviatoric viscoplastic projection; mirrors
    _deviatoric_viscoplastic_project."""
    U, sig_raw, V = m33.svd3(F_trial)
    sig = tuple(jnp.maximum(s, sig_clamp) for s in sig_raw)
    b_sum = sig[0] ** 2 + sig[1] ** 2 + sig[2] ** 2
    eps = tuple(jnp.log(s) for s in sig)
    tr = eps[0] + eps[1] + eps[2]
    eps_hat = tuple(e - tr / 3.0 for e in eps)
    s_trial = tuple(2.0 * mu * eh for eh in eps_hat)
    s_norm = jnp.sqrt(s_trial[0] ** 2 + s_trial[1] ** 2 + s_trial[2] ** 2)
    y = s_norm - yield_scale * jnp.sqrt(2.0 / 3.0) * yield_stress

    mu_hat = mu * b_sum / 3.0
    denom = 1.0 + plastic_viscosity * visc_mult / (
        2.0 * jnp.maximum(mu_hat, 1e-12) * dt
    )
    s_new_norm = s_norm - y / denom
    sc = s_new_norm / jnp.maximum(s_norm, 1e-12)
    eps_new = tuple(sc * s / (2.0 * mu) + tr / 3.0 for s in s_trial)
    F_proj = m33.matmul_t(
        m33.mul_diag_right(U, tuple(jnp.exp(e) for e in eps_new)), V
    )
    return m33.mwhere(y > 0, F_proj, F_trial)


def _stress_fcr_soa(F, U, V, J, mu, lam):
    R = m33.matmul_t(U, V)
    term = m33.scale(m33.matmul_t(m33.sub(F, R), F), 2.0 * mu)
    return m33.add_scaled_identity(term, lam * J * (J - 1.0))


def _stress_stvk_soa(F, U, V, sig, mu, lam):
    sig = tuple(jnp.maximum(s, 0.01) for s in sig)
    eps = tuple(jnp.log(s) for s in sig)
    sum_eps = eps[0] + eps[1] + eps[2]
    tau = tuple(2.0 * mu * e + lam * sum_eps for e in eps)
    return m33.matmul_t(m33.matmul_t(m33.mul_diag_right(U, tau), V), F)


def _stress_dp_soa(F, U, V, sig, mu, lam):
    sig_safe = tuple(jnp.maximum(s, 1e-6) for s in sig)
    log_sig = tuple(jnp.log(s) for s in sig_safe)
    log_sum = log_sig[0] + log_sig[1] + log_sig[2]
    center = tuple(
        (2.0 * mu * ls + lam * log_sum) / ss for ls, ss in zip(log_sig, sig_safe)
    )
    return m33.matmul_t(m33.matmul_t(m33.mul_diag_right(U, center), V), F)


def cauchy_stress_stvk_green_soa(F, mu, lam, j_clamp: float = 1e-2):
    """Planes Green-Lagrange StVK Cauchy stress (fitting path);
    mirrors cauchy_stress_stvk_green."""
    J = m33.det(F)
    J = jnp.where(jnp.abs(J) < j_clamp, j_clamp * jnp.sign(J) + (J == 0) * j_clamp, J)
    E = m33.add_scaled_identity(m33.scale(m33.t_matmul(F, F), 0.5), -0.5)
    trE = m33.trace(E)
    S = m33.add_scaled_identity(m33.scale(E, 2.0 * mu), lam * trE)
    return m33.scale(m33.matmul_t(m33.matmul(F, S), F), 1.0 / J)


def compute_stress_soa(
    F_trial,
    material: jnp.ndarray,
    mu: jnp.ndarray,
    lam: jnp.ndarray,
    yield_stress: jnp.ndarray,
    alpha,
    hardening: int,
    xi,
    plastic_viscosity,
    softening,
    dt,
    active_materials: Tuple[int, ...] = (0,),
):
    """Planes material dispatch; returns (F planes, stress planes, yield).

    Hot-path equivalent of compute_stress_from_F_trial — identical physics
    and material semantics, SoA layout.
    """
    m = material
    F = F_trial
    new_yield = yield_stress

    if MATERIAL_METAL in active_materials:
        F_vm, y_vm = _vm_return_soa(F_trial, mu, lam, yield_stress, hardening, xi)
        F = m33.mwhere(m == MATERIAL_METAL, F_vm, F)
        new_yield = jnp.where(m == MATERIAL_METAL, y_vm, new_yield)
    if MATERIAL_PLASTICINE in active_materials:
        F_pl, y_pl = _vm_return_soa(
            F_trial, mu, lam, yield_stress, hardening, xi, softening=softening
        )
        F = m33.mwhere(m == MATERIAL_PLASTICINE, F_pl, F)
        new_yield = jnp.where(m == MATERIAL_PLASTICINE, y_pl, new_yield)
    if MATERIAL_SAND in active_materials:
        F = m33.mwhere(m == MATERIAL_SAND, _sand_return_soa(F_trial, mu, lam, alpha), F)
    if MATERIAL_FOAM in active_materials:
        F = m33.mwhere(
            m == MATERIAL_FOAM,
            _viscoplastic_return_soa(
                F_trial, mu, 0.8, yield_stress, plastic_viscosity, dt, 2.0, 0.01
            ),
            F,
        )
    if MATERIAL_FLUID in active_materials:
        F = m33.mwhere(
            m == MATERIAL_FLUID,
            _viscoplastic_return_soa(
                F_trial, mu, 1.0, yield_stress, plastic_viscosity, dt, 1.0, 0.01
            ),
            F,
        )

    J = m33.det(F)
    U, sig, V = m33.svd3(F)

    stress = tuple(jnp.zeros_like(F[0]) for _ in range(9))
    if MATERIAL_JELLY in active_materials:
        stress = m33.mwhere(
            m == MATERIAL_JELLY, _stress_fcr_soa(F, U, V, J, mu, lam), stress
        )
    stvk_mats = [
        mm
        for mm in (MATERIAL_METAL, MATERIAL_FOAM, MATERIAL_FLUID, MATERIAL_PLASTICINE)
        if mm in active_materials
    ]
    if stvk_mats:
        stvk = _stress_stvk_soa(F, U, V, sig, mu, lam)
        is_stvk = jnp.zeros_like(m, dtype=bool)
        for mm in stvk_mats:
            is_stvk = is_stvk | (m == mm)
        stress = m33.mwhere(is_stvk, stvk, stress)
    if MATERIAL_SAND in active_materials:
        stress = m33.mwhere(
            m == MATERIAL_SAND, _stress_dp_soa(F, U, V, sig, mu, lam), stress
        )

    stress = m33.symmetrize(stress)
    return F, stress, new_yield
