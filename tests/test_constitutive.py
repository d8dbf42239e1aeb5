"""Constitutive laws: stress values for known F, return-map fixed points."""

import jax.numpy as jnp
import numpy as np

from gsmpm_tpu.models.gaussians import quat_to_rotmat
from gsmpm_tpu.ops.constitutive import (
    MATERIAL_JELLY,
    MATERIAL_METAL,
    cauchy_stress_stvk_green,
    compute_stress_from_F_trial,
    kirchhoff_stress_fcr,
    kirchhoff_stress_stvk,
    sand_return_mapping,
    von_mises_return_mapping,
)
from gsmpm_tpu.ops.svd3 import svd3x3


def _rand_rotations(n, seed):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return quat_to_rotmat(jnp.asarray(q.astype(np.float32)))


def test_fcr_zero_stress_at_rotation():
    # tau(F=R) = 0 for fixed corotated
    R = _rand_rotations(16, 0)
    U, s, V = svd3x3(R)
    J = jnp.linalg.det(R)
    mu = jnp.full((16,), 3.0)
    lam = jnp.full((16,), 7.0)
    tau = kirchhoff_stress_fcr(R, U, V, J, mu, lam)
    np.testing.assert_allclose(np.asarray(tau), 0.0, atol=1e-4)


def test_stvk_zero_stress_at_identity():
    F = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (8, 3, 3))
    U, s, V = svd3x3(F)
    tau = kirchhoff_stress_stvk(F, U, V, s, jnp.full((8,), 2.0), jnp.full((8,), 5.0))
    np.testing.assert_allclose(np.asarray(tau), 0.0, atol=1e-5)


def test_stvk_uniaxial_stretch_analytic():
    # F = diag(l,1,1): tau = U diag(2 mu log l + lam log l, lam log l, lam log l) V^T F^T
    l = 1.2
    mu_v, lam_v = 2.0, 3.0
    F = jnp.asarray(np.diag([l, 1.0, 1.0]).astype(np.float32))[None]
    U, s, V = svd3x3(F)
    tau = np.asarray(
        kirchhoff_stress_stvk(F, U, V, s, jnp.asarray([mu_v]), jnp.asarray([lam_v]))
    )[0]
    logl = np.log(l)
    expect = np.diag(
        [(2 * mu_v * logl + lam_v * logl) * l, lam_v * logl, lam_v * logl]
    )
    # tau_mat @ F^T scales first row by l
    np.testing.assert_allclose(tau, expect, atol=1e-5)


def test_von_mises_elastic_region_identity():
    # well inside the yield surface: F unchanged, yield unchanged
    F = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (8, 3, 3))
    mu = jnp.full((8,), 1.0)
    lam = jnp.full((8,), 1.0)
    ys = jnp.full((8,), 10.0)
    F2, ys2 = von_mises_return_mapping(F, mu, lam, ys, 1, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(F2), np.asarray(F), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ys2), np.asarray(ys), atol=1e-6)


def test_von_mises_yield_projects_and_hardens():
    # strong shear beyond yield: projected F has smaller deviatoric strain,
    # and hardening increases yield stress
    F = jnp.asarray(np.diag([2.0, 0.5, 1.0]).astype(np.float32))[None]
    mu = jnp.asarray([1.0])
    lam = jnp.asarray([1.0])
    ys = jnp.asarray([0.1])
    F2, ys2 = von_mises_return_mapping(F, mu, lam, ys, 1, jnp.float32(1.0))
    _, s2, _ = svd3x3(F2)
    eps2 = np.log(np.asarray(s2))
    dev2 = eps2 - eps2.mean(-1, keepdims=True)
    _, s1, _ = svd3x3(F)
    eps1 = np.log(np.asarray(s1))
    dev1 = eps1 - eps1.mean(-1, keepdims=True)
    assert np.linalg.norm(dev2) < np.linalg.norm(dev1)
    assert float(ys2[0]) > float(ys[0])
    # volumetric part preserved by deviatoric projection
    np.testing.assert_allclose(eps2.sum(), eps1.sum(), atol=1e-5)


def test_sand_elastic_when_compact():
    # isotropic compression with delta_gamma <= 0 stays elastic
    F = jnp.asarray((np.eye(3) * 0.99).astype(np.float32))[None]
    mu = jnp.asarray([10.0])
    lam = jnp.asarray([10.0])
    F2 = sand_return_mapping(F, mu, lam, jnp.float32(0.3))
    np.testing.assert_allclose(np.asarray(F2), np.asarray(F), atol=1e-6)


def test_sand_expansion_fails_to_rotation():
    # expansion (tr > 0) with yielding -> F = U V^T (det 1 rotation)
    F = jnp.asarray(np.diag([1.5, 1.4, 1.3]).astype(np.float32))[None]
    mu = jnp.asarray([1.0])
    lam = jnp.asarray([1.0])
    F2 = sand_return_mapping(F, mu, lam, jnp.float32(0.3))
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(F2)), 1.0, atol=1e-5)


def test_green_stvk_matches_reference_formula():
    # Parity check vs compute_stress_from_F_opt (/root/reference/mpm_solver/utils.py:57-76)
    rng = np.random.default_rng(0)
    F = jnp.asarray(
        np.eye(3, dtype=np.float32) + 0.1 * rng.normal(size=(16, 3, 3)).astype(np.float32)
    )
    mu = jnp.full((16,), 2.0)
    lam = jnp.full((16,), 3.0)
    sigma = np.asarray(cauchy_stress_stvk_green(F, mu, lam))
    Fn = np.asarray(F)
    for i in range(16):
        J = np.linalg.det(Fn[i])
        E = 0.5 * (Fn[i].T @ Fn[i] - np.eye(3))
        S = 2 * 2.0 * E + 3.0 * np.trace(E) * np.eye(3)
        expect = Fn[i] @ S @ Fn[i].T / J
        np.testing.assert_allclose(sigma[i], expect, atol=1e-4)


def test_dispatch_selects_per_particle():
    rng = np.random.default_rng(1)
    F = jnp.asarray(
        np.eye(3, dtype=np.float32) + 0.2 * rng.normal(size=(32, 3, 3)).astype(np.float32)
    )
    material = jnp.asarray([MATERIAL_JELLY] * 16 + [MATERIAL_METAL] * 16, jnp.int32)
    mu = jnp.full((32,), 1.0)
    lam = jnp.full((32,), 1.0)
    ys = jnp.full((32,), 1e9)  # never yielding
    res = compute_stress_from_F_trial(
        F, material, mu, lam, ys, jnp.float32(0.3), 1, jnp.float32(1.0),
        jnp.float32(0.008), jnp.float32(1.0), 1e-4,
        active_materials=(MATERIAL_JELLY, MATERIAL_METAL),
    )
    # stress is symmetric
    np.testing.assert_allclose(
        np.asarray(res.stress), np.asarray(jnp.swapaxes(res.stress, -1, -2)), atol=1e-5
    )
    # the two halves used different laws: compare against single-material runs
    res_jelly = compute_stress_from_F_trial(
        F, jnp.full((32,), MATERIAL_JELLY, jnp.int32), mu, lam, ys,
        jnp.float32(0.3), 1, jnp.float32(1.0), jnp.float32(0.008), jnp.float32(1.0),
        1e-4, active_materials=(MATERIAL_JELLY,),
    )
    np.testing.assert_allclose(
        np.asarray(res.stress[:16]), np.asarray(res_jelly.stress[:16]), atol=1e-6
    )
