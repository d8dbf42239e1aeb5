"""SoA planes hot path vs the AoS oracle: identical physics, allclose results."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gsmpm_tpu.ops.m33 as m33
from gsmpm_tpu.config import MPMConfig
from gsmpm_tpu.ops.constitutive import compute_stress_from_F_trial, compute_stress_soa
from gsmpm_tpu.ops.svd3 import polar_rotation, svd3x3
from gsmpm_tpu.sim.boundary import BCSet, make_surface_collider
from gsmpm_tpu.sim.solver import _substep_aos, substep
from gsmpm_tpu.sim.state import GridConfig, init_model, init_state
from gsmpm_tpu.sim.volume import particle_volume


def _rand_F(n, seed=0, scale=0.12):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        (np.eye(3) + scale * rng.normal(size=(n, 3, 3))).astype(np.float32)
    )


def test_m33_svd_reconstruction_and_polar():
    A = _rand_F(512, scale=0.5)
    Ap = m33.from_aos(A)
    U, sig, V = m33.svd3(Ap)
    rec = m33.matmul_t(m33.mul_diag_right(U, sig), V)
    np.testing.assert_allclose(np.asarray(m33.to_aos(rec)), np.asarray(A), atol=3e-4)
    # orthogonality
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (512, 3, 3))
    np.testing.assert_allclose(np.asarray(m33.to_aos(m33.t_matmul(U, U))), eye, atol=3e-5)
    np.testing.assert_allclose(np.asarray(m33.to_aos(m33.t_matmul(V, V))), eye, atol=3e-5)
    # polar matches AoS implementation
    Rp = m33.to_aos(m33.polar_rotation(Ap))
    Ra = polar_rotation(A)
    np.testing.assert_allclose(np.asarray(Rp), np.asarray(Ra), atol=5e-4)


@pytest.mark.parametrize("mats", [(0,), (1,), (2,), (3,), (4,), (5,), (0, 1, 2, 3, 4, 5)])
def test_stress_dispatch_soa_matches_aos(mats):
    n = 256
    rng = np.random.default_rng(1)
    F_trial = _rand_F(n, seed=2)
    material = jnp.asarray(rng.choice(list(mats), size=n).astype(np.int32))
    mu = jnp.asarray(rng.uniform(1e3, 1e5, n).astype(np.float32))
    lam = jnp.asarray(rng.uniform(1e3, 1e5, n).astype(np.float32))
    ys = jnp.asarray(rng.uniform(1e2, 1e4, n).astype(np.float32))
    alpha = jnp.float32(0.3)
    xi = jnp.float32(0.01)
    pv = jnp.float32(10.0)
    soft = jnp.float32(0.1)
    dt = 1e-4

    res = compute_stress_from_F_trial(
        F_trial, material, mu, lam, ys, alpha, 1, xi, pv, soft, dt,
        active_materials=tuple(mats),
    )
    Fp, stress_p, ys_p = compute_stress_soa(
        m33.from_aos(F_trial), material, mu, lam, ys, alpha, 1, xi, pv, soft, dt,
        active_materials=tuple(mats),
    )
    np.testing.assert_allclose(
        np.asarray(m33.to_aos(Fp)), np.asarray(res.F), rtol=1e-3, atol=1e-4
    )
    scale = np.maximum(np.abs(np.asarray(res.stress)).max(), 1.0)
    np.testing.assert_allclose(
        np.asarray(m33.to_aos(stress_p)) / scale,
        np.asarray(res.stress) / scale,
        atol=2e-3,
    )
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(res.yield_stress), rtol=1e-3)


@pytest.mark.parametrize("fitting", [False, True])
def test_substep_soa_matches_aos_oracle(fitting):
    n = 512
    cfg = MPMConfig(
        E=2e4, nu=0.3, material="jelly", n_grid=16, grid_extent=2.0,
        substep_dt=1e-4, frame_dt=1e-2, density=200.0,
    )
    rng = np.random.default_rng(3)
    xyz = rng.uniform(0.5, 1.5, size=(n, 3)).astype(np.float32)
    cov6 = np.tile(np.asarray([1e-4, 0, 0, 1e-4, 0, 1e-4], np.float32), (n, 1))
    vol = particle_volume(jnp.asarray(xyz), cfg.n_grid, cfg.grid_extent)
    state = init_state(jnp.asarray(xyz), jnp.asarray(cov6), vol, cfg)
    state = dataclasses.replace(
        state,
        v=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        F=_rand_F(n, seed=4, scale=0.05),
        F_trial=_rand_F(n, seed=5, scale=0.05),
        C=jnp.asarray(0.1 * rng.normal(size=(n, 3, 3)).astype(np.float32)),
    )
    model = init_model(cfg, n)
    bcs = BCSet(grid_ops=(make_surface_collider((0, 0, 0.4), (0, 0, 1)),))
    grid = GridConfig(cfg.n_grid, cfg.grid_extent)
    t = jnp.float32(0.0)

    ref = _substep_aos(state, model, bcs, t, grid, cfg.substep_dt, fitting=fitting)
    out = substep(state, model, bcs, t, grid, cfg.substep_dt, fitting=fitting)

    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.C), np.asarray(ref.C), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out.F_trial), np.asarray(ref.F_trial), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out.F), np.asarray(ref.F), rtol=1e-3, atol=1e-4)


def test_incremental_cov_soa_matches_aos():
    n = 128
    cfg = MPMConfig(
        E=2e4, nu=0.3, material="jelly", n_grid=16, grid_extent=2.0,
        substep_dt=1e-4, frame_dt=1e-2, density=200.0,
    )
    rng = np.random.default_rng(7)
    xyz = rng.uniform(0.5, 1.5, size=(n, 3)).astype(np.float32)
    cov6 = np.abs(rng.normal(size=(n, 6)).astype(np.float32)) * 1e-4
    vol = particle_volume(jnp.asarray(xyz), cfg.n_grid, cfg.grid_extent)
    state = init_state(jnp.asarray(xyz), jnp.asarray(cov6), vol, cfg)
    state = dataclasses.replace(
        state, v=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    )
    model = init_model(cfg, n)
    bcs = BCSet()
    grid = GridConfig(cfg.n_grid, cfg.grid_extent)
    ref = _substep_aos(
        state, model, bcs, jnp.float32(0.0), grid, cfg.substep_dt,
        incremental_cov=True,
    )
    out = substep(
        state, model, bcs, jnp.float32(0.0), grid, cfg.substep_dt,
        incremental_cov=True,
    )
    np.testing.assert_allclose(np.asarray(out.cov), np.asarray(ref.cov), rtol=1e-3, atol=1e-6)
