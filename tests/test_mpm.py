"""MPM solver physics invariants: partition of unity, conservation, BCs."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsmpm_tpu.config import MPMConfig, BoundaryConditionConfig
from gsmpm_tpu.ops.bspline import (
    quadratic_bspline_weights,
    stencil_dweights,
    stencil_weights,
)
from gsmpm_tpu.sim.boundary import BCSet, make_surface_collider, build_boundary_conditions
from gsmpm_tpu.sim.solver import g2p, grid_update, p2g, postprocess, run_substeps, substep
from gsmpm_tpu.sim.state import GridConfig, init_model, init_state
from gsmpm_tpu.sim.volume import particle_volume


def _setup(n=512, seed=0, **cfg_kw):
    cfg = MPMConfig(**cfg_kw)
    rng = np.random.default_rng(seed)
    # keep particles away from boundary so the stencil never clamps
    xyz = jnp.asarray(rng.uniform(0.5, 1.5, size=(n, 3)).astype(np.float32))
    cov6 = jnp.tile(jnp.asarray([1e-4, 0, 0, 1e-4, 0, 1e-4], jnp.float32), (n, 1))
    vol = particle_volume(xyz, cfg.n_grid, cfg.grid_extent)
    model = init_model(cfg, n)
    state = init_state(xyz, cov6, vol, cfg)
    grid = GridConfig(cfg.n_grid, cfg.grid_extent)
    return cfg, state, model, grid


def test_weights_partition_of_unity():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.3, 1.7, size=(256, 3)).astype(np.float32))
    base, fx, w, dw = quadratic_bspline_weights(x, inv_dx=25.0)
    wN = stencil_weights(w)
    np.testing.assert_allclose(np.asarray(wN.sum(-1)), 1.0, atol=1e-5)
    # derivative of a partition of unity sums to zero
    dwN = stencil_dweights(w, dw, inv_dx=25.0)
    np.testing.assert_allclose(np.asarray(dwN.sum(1)), 0.0, atol=1e-3)


def test_p2g_mass_and_momentum_conservation():
    cfg, state, model, grid = _setup()
    rng = np.random.default_rng(1)
    state = dataclasses.replace(
        state, v=jnp.asarray(rng.normal(size=state.v.shape).astype(np.float32))
    )
    stress = jnp.asarray(rng.normal(size=(state.n_particles, 3, 3)).astype(np.float32))
    stress = 0.5 * (stress + jnp.swapaxes(stress, -1, -2))
    gm, gmom = p2g(state, stress, grid, cfg.substep_dt)
    np.testing.assert_allclose(float(gm.sum()), float(state.mass.sum()), rtol=1e-5)
    # stress is an internal force: sum_i dweight_i = 0, so total momentum is
    # exactly the particle momentum (C term also cancels: sum_i w_i dpos_i = 0
    # for quadratic B-splines)
    p_total = np.asarray((state.mass[:, None] * state.v).sum(0))
    np.testing.assert_allclose(np.asarray(gmom.sum(0)), p_total, rtol=1e-3, atol=1e-6)


def test_grid_update_gravity_only():
    g3 = 8
    gm = jnp.zeros((g3,)).at[3].set(2.0)
    gmom = jnp.zeros((g3, 3)).at[3].set(jnp.asarray([2.0, 0.0, 0.0]))
    gv = grid_update(gm, gmom, jnp.asarray([0.0, 0.0, -10.0]), 0.1)
    np.testing.assert_allclose(np.asarray(gv[3]), [1.0, 0.0, -1.0], atol=1e-6)
    # empty cells stay zero (mass threshold parity: utils.py:180)
    np.testing.assert_allclose(np.asarray(gv[0]), 0.0)


def test_free_fall_matches_gravity():
    # no stress forces (E tiny), no BCs: v = g*t, x advances accordingly
    cfg, state, model, grid = _setup(n=64, E=1e-6, gravity=[0.0, 0.0, -10.0])
    bcs = BCSet()
    n_sub = 20
    dt = cfg.substep_dt
    state2, t = run_substeps(
        state, model, bcs, jnp.float32(0.0), n_sub, grid, dt, checkpoint_policy=None
    )
    expect_v = -10.0 * dt * n_sub
    np.testing.assert_allclose(np.asarray(state2.v[:, 2]), expect_v, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(state2.v[:, :2]), 0.0, atol=1e-5)


def test_substep_preserves_shapes_and_finiteness():
    cfg, state, model, grid = _setup(n=256, E=1e4)
    bcs = BCSet(grid_ops=(make_surface_collider((0, 0, 0.4), (0, 0, 1)),))
    state2 = substep(state, model, bcs, jnp.float32(0.0), grid, cfg.substep_dt)
    for leaf in jax.tree_util.tree_leaves(state2):
        assert bool(jnp.isfinite(leaf).all())
    assert state2.x.shape == state.x.shape


def test_elastic_block_at_rest_stays_put():
    # uniform density block with F=I has zero stress; with zero gravity nothing moves
    cfg, state, model, grid = _setup(n=512, E=1e5, gravity=[0.0, 0.0, 0.0])
    state2, _ = run_substeps(
        state, model, BCSet(), jnp.float32(0.0), 10, grid, cfg.substep_dt,
        checkpoint_policy=None,
    )
    np.testing.assert_allclose(np.asarray(state2.v), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state2.x), np.asarray(state.x), atol=1e-6)


def test_fixed_cube_bc_freezes_region():
    cfg = MPMConfig(gravity=[0.0, 0.0, -100.0], E=1e-6)
    bc = BoundaryConditionConfig(
        type="fixed_cube",
        center=[1.0, 1.0, 1.5],
        size=[2.0, 2.0, 0.5],
        start_time=0,
        num_dt=10**9,
    )
    rng = np.random.default_rng(2)
    n = 128
    # half the particles inside the frozen slab (z>1.0), half below
    xyz = np.concatenate(
        [
            rng.uniform([0.5, 0.5, 1.2], [1.5, 1.5, 1.8], (n // 2, 3)),
            rng.uniform([0.5, 0.5, 0.4], [1.5, 1.5, 0.8], (n // 2, 3)),
        ]
    ).astype(np.float32)
    vol = particle_volume(jnp.asarray(xyz), cfg.n_grid, cfg.grid_extent)
    model = init_model(cfg, n)
    state = init_state(
        jnp.asarray(xyz),
        jnp.tile(jnp.asarray([1e-4, 0, 0, 1e-4, 0, 1e-4], jnp.float32), (n, 1)),
        vol,
        cfg,
    )
    bcs, state, model = build_boundary_conditions([bc], cfg, state, model)
    grid = GridConfig(cfg.n_grid, cfg.grid_extent)
    state2, _ = run_substeps(
        state, model, bcs, jnp.float32(0.0), 20, grid, cfg.substep_dt,
        checkpoint_policy=None,
    )
    v = np.asarray(state2.v)
    assert np.abs(v[: n // 2, 2]).max() < 1e-4  # frozen
    assert v[n // 2 :, 2].mean() < -0.1  # falling


def test_impulse_bc_kicks_velocity():
    cfg = MPMConfig(gravity=[0.0, 0.0, 0.0], E=1e-6)
    bc = BoundaryConditionConfig(
        type="impulse",
        center=[1.0, 1.0, 1.0],
        size=[2.0, 2.0, 2.0],
        force=[1.0, 0.0, 0.0],
        start_time=0.0,
        num_dt=5,
    )
    cfg2, state, model, grid = _setup(n=64, E=1e-6, gravity=[0.0, 0.0, 0.0])
    bcs, state, model = build_boundary_conditions([bc], cfg, state, model)
    state2, _ = run_substeps(
        state, model, bcs, jnp.float32(0.0), 3, grid, cfg.substep_dt,
        checkpoint_policy=None,
    )
    assert np.asarray(state2.v[:, 0]).min() > 0.0


def test_ground_collider_blocks_penetration():
    cfg, state, model, grid = _setup(n=256, E=1e-6, gravity=[0.0, 0.0, -100.0])
    bcs = BCSet(grid_ops=(make_surface_collider((0, 0, 0.4), (0, 0, 1)),))
    state2, _ = run_substeps(
        state, model, bcs, jnp.float32(0.0), 200, grid, cfg.substep_dt,
        checkpoint_policy=None,
    )
    # nothing sinks meaningfully below the plane (one cell of slack)
    assert np.asarray(state2.x[:, 2]).min() > 0.4 - 2 * grid.dx


def test_postprocess_cov_identity_F():
    cfg, state, model, grid = _setup(n=32)
    cov6, R = postprocess(state, rotate_sh=True)
    np.testing.assert_allclose(np.asarray(cov6), np.asarray(state.init_cov), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(R), np.broadcast_to(np.eye(3, dtype=np.float32), (32, 3, 3)), atol=1e-4
    )


def test_volume_initialization():
    # uniform occupancy: one particle per cell -> vol == dx^3
    cfg = MPMConfig(n_grid=4, grid_extent=2.0)
    dx = cfg.grid_extent / cfg.n_grid
    centers = (np.mgrid[0:4, 0:4, 0:4].reshape(3, -1).T + 0.5) * dx
    vol = particle_volume(
        jnp.asarray(centers.astype(np.float32)), cfg.n_grid, cfg.grid_extent
    )
    np.testing.assert_allclose(np.asarray(vol), dx**3, rtol=1e-6)


def test_determinism():
    cfg, state, model, grid = _setup(n=128, E=1e4)
    bcs = BCSet(grid_ops=(make_surface_collider((0, 0, 0.4), (0, 0, 1)),))
    f = jax.jit(
        lambda s: run_substeps(
            s, model, bcs, jnp.float32(0.0), 5, grid, cfg.substep_dt,
            checkpoint_policy=None,
        )[0]
    )
    a = f(state)
    b = f(state)
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
    np.testing.assert_array_equal(np.asarray(a.F_trial), np.asarray(b.F_trial))
