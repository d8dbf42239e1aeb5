"""Tile-bucketed separable transfer vs the validated SoA path.

The tiled path (sim/tiles.py, design in sim/TILED_DESIGN.md) must reproduce
substep_soa's physics exactly up to f32 reduction-order tolerance, including
across rebucketing events and at domain edges.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsmpm_tpu.config import MPMConfig
from gsmpm_tpu.sim.boundary import BCSet, make_surface_collider
from gsmpm_tpu.sim.kernels import soa_from_state, state_from_soa, substep_soa
from gsmpm_tpu.sim.solver import run_substeps
from gsmpm_tpu.sim.state import GridConfig, init_model, init_state
from gsmpm_tpu.sim.tiles import (
    TileConfig,
    bootstrap,
    default_tile_config,
    rebucket,
    run_substeps_tiled,
    to_original_order,
    unpack_q,
)
from gsmpm_tpu.sim.volume import particle_volume


def _setup(n=768, g=16, seed=3, material="jelly", edge=False):
    cfg = MPMConfig(
        E=2e4, nu=0.3, material=material, n_grid=g, grid_extent=2.0,
        substep_dt=1e-4, frame_dt=1e-2, density=200.0,
    )
    rng = np.random.default_rng(seed)
    lo, hi = (0.02, 1.98) if edge else (0.5, 1.5)
    xyz = rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)
    cov6 = np.tile(np.asarray([1e-4, 0, 0, 1e-4, 0, 1e-4], np.float32), (n, 1))
    vol = particle_volume(jnp.asarray(xyz), cfg.n_grid, cfg.grid_extent)
    state = init_state(jnp.asarray(xyz), jnp.asarray(cov6), vol, cfg)
    state = dataclasses.replace(
        state,
        v=jnp.asarray(2.0 * rng.normal(size=(n, 3)).astype(np.float32)),
        C=jnp.asarray(0.1 * rng.normal(size=(n, 3, 3)).astype(np.float32)),
    )
    model = init_model(cfg, n)
    bcs = BCSet(grid_ops=(make_surface_collider((0, 0, 0.4), (0, 0, 1)),))
    grid = GridConfig(cfg.n_grid, cfg.grid_extent)
    return cfg, state, model, bcs, grid


def _run_soa(state, model, bcs, grid, dt, n_sub):
    soa = soa_from_state(state)
    t = jnp.float32(0.0)
    for _ in range(n_sub):
        soa = substep_soa(soa, model, bcs, t, grid, dt)
        t = t + dt
    return state_from_soa(soa)


def _assert_close(out, ref):
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v), rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.C), np.asarray(ref.C), rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out.F_trial), np.asarray(ref.F_trial), rtol=1e-4, atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(out.F), np.asarray(ref.F), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.yield_stress), np.asarray(ref.yield_stress), rtol=1e-3
    )


@pytest.mark.parametrize("edge", [False, True])
def test_tiled_ref_matches_soa(edge):
    cfg, state, model, bcs, grid = _setup(edge=edge)
    n_sub = 10
    ref = _run_soa(state, model, bcs, grid, cfg.substep_dt, n_sub)
    out, t, ok = run_substeps_tiled(
        soa_from_state(state), model, bcs, jnp.float32(0.0), n_sub, grid,
        cfg.substep_dt, impl="ref",
    )
    assert bool(ok)
    assert abs(float(t) - n_sub * cfg.substep_dt) < 1e-6
    _assert_close(state_from_soa(out), ref)


def test_tiled_ref_matches_soa_metal():
    cfg, state, model, bcs, grid = _setup(material="metal", seed=9)
    ref = _run_soa(state, model, bcs, grid, cfg.substep_dt, 6)
    out, _, ok = run_substeps_tiled(
        soa_from_state(state), model, bcs, jnp.float32(0.0), 6, grid,
        cfg.substep_dt, impl="ref",
    )
    assert bool(ok)
    _assert_close(state_from_soa(out), ref)


def test_tiled_rebucket_roundtrip():
    """bootstrap -> rebucket -> original order is an exact roundtrip."""
    cfg, state, model, bcs, grid = _setup(n=500)
    soa = soa_from_state(state)
    tc = default_tile_config(grid.n_grid, 500)
    ts = bootstrap(soa, model, grid, tc)
    assert bool(ts.ok)
    # every valid row's tile matches its chunk's tile
    ts2 = rebucket(ts, grid, tc)
    q = to_original_order(ts2, 500)
    out = unpack_q(q, soa)
    np.testing.assert_allclose(
        np.asarray(jnp.stack(out.x)), np.asarray(jnp.stack(soa.x))
    )
    np.testing.assert_allclose(np.asarray(out.mass), np.asarray(soa.mass))
    np.testing.assert_allclose(
        np.asarray(jnp.stack(out.F)), np.asarray(jnp.stack(soa.F))
    )


def test_tiled_long_run_with_rebuckets():
    """Enough substeps that fast particles force at least one rebucket."""
    cfg, state, model, bcs, grid = _setup(n=400, seed=11)
    # crank velocities so particles cross >2 cells over the run
    state = dataclasses.replace(state, v=state.v * 40.0)
    n_sub = 30
    ref = _run_soa(state, model, bcs, grid, cfg.substep_dt, n_sub)
    out, _, ok = run_substeps_tiled(
        soa_from_state(state), model, bcs, jnp.float32(0.0), n_sub, grid,
        cfg.substep_dt, impl="ref",
    )
    assert bool(ok)
    _assert_close(state_from_soa(out), ref)


def test_tiled_occ_overflow_reports_not_ok():
    cfg, state, model, bcs, grid = _setup(n=512, edge=True)
    tc = TileConfig(grid.n_grid, 512, S=64, n_occ_cap=1)
    out, _, ok = run_substeps_tiled(
        soa_from_state(state), model, bcs, jnp.float32(0.0), 1, grid,
        cfg.substep_dt, impl="ref", tc=tc,
    )
    assert not bool(ok)


def test_tiled_100grid_matches_soa():
    """The reference's 100-cube scenes (mic/chair/udon, configs n_grid=100)
    exercise nt = ceil(100/8) = 13 tiles/axis — far beyond the nt=2 cases
    above — plus a non-multiple-of-T_TILE grid edge (104 padded cells)."""
    cfg, state, model, bcs, grid = _setup(n=768, g=100, seed=5)
    # cluster particles so occupied tiles stay under the default cap
    x = 0.9 + 0.4 * (np.asarray(state.x) - np.asarray(state.x).min(0)) / 2.0
    state = dataclasses.replace(state, x=jnp.asarray(x.astype(np.float32)))
    tc = default_tile_config(grid.n_grid, int(state.mass.shape[0]))
    assert tc.nt > 6, tc.nt
    n_sub = 8
    ref = _run_soa(state, model, bcs, grid, cfg.substep_dt, n_sub)
    out, _, ok = run_substeps_tiled(
        soa_from_state(state), model, bcs, jnp.float32(0.0), n_sub, grid,
        cfg.substep_dt, impl="ref",
    )
    assert bool(ok)
    _assert_close(state_from_soa(out), ref)
