"""Pallas tiled-transfer kernels vs the pure-JAX tiled reference.

Runs in interpret mode on CPU; the same comparison runs compiled on real TPU
via scripts/validate_pallas_tpu.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsmpm_tpu.config import MPMConfig
from gsmpm_tpu.sim.boundary import BCSet, make_surface_collider
from gsmpm_tpu.sim.kernels import soa_from_state, state_from_soa
from gsmpm_tpu.sim.state import GridConfig, init_model, init_state
from gsmpm_tpu.sim.tiles import (
    RDRIFT,
    bootstrap,
    default_tile_config,
    g2p_tiled_ref,
    p2g_tiled_ref,
    run_substeps_tiled,
)
from gsmpm_tpu.sim.volume import particle_volume


def _setup(n=600, g=16, seed=5):
    cfg = MPMConfig(
        E=2e4, nu=0.3, material="jelly", n_grid=g, grid_extent=2.0,
        substep_dt=1e-4, frame_dt=1e-2, density=200.0,
    )
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(0.1, 1.9, size=(n, 3)).astype(np.float32)
    cov6 = np.tile(np.asarray([1e-4, 0, 0, 1e-4, 0, 1e-4], np.float32), (n, 1))
    vol = particle_volume(jnp.asarray(xyz), cfg.n_grid, cfg.grid_extent)
    state = init_state(jnp.asarray(xyz), jnp.asarray(cov6), vol, cfg)
    state = dataclasses.replace(
        state,
        v=jnp.asarray(2.0 * rng.normal(size=(n, 3)).astype(np.float32)),
        C=jnp.asarray(0.1 * rng.normal(size=(n, 3, 3)).astype(np.float32)),
    )
    model = init_model(cfg, n)
    grid = GridConfig(cfg.n_grid, cfg.grid_extent)
    return cfg, state, model, grid


def test_p2g_pallas_matches_ref():
    from gsmpm_tpu.sim.pallas_mpm import p2g_tiled_pallas

    cfg, state, model, grid = _setup()
    soa = soa_from_state(state)
    tc = default_tile_config(grid.n_grid, soa.mass.shape[0])
    ts = bootstrap(soa, model, grid, tc)
    rng = np.random.default_rng(0)
    sig = jnp.asarray(
        np.concatenate([
            1e3 * rng.normal(size=(9, tc.np_rows)),
            np.zeros((7, tc.np_rows)),
        ]).astype(np.float32)
    )
    ref = p2g_tiled_ref(ts, sig, grid, tc, cfg.substep_dt)
    out = p2g_tiled_pallas(ts, sig, grid, tc, cfg.substep_dt)
    scale = float(jnp.max(jnp.abs(ref))) or 1.0
    # kernel matmuls run as 3-pass bf16 splits (_mm3) vs the ref's f32
    np.testing.assert_allclose(
        np.asarray(out) / scale, np.asarray(ref) / scale, atol=2e-5
    )


def test_g2p_pallas_matches_ref():
    from gsmpm_tpu.sim.pallas_mpm import g2p_tiled_pallas

    cfg, state, model, grid = _setup(seed=7)
    soa = soa_from_state(state)
    tc = default_tile_config(grid.n_grid, soa.mass.shape[0])
    ts = bootstrap(soa, model, grid, tc)
    rng = np.random.default_rng(1)
    windows = jnp.asarray(
        rng.normal(size=(tc.ntiles, 192, 64)).astype(np.float32)
    )
    ref = g2p_tiled_ref(ts, windows, grid, tc, cfg.substep_dt)
    out = g2p_tiled_pallas(ts, windows, grid, tc, cfg.substep_dt)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=3e-4, atol=1e-4
    )


def test_full_substeps_pallas_matches_ref():
    cfg, state, model, grid = _setup(n=400, seed=8)
    bcs = BCSet(grid_ops=(make_surface_collider((0, 0, 0.4), (0, 0, 1)),))
    soa = soa_from_state(state)
    ref, _, ok_r = run_substeps_tiled(
        soa, model, bcs, jnp.float32(0.0), 5, grid, cfg.substep_dt, impl="ref"
    )
    out, _, ok_p = run_substeps_tiled(
        soa, model, bcs, jnp.float32(0.0), 5, grid, cfg.substep_dt,
        impl="pallas",
    )
    assert bool(ok_r) and bool(ok_p)
    np.testing.assert_allclose(
        np.asarray(jnp.stack(out.x)), np.asarray(jnp.stack(ref.x)),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.stack(out.v)), np.asarray(jnp.stack(ref.v)),
        rtol=1e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.stack(out.F_trial)), np.asarray(jnp.stack(ref.F_trial)),
        rtol=1e-4, atol=2e-5,
    )
