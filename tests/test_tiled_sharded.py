"""Chunk-sharded tiled MPM vs the single-device tiled path (8-CPU mesh)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gsmpm_tpu.config import MPMConfig
from gsmpm_tpu.parallel.tiled_sharded import (
    make_sharded_frame_tiled,
    sharded_tile_config,
)
from gsmpm_tpu.sim.boundary import BCSet, make_surface_collider
from gsmpm_tpu.sim.kernels import soa_from_state
from gsmpm_tpu.sim.state import GridConfig, init_model, init_state
from gsmpm_tpu.sim.tiles import bootstrap, frame_tiled
from gsmpm_tpu.sim.volume import particle_volume
from jax.sharding import Mesh


import pytest

# quick-tier CI runs `-m "not slow"` (README); the full suite stays
# the release gate
pytestmark = pytest.mark.slow


def _setup(n=800, g=16, seed=4):
    cfg = MPMConfig(
        E=2e4, nu=0.3, material="jelly", n_grid=g, grid_extent=2.0,
        substep_dt=1e-4, frame_dt=1e-2, density=200.0,
    )
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(0.2, 1.8, size=(n, 3)).astype(np.float32)
    cov6 = np.tile(np.asarray([1e-4, 0, 0, 1e-4, 0, 1e-4], np.float32), (n, 1))
    vol = particle_volume(jnp.asarray(xyz), cfg.n_grid, cfg.grid_extent)
    state = init_state(jnp.asarray(xyz), jnp.asarray(cov6), vol, cfg)
    state = dataclasses.replace(
        state, v=jnp.asarray(1.5 * rng.normal(size=(n, 3)).astype(np.float32))
    )
    model = init_model(cfg, n)
    grid = GridConfig(cfg.n_grid, cfg.grid_extent)
    bcs = BCSet(grid_ops=(make_surface_collider((0, 0, 0.4), (0, 0, 1)),))
    return cfg, state, model, grid, bcs


def test_sharded_frame_matches_single_device():
    cfg, state, model, grid, bcs = _setup()
    devices = jax.devices()
    assert len(devices) >= 8, "conftest should provide 8 CPU devices"
    mesh = Mesh(np.array(devices[:8]), ("data",))
    n = state.mass.shape[0]
    tc = sharded_tile_config(cfg.n_grid, n, 8)
    soa = soa_from_state(state)
    ts0 = bootstrap(soa, model, grid, tc)
    assert bool(ts0.ok)
    n_sub = 20

    # single-device reference (same tc, same rebucket cadence semantics:
    # frame_tiled rebuckets on drift; run with fresh bootstrap)
    ts_ref, soa_ref, _ = jax.jit(
        lambda ts, t: frame_tiled(
            ts, soa, model, bcs, t, n_sub, grid, tc, cfg.substep_dt,
            impl="ref",
        )
    )(ts0, jnp.float32(0.0))

    frame = make_sharded_frame_tiled(
        mesh, "data", model, bcs, grid, tc, cfg.substep_dt, n_sub,
        impl="ref", rebucket_every=5,
    )
    ts_sh, soa_sh, _ = jax.jit(frame)(ts0, soa, jnp.float32(0.0))
    assert bool(ts_sh.ok)

    for name in ("x", "v", "F_trial"):
        a = np.asarray(jnp.stack(getattr(soa_sh, name)))
        b = np.asarray(jnp.stack(getattr(soa_ref, name)))
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5, err_msg=name)


def test_sharded_frame_detects_cap_overflow():
    cfg, state, model, grid, bcs = _setup(n=400)
    devices = jax.devices()
    mesh = Mesh(np.array(devices[:4]), ("data",))
    n = state.mass.shape[0]
    # absurdly small occupied-tile cap -> bootstrap/rebucket must flag
    from gsmpm_tpu.sim.tiles import TileConfig

    tc = TileConfig(cfg.n_grid, n, S=64, n_occ_cap=2)
    pad = (-tc.nchunk) % 4
    tc = tc._replace(n_occ_cap=tc.n_occ_cap + pad)
    soa = soa_from_state(state)
    ts0 = bootstrap(soa, model, grid, tc)
    frame = make_sharded_frame_tiled(
        mesh, "data", model, bcs, grid, tc, cfg.substep_dt, 5,
        impl="ref", rebucket_every=5,
    )
    ts_sh, _, _ = jax.jit(frame)(ts0, soa, jnp.float32(0.0))
    assert not bool(ts_sh.ok)
