"""halo_tiled2d: 2-D (x, y) tile-rectangle halo decomposition.

VERDICT r4 item 6: SURVEY §2.3 "shard grid into blocks across mesh axes" —
the 1-D x-slab engine caps device count at nt/2; the 2-D engine decomposes
over a ("hx", "hy") mesh with dimension-split exchanges (corners ride two
hops).  Pinned against the single-device dense path on a 4x2 8-virtual-
device CPU mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from gsmpm_tpu.config import MPMConfig
from gsmpm_tpu.parallel.halo import original_view
from gsmpm_tpu.parallel.halo_tiled2d import (
    bootstrap_slots_2d,
    make_halo_tiled2d_frame,
    quantile_tile_starts_2d,
)
from gsmpm_tpu.sim.boundary import BCSet, make_surface_collider
from gsmpm_tpu.sim.kernels import state_from_soa
from gsmpm_tpu.sim.solver import run_substeps
from gsmpm_tpu.sim.state import GridConfig, init_model, init_state
from gsmpm_tpu.sim.volume import particle_volume


# quick-tier CI runs `-m "not slow"` (README); the full suite stays
# the release gate
pytestmark = pytest.mark.slow


def _problem(n=4096, n_grid=64, seed=0):
    rng = np.random.default_rng(seed)
    cfg = MPMConfig(
        E=2e4, nu=0.3, material="jelly", n_grid=n_grid, grid_extent=2.0,
        substep_dt=2e-4, density=300.0, gravity=[0.0, 0.0, -9.8],
    )
    ext = cfg.grid_extent
    # spread in x AND y so both axes admit >= 2 tiles per mesh dimension
    x = np.stack([
        rng.uniform(0.05 * ext, 0.95 * ext, n),
        rng.uniform(0.05 * ext, 0.95 * ext, n),
        rng.uniform(0.45 * ext, 0.70 * ext, n),
    ], axis=1).astype(np.float32)
    cov = np.tile(np.array([1e-4, 0, 0, 1e-4, 0, 1e-4], np.float32), (n, 1))
    vol = particle_volume(jnp.asarray(x), n_grid, ext)
    v0 = np.tile(np.array([[0.8, -0.6, -0.5]], np.float32), (n, 1))
    state = init_state(jnp.asarray(x), jnp.asarray(cov), vol, cfg,
                       jnp.asarray(v0))
    model = init_model(cfg, n)
    grid = GridConfig(n_grid, ext)
    bcs = BCSet(grid_ops=(make_surface_collider((0, 0, 0.3), (0, 0, 1)),))
    return cfg, state, model, grid, bcs


def test_quantile_tile_starts_2d_geometry():
    rng = np.random.default_rng(1)
    xy = rng.uniform(0.0, 2.0, (4096, 2)).astype(np.float32)
    # a 64^3 grid has nt=8: a 1-D 8-way split needs 16 tiles (impossible)
    # but a 4x2 rectangle split fits
    from gsmpm_tpu.parallel.halo_tiled import quantile_tile_starts

    assert quantile_tile_starts(xy[:, 0], 64, 2.0, 8) is None
    res = quantile_tile_starts_2d(xy, 64, 2.0, 4, 2)
    assert res is not None
    txs, tys, hc2, tc = res
    assert txs[0] == 0 and txs[-1] == 8
    assert tys[0] == 0 and tys[-1] == 8
    assert all(b - a >= 2 for a, b in zip(txs, txs[1:]))
    assert all(b - a >= 2 for a, b in zip(tys, tys[1:]))
    assert hc2.ndev == 8
    # too many devices for either axis -> None
    assert quantile_tile_starts_2d(xy, 64, 2.0, 8, 1) is None


def test_halo_tiled2d_matches_single_device():
    cfg, state, model, grid, bcs = _problem()
    n = state.x.shape[0]
    devs = jax.devices()
    assert len(devs) == 8
    dx, dy = 4, 2

    res = quantile_tile_starts_2d(
        np.asarray(state.x[:, :2]), cfg.n_grid, cfg.grid_extent, dx, dy
    )
    assert res is not None, "test scene must admit tile rectangles"
    txs, tys, hc2, tc = res
    tc = tc._replace(n_occ_cap=256)  # CPU test speed; ok flag guards

    mesh = Mesh(np.array(devs).reshape(dx, dy), ("hx", "hy"))
    substeps = 10
    frame = jax.jit(make_halo_tiled2d_frame(
        mesh, "hx", "hy", bcs, grid, hc2, tc, cfg.substep_dt, substeps,
        migrate_every=5, impl="ref",
    ))
    soa, aux, material, orig, ok0 = bootstrap_slots_2d(
        state, model, txs, tys, grid, hc2, dx, dy
    )
    assert bool(ok0)
    with mesh:
        soa, aux, material, orig, full, t, ok = frame(
            soa, aux, material, orig, jnp.asarray(txs, jnp.int32),
            jnp.asarray(tys, jnp.int32), model, jnp.float32(0.0),
        )
    assert bool(ok), "tile/slab capacity or drift tripped in test scene"
    got = state_from_soa(original_view(full, n))

    want, _ = run_substeps(
        state, model, bcs, jnp.float32(0.0), substeps, grid, cfg.substep_dt,
        checkpoint_policy=None,
    )
    np.testing.assert_allclose(
        np.asarray(got.x), np.asarray(want.x), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.v), np.asarray(want.v), rtol=5e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.F_trial), np.asarray(want.F_trial),
        rtol=5e-4, atol=5e-5,
    )
