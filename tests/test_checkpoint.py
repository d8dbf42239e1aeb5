"""Checkpoint/resume: pytree round-trip and bitwise-identical resumed sims."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from gsmpm_tpu.config import MPMConfig
from gsmpm_tpu.io.checkpoint import latest_step, restore_checkpoint, save_checkpoint
from gsmpm_tpu.sim.boundary import BCSet, make_surface_collider
from gsmpm_tpu.sim.solver import run_substeps
from gsmpm_tpu.sim.state import GridConfig, init_model, init_state
from gsmpm_tpu.sim.volume import particle_volume


def _setup(n=256):
    cfg = MPMConfig(
        E=2e4, nu=0.3, material="jelly", n_grid=16, grid_extent=2.0,
        substep_dt=1e-4, frame_dt=1e-2, density=200.0,
    )
    rng = np.random.default_rng(0)
    xyz = rng.uniform(0.6, 1.4, size=(n, 3)).astype(np.float32)
    cov6 = np.tile(np.asarray([1e-4, 0, 0, 1e-4, 0, 1e-4], np.float32), (n, 1))
    vol = particle_volume(jnp.asarray(xyz), cfg.n_grid, cfg.grid_extent)
    state = init_state(jnp.asarray(xyz), jnp.asarray(cov6), vol, cfg)
    model = init_model(cfg, n)
    bcs = BCSet(grid_ops=(make_surface_collider((0, 0, 0.4), (0, 0, 1)),))
    return cfg, state, model, bcs, GridConfig(cfg.n_grid, cfg.grid_extent)


def test_roundtrip_and_latest(tmp_path):
    cfg, state, model, bcs, grid = _setup()
    d = str(tmp_path / "ckpt")
    assert latest_step(d) is None
    save_checkpoint(d, 3, (state, model), extra={"frame": 3})
    save_checkpoint(d, 7, (state, model), extra={"frame": 7})
    assert latest_step(d) == 7
    (state2, model2), step, extra = restore_checkpoint(d, (state, model))
    assert step == 7 and extra == {"frame": 7}
    np.testing.assert_array_equal(np.asarray(state.x), np.asarray(state2.x))
    np.testing.assert_array_equal(np.asarray(state.F), np.asarray(state2.F))
    np.testing.assert_array_equal(np.asarray(model.logE), np.asarray(model2.logE))
    # static metadata survives via the template treedef
    assert model2.active_materials == model.active_materials
    assert model2.hardening == model.hardening


def test_resumed_sim_matches_uninterrupted(tmp_path):
    cfg, state, model, bcs, grid = _setup()
    t0 = jnp.float32(0.0)

    # uninterrupted: 10 substeps
    ref_state, ref_t = run_substeps(state, model, bcs, t0, 10, grid, cfg.substep_dt)

    # interrupted: 5 substeps -> checkpoint -> restore -> 5 more
    mid_state, mid_t = run_substeps(state, model, bcs, t0, 5, grid, cfg.substep_dt)
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 5, (mid_state, model, mid_t))
    (r_state, r_model, r_t), _, _ = restore_checkpoint(d, (mid_state, model, mid_t))
    out_state, out_t = run_substeps(r_state, r_model, bcs, r_t, 5, grid, cfg.substep_dt)

    np.testing.assert_array_equal(np.asarray(out_state.x), np.asarray(ref_state.x))
    np.testing.assert_array_equal(np.asarray(out_state.v), np.asarray(ref_state.v))
    np.testing.assert_array_equal(
        np.asarray(out_state.F_trial), np.asarray(ref_state.F_trial)
    )
    assert float(out_t) == float(ref_t)


def test_structure_mismatch_rejected(tmp_path):
    cfg, state, model, bcs, grid = _setup()
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 1, (state,))
    try:
        restore_checkpoint(d, (state, model))
    except ValueError as e:
        assert "structure mismatch" in str(e)
    else:
        raise AssertionError("expected ValueError on structure mismatch")
