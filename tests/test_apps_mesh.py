"""App-level multi-device equivalence: the PRODUCT entry points scale.

VERDICT r2 item 1: running the apps on the 8-device CPU mesh must produce
the same frames / finite training steps as the single-device run — the
parallel tier is reachable from apps/simulate.py and apps/identify.py, not
only from test harness code.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsmpm_tpu.config import MPMConfig, RenderConfig, SimConfig


# quick-tier CI runs `-m "not slow"` (README); the full suite stays
# the release gate
pytestmark = pytest.mark.slow


def _tiny_cfg(tmp_path, n_grid=24, frames=2):
    cfg = SimConfig()
    cfg.mpm = MPMConfig(
        material="jelly", E=2e4, nu=0.3, n_grid=n_grid, grid_extent=2.0,
        substep_dt=4e-4, frame_dt=4e-3, density=300.0,
        gravity=[0.0, 0.0, -9.8],
        sim_area=[[-10, -10, -10], [10, 10, 10]],
    )
    cfg.render = RenderConfig(
        output_path=str(tmp_path), num_frames=frames, white_background=False,
    )
    return cfg


def test_simulate_app_mesh_matches_single(tmp_path):
    """python -m gsmpm_tpu.apps.simulate on the 8-device mesh == single."""
    from gsmpm_tpu.apps.simulate import simulate

    assert jax.device_count() == 8
    cfg_a = _tiny_cfg(tmp_path / "single")
    frames_single = simulate(
        cfg_a, synthetic=128, frames=2, quiet=True, mesh="none",
        synthetic_res=64,
    )
    cfg_b = _tiny_cfg(tmp_path / "mesh")
    frames_mesh = simulate(
        cfg_b, synthetic=128, frames=2, quiet=True, mesh="auto",
        synthetic_res=64,
    )
    assert len(frames_single) == len(frames_mesh) == 3
    for fs, fm in zip(frames_single, frames_mesh):
        # same physics + same renderer semantics; tolerance covers the
        # reduction-order difference of the psum'd grid
        np.testing.assert_allclose(fm, fs, atol=2e-2)
        assert np.mean(np.abs(fm.astype(np.float64) - fs)) < 2e-4


def test_simulate_app_mesh_halo_engine_big_grid(tmp_path):
    """n_grid >= 64 with an x-spread scene selects the halo engine from the
    app door and still matches the single-device run."""
    from gsmpm_tpu.apps.simulate import simulate
    from gsmpm_tpu.parallel import engines

    picked = []
    orig_frame = engines.MeshSimEngine.frame

    def spy(self, state, model, t):
        picked.append(self.engine)
        return orig_frame(self, state, model, t)

    engines.MeshSimEngine.frame = spy
    try:
        cfg_a = _tiny_cfg(tmp_path / "single", n_grid=64)
        frames_single = simulate(
            cfg_a, synthetic=512, frames=1, quiet=True, mesh="none",
            synthetic_res=64,
        )
        cfg_b = _tiny_cfg(tmp_path / "mesh", n_grid=64)
        frames_mesh = simulate(
            cfg_b, synthetic=512, frames=1, quiet=True, mesh="auto",
            synthetic_res=64,
        )
    finally:
        engines.MeshSimEngine.frame = orig_frame
    assert picked and picked[0] == "halo", picked
    for fs, fm in zip(frames_single, frames_mesh):
        np.testing.assert_allclose(fm, fs, atol=2e-2)
        assert np.mean(np.abs(fm.astype(np.float64) - fs)) < 2e-4


def test_simulate_app_mesh_halo_tiled2d_engine(tmp_path):
    """--mesh engine=halo_tiled2d (4x2 rectangle decomposition) through the
    app door matches the single-device run (VERDICT r4 item 6).  A 64^3
    grid has only 8 x-tiles, so a 1-D 8-way slab split is impossible —
    exactly the shape the 2-D engine exists for."""
    from gsmpm_tpu.apps.simulate import simulate
    from gsmpm_tpu.parallel import engines

    picked = []
    orig_frame = engines.MeshSimEngine.frame

    def spy(self, state, model, t):
        picked.append(self.engine)
        return orig_frame(self, state, model, t)

    engines.MeshSimEngine.frame = spy
    try:
        cfg_a = _tiny_cfg(tmp_path / "single", n_grid=64, frames=2)
        frames_single = simulate(
            cfg_a, synthetic=512, frames=2, quiet=True, mesh="none",
            synthetic_res=64,
        )
        cfg_b = _tiny_cfg(tmp_path / "mesh", n_grid=64, frames=2)
        frames_mesh = simulate(
            cfg_b, synthetic=512, frames=2, quiet=True,
            mesh="auto,engine=halo_tiled2d", synthetic_res=64,
        )
    finally:
        engines.MeshSimEngine.frame = orig_frame
    # the engine must have run AND STAYED 2-D for both frames (a frame-1
    # bootstrap overflow would flip the SECOND frame's entry to psum)
    assert picked == ["halo_tiled2d", "halo_tiled2d"], picked
    for fs, fm in zip(frames_single, frames_mesh):
        np.testing.assert_allclose(fm, fs, atol=2e-2)
        assert np.mean(np.abs(fm.astype(np.float64) - fs)) < 2e-4


def test_identify_app_mesh_sharded_fit(monkeypatch, tmp_path):
    """apps/identify.py --mesh auto routes fit_frame through the sharded
    step and still recovers: loss finite, E moves from its init."""
    from gsmpm_tpu.apps import identify as identify_mod

    argv = [
        "--synthetic", "64", "--iters", "1", "--frames", "2",
        "--resolution", "32", "--no_appearance",
        "--E_true", "3e3", "--nu_true", "0.3",
        "--E_init", "1e4", "--nu_init", "0.4",
        "--output_path", str(tmp_path),
    ]
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="torus")
    p.add_argument("--output_path", default=str(tmp_path))
    p.add_argument("--data_path", default=None)
    p.add_argument("--synthetic", type=int, default=None)
    p.add_argument("--iters", type=int, default=1)
    p.add_argument("--frames", type=int, default=2)
    p.add_argument("--resolution", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no_appearance", action="store_true")
    p.add_argument("--tie_params", action="store_true")
    p.add_argument("--mesh", default="auto")
    p.add_argument("--E_true", type=float, default=1e5)
    p.add_argument("--nu_true", type=float, default=0.3)
    p.add_argument("--E_init", type=float, default=2e6)
    p.add_argument("--nu_init", type=float, default=0.4)
    args = p.parse_args(argv)

    ident = identify_mod.identify(args)
    assert ident.mesh is not None, "identify must pick the sharded fit step"
    assert np.isfinite(ident.optimized_E)
    assert ident.optimized_E != pytest.approx(1e4, rel=1e-6)  # E moved


def test_mesh_engine_halo_fallback_to_psum(tmp_path):
    """When the halo engine cannot take a frame (capacity overflow at
    bootstrap), MeshSimEngine redoes it on the psum engine and stays there
    (VERDICT r2 weak-6: the fallback path has a production caller and is
    exercised end-to-end)."""
    import jax.numpy as jnp

    from gsmpm_tpu.config import MPMConfig
    from gsmpm_tpu.models.synthetic import synthetic_box_scene
    from gsmpm_tpu.parallel import make_mesh, pad_particles
    from gsmpm_tpu.parallel.engines import MeshSimEngine
    from gsmpm_tpu.parallel.halo import HaloConfig
    from gsmpm_tpu.sim.boundary import BCSet, make_surface_collider
    from gsmpm_tpu.sim.coupling import world2grid
    from gsmpm_tpu.sim.solver import postprocess, run_substeps
    from gsmpm_tpu.sim.state import GridConfig, init_model, init_state
    from gsmpm_tpu.sim.volume import particle_volume

    cfg = MPMConfig(
        material="jelly", E=2e4, nu=0.3, n_grid=64, grid_extent=2.0,
        substep_dt=4e-4, density=300.0, gravity=[0.0, 0.0, -9.8],
    )
    scene = synthetic_box_scene(n=2048, lo=(-0.8, -0.3, 0.2),
                                hi=(0.8, 0.3, 0.8))
    g_xyz, pos_center, scaling = world2grid(scene.xyz, cfg.grid_extent)
    g_cov = scene.get_covariance() * (scaling * scaling)
    vol = particle_volume(g_xyz, cfg.n_grid, cfg.grid_extent)
    state = init_state(g_xyz, g_cov, vol, cfg)
    model = init_model(cfg, 2048)
    bcs = BCSet(grid_ops=(make_surface_collider((0, 0, 0.4), (0, 0, 1)),))
    grid = GridConfig(cfg.n_grid, cfg.grid_extent)
    mesh = make_mesh((("data", 8),))
    state, model, _, n = pad_particles(state, model, 8)

    eng = MeshSimEngine(
        mesh, "data", state, model, bcs, grid, cfg.substep_dt, 10,
        prefer="halo",
    )
    assert eng.engine == "halo"
    # sabotage capacity: bootstrap can never fit all particles
    eng._halo_hc = HaloConfig(
        ndev=8, n_grid=cfg.n_grid, cap=128,
        margin=eng._halo_hc.margin,
    )
    out_state, t, R = eng.frame(state, model, jnp.float32(0.0))
    assert eng.engine == "psum"  # fell back and stays there

    want, _ = run_substeps(
        state, model, bcs, jnp.float32(0.0), 10, grid, cfg.substep_dt,
        checkpoint_policy=None,
    )
    cov6, _ = postprocess(want)
    np.testing.assert_allclose(
        np.asarray(out_state.x), np.asarray(want.x), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_state.cov), np.asarray(cov6), rtol=1e-3, atol=1e-5
    )


def test_identify_app_camera_dp(tmp_path, capsys):
    """apps/identify.py --data_path with a 2-camera observation set on a
    multi-device mesh routes through the camera-DP fit step (one camera
    per device, psum'd grads) and trains: loss finite, E moves."""
    import argparse
    import json
    import os

    from tests.test_dataset import _camera_files, _write_png

    from gsmpm_tpu.apps import identify as identify_mod
    from gsmpm_tpu.models.synthetic import synthetic_blob_scene
    from gsmpm_tpu.render.renderer import RasterConfig
    from gsmpm_tpu.sim.fitting import FitConfig, SystemIdentifier

    res, n, n_frames = 48, 128, 3
    defs, cams = _camera_files(res, [(0.0, 0.8, 3.0), (3.0, 0.8, 0.0)])
    scene = synthetic_blob_scene(n=n, radius=0.4, center=(0.0, 0.8, 0.0))
    init_v = jnp.tile(jnp.asarray([0.0, -2.0, 0.0], jnp.float32)[None],
                      (n, 1))
    mpm_cfg = MPMConfig(
        material="jelly", E=1e4, nu=0.4, n_grid=50, grid_extent=2.0,
        gravity=[0.0, -9.81, 0.0], fitting=True,
    )
    gen = SystemIdentifier(
        scene, mpm_cfg, init_velocity=init_v,
        fit_cfg=FitConfig(substeps_per_frame=30),
        raster_cfg=RasterConfig(block=32, k_block=n, chunk=32, impl="xla"),
        bg=jnp.ones(3),
    )
    with open(tmp_path / "camera.json", "w") as f:
        json.dump(defs, f)
    for ci, d in enumerate(defs):
        gt = gen.generate_ground_truth(3e3, 0.3, [cams[ci]], n_frames)
        os.makedirs(tmp_path / d["camera"], exist_ok=True)
        for fid in range(n_frames):
            _write_png(tmp_path / d["camera"] / f"{fid:03d}.png",
                       np.asarray(gt[fid]))

    p = argparse.ArgumentParser()
    for name, default in (
        ("--scene", "torus"), ("--output_path", str(tmp_path / "out")),
        ("--data_path", str(tmp_path)), ("--mesh", "auto"),
    ):
        p.add_argument(name, default=default)
    p.add_argument("--synthetic", type=int, default=n)
    p.add_argument("--iters", type=int, default=1)
    p.add_argument("--frames", type=int, default=n_frames)
    p.add_argument("--resolution", type=int, default=res)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no_appearance", action="store_true", default=True)
    p.add_argument("--tie_params", action="store_true", default=False)
    p.add_argument("--E_true", type=float, default=3e3)
    p.add_argument("--nu_true", type=float, default=0.3)
    p.add_argument("--E_init", type=float, default=1e4)
    p.add_argument("--nu_init", type=float, default=0.4)
    args = p.parse_args([])

    ident = identify_mod.identify(args)
    out = capsys.readouterr().out
    assert "camera-DP over 2 devices" in out, out[-500:]
    assert np.isfinite(ident.optimized_E)


def test_simulate_app_mesh_halo_tiled_engine(tmp_path):
    """The COMPOSED engine (x-tile-slab halo exchange + tiled MXU local
    transfer, parallel/halo_tiled.py) is reachable from apps/simulate.py
    via --mesh engine=halo_tiled and matches the single-device run
    (VERDICT r3 item 4)."""
    from gsmpm_tpu.apps.simulate import simulate
    from gsmpm_tpu.parallel import engines

    picked = []
    orig_frame = engines.MeshSimEngine.frame

    def spy(self, state, model, t):
        picked.append(self.engine)
        return orig_frame(self, state, model, t)

    engines.MeshSimEngine.frame = spy
    try:
        cfg_a = _tiny_cfg(tmp_path / "single", n_grid=128)
        frames_single = simulate(
            cfg_a, synthetic=512, frames=1, quiet=True, mesh="none",
            synthetic_res=64,
        )
        cfg_b = _tiny_cfg(tmp_path / "mesh", n_grid=128)
        frames_mesh = simulate(
            cfg_b, synthetic=512, frames=1, quiet=True,
            mesh="auto,engine=halo_tiled", synthetic_res=64,
        )
    finally:
        engines.MeshSimEngine.frame = orig_frame
    assert picked and picked[0] == "halo_tiled", picked
    assert picked[-1] == "halo_tiled", picked  # no mid-run fallback
    for fs, fm in zip(frames_single, frames_mesh):
        np.testing.assert_allclose(fm, fs, atol=2e-2)
        assert np.mean(np.abs(fm.astype(np.float64) - fs)) < 2e-4
