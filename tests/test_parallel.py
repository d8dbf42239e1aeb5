"""Distributed semantics on a virtual 8-device CPU mesh (SURVEY.md §4).

Sharded-vs-single-device equivalence of: MPM substeps (particle sharding +
grid psum), tile-sharded rendering, and the full sharded system-ID step
(grads through all_gather/psum).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsmpm_tpu.config import MPMConfig
from gsmpm_tpu.models.synthetic import synthetic_box_scene
from gsmpm_tpu.parallel import (
    make_mesh,
    make_sharded_fit_step,
    make_sharded_frame_fn,
    make_sharded_render_fn,
    pad_particles,
    unpad,
)
from gsmpm_tpu.render.camera import make_camera
from gsmpm_tpu.render.renderer import RasterConfig, render
from gsmpm_tpu.sim.boundary import BCSet, StickyGroundBC, make_surface_collider
from gsmpm_tpu.sim.coupling import grid2world, world2grid
from gsmpm_tpu.sim.solver import postprocess, run_substeps
from gsmpm_tpu.sim.state import GridConfig, init_model, init_state
from gsmpm_tpu.sim.volume import particle_volume


N_PART = 512
N_SUB = 5


# quick-tier CI runs `-m "not slow"` (README); the full suite stays
# the release gate
pytestmark = pytest.mark.slow


def small_setup(fitting=False):
    cfg = MPMConfig(
        E=2e4, nu=0.3, material="jelly", n_grid=16, grid_extent=2.0,
        substep_dt=1e-4, frame_dt=1e-2, density=200.0, fitting=fitting,
    )
    rng = np.random.default_rng(0)
    xyz = rng.uniform(0.6, 1.4, size=(N_PART, 3)).astype(np.float32)
    cov6 = np.tile(
        np.asarray([1e-4, 0, 0, 1e-4, 0, 1e-4], np.float32), (N_PART, 1)
    )
    vol = particle_volume(jnp.asarray(xyz), cfg.n_grid, cfg.grid_extent)
    state = init_state(jnp.asarray(xyz), jnp.asarray(cov6), vol, cfg)
    model = init_model(cfg, N_PART)
    bcs = BCSet(grid_ops=(make_surface_collider((0, 0, 0.4), (0, 0, 1)),))
    grid = GridConfig(cfg.n_grid, cfg.grid_extent)
    return cfg, state, model, bcs, grid


def test_mesh_construction():
    mesh = make_mesh((("data", 4), ("tile", 2)))
    assert mesh.axis_names == ("data", "tile")
    assert mesh.devices.shape == (4, 2)
    mesh = make_mesh((("data", -1),))
    assert mesh.devices.size == len(jax.devices())


def test_sharded_frame_matches_single_device():
    cfg, state, model, bcs, grid = small_setup()

    ref_state, _ = run_substeps(
        state, model, bcs, jnp.float32(0.0), N_SUB, grid, cfg.substep_dt
    )
    ref_cov, _ = postprocess(ref_state)

    mesh = make_mesh((("data", 8),))
    p_state, p_model, _, n = pad_particles(state, model, 8)
    fn = make_sharded_frame_fn(
        mesh, p_state, p_model, bcs, grid, cfg.substep_dt, N_SUB
    )
    out_state, t, _ = fn(p_state, p_model, jnp.float32(0.0))
    out_state = unpad(out_state, n)

    np.testing.assert_allclose(out_state.x, ref_state.x, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out_state.v, ref_state.v, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out_state.F_trial, ref_state.F_trial, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out_state.cov[:n], ref_cov[:n], rtol=1e-4, atol=1e-7)
    assert abs(float(t) - N_SUB * cfg.substep_dt) < 1e-7


def test_sharded_render_matches_single_device():
    scene = synthetic_box_scene(n=256, lo=(-0.4, -0.4, 0.2), hi=(0.4, 0.4, 1.0))
    cam = make_camera(
        64, 64, 0.9, 0.9,
        np.eye(3), np.array([0.0, 0.0, -2.5]),
    )
    bg = jnp.zeros(3)
    rcfg = RasterConfig(block=16, k_block=128, chunk=32, block_batch=4)
    cov6 = scene.get_covariance()
    opac = scene.get_opacity().reshape(-1)
    feats = scene.get_features()

    ref = render(scene.xyz, cov6, opac, feats, cam, bg, scene.sh_degree, rcfg)

    mesh = make_mesh((("data", 4), ("tile", 2)))
    fn = make_sharded_render_fn(
        mesh, 256, cam, bg, scene.sh_degree, rcfg
    )
    out = fn(scene.xyz, cov6, opac, feats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_sharded_fit_step_matches_single_device():
    from gsmpm_tpu.ops.losses import photometric_loss
    from gsmpm_tpu.render.renderer import render as render_full
    from gsmpm_tpu.sim.coupling import mat_from_upper, upper_from_mat
    from gsmpm_tpu.sim.state import mu_lam_from_logE_y

    cfg, state, model, _, grid = small_setup(fitting=True)
    bcs = BCSet(grid_ops=(StickyGroundBC(),))
    scene = synthetic_box_scene(n=N_PART)
    cam = make_camera(64, 64, 0.9, 0.9, np.eye(3), np.array([0.0, 0.0, -2.5]))
    bg = jnp.ones(3)
    opac = scene.get_opacity().reshape(-1)
    feats = scene.get_features()
    scaling, pos_center = jnp.float32(0.8), jnp.zeros(3)
    dt = cfg.frame_dt / N_SUB
    gt = jnp.zeros((64, 64, 3), jnp.float32)

    # single-device reference step
    def frame_loss(logE, y, state, t):
        mu, lam = mu_lam_from_logE_y(logE, y)
        m = dataclasses.replace(model, logE=logE, y=y, mu=mu, lam=lam)
        st, t = run_substeps(
            state, m, bcs, t, N_SUB, grid, dt, fitting=True,
            checkpoint_policy="substep",
        )
        F = st.F
        cov6 = upper_from_mat(
            F @ mat_from_upper(st.init_cov) @ jnp.swapaxes(F, -1, -2)
        )
        xyz_w, cov_w = grid2world(st.x, cov6, scaling, pos_center, cfg.grid_extent)
        img = render_full(
            xyz_w, cov_w, opac, feats, cam, bg, scene.sh_degree,
            RasterConfig(),
        )
        return photometric_loss(img, gt), (st, t, img)

    (ref_loss, (ref_state, _, _)), (ref_gE, ref_gy) = jax.value_and_grad(
        frame_loss, argnums=(0, 1), has_aux=True
    )(model.logE, model.y, state, jnp.float32(0.0))
    ref_logE = model.logE - 0.8 * jnp.clip(ref_gE, -1, 1)
    ref_y = model.y - 1.6 * jnp.clip(ref_gy, -1, 1)

    mesh = make_mesh((("data", 4), ("tile", 2)))
    p_state, p_model, extras, n = pad_particles(
        state, model, 4, {"opacity": opac, "features": feats}
    )
    step = make_sharded_fit_step(
        mesh, p_state, p_model, bcs, grid, cfg.frame_dt, N_SUB, cam, bg,
        extras["opacity"], extras["features"], scene.sh_degree,
        scaling, pos_center, cfg.grid_extent,
    )
    loss, logE, y, out_state, t, img, n_drop, sim_ok = step(
        p_model.logE, p_model.y, p_state, jnp.float32(0.0), gt
    )

    assert abs(float(loss) - float(ref_loss)) < 1e-4
    np.testing.assert_allclose(np.asarray(logE[:n]), np.asarray(ref_logE), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y[:n]), np.asarray(ref_y), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(unpad(out_state, n).x), np.asarray(ref_state.x),
        rtol=1e-5, atol=1e-6,
    )

    # VERDICT r4 item 2 (hard half): the particle-sharded step through the
    # tiled Pallas-VJP fitting engine — each device buckets its own shard,
    # the folded blocked grid psums per substep — must match the
    # single-device reference update
    step_vjp = make_sharded_fit_step(
        mesh, p_state, p_model, bcs, grid, cfg.frame_dt, N_SUB, cam, bg,
        extras["opacity"], extras["features"], scene.sh_degree,
        scaling, pos_center, cfg.grid_extent, sim_engine="tiled_vjp",
    )
    loss_v, logE_v, y_v, state_v, t_v, img_v, nd_v, ok_v = step_vjp(
        p_model.logE, p_model.y, p_state, jnp.float32(0.0), gt
    )
    assert bool(ok_v)
    assert abs(float(loss_v) - float(ref_loss)) < 1e-4
    np.testing.assert_allclose(np.asarray(logE_v[:n]), np.asarray(ref_logE),
                               rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_v[:n]), np.asarray(ref_y),
                               rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(unpad(state_v, n).x), np.asarray(ref_state.x),
        rtol=1e-4, atol=1e-5,
    )


def test_camera_dp_fit_step_matches_mean_of_singles():
    """DP over cameras (SURVEY §2.3): the batched step's loss/update must
    equal the camera-mean of single-camera losses/gradients."""
    from jax.sharding import Mesh

    from gsmpm_tpu.ops.losses import photometric_loss
    from gsmpm_tpu.parallel.sharded import (
        make_camera_dp_fit_step, stack_cameras,
    )
    from gsmpm_tpu.sim.coupling import mat_from_upper, upper_from_mat
    from gsmpm_tpu.sim.state import mu_lam_from_logE_y

    cfg, state, model, bcs, grid = small_setup(fitting=True)
    bcs = BCSet(grid_ops=(StickyGroundBC(),))
    scene = synthetic_box_scene(n=N_PART, lo=(-0.4, -0.4, 0.2), hi=(0.4, 0.4, 1.0))
    g_xyz, pos_center, scaling = world2grid(scene.xyz, cfg.grid_extent)
    opac = scene.get_opacity().reshape(-1)
    feats = scene.get_features()
    bg = jnp.ones(3)
    res = 24
    B = 4
    cams = []
    for k in range(B):
        a = 2.0 * np.pi * k / B
        pos = np.array([1.0 + 2.5 * np.cos(a), 1.0 + 2.5 * np.sin(a), 0.9])
        fwd = np.array([1.0, 1.0, 0.8]) - pos
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, 0.0, 1.0])
        xaxis = np.cross(up, fwd); xaxis /= np.linalg.norm(xaxis)
        yaxis = np.cross(fwd, xaxis)
        R = np.column_stack([xaxis, yaxis, fwd])
        cams.append(make_camera(res, res, 0.8, 0.8, R, pos))
    rng = np.random.default_rng(7)
    gts = jnp.asarray(rng.uniform(0, 1, (B, res, res, 3)).astype(np.float32))

    devs = jax.devices()[:B]
    mesh = Mesh(np.array(devs), ("cam",))
    step = make_camera_dp_fit_step(
        mesh, model, bcs, grid, cfg.frame_dt, N_SUB, bg, opac, feats,
        scene.sh_degree, scaling, pos_center, cfg.grid_extent,
        example_camera=cams[0],
    )
    with mesh:
        loss_b, logE_b, y_b, state_b, t_b, nd_b, ok_b = step(
            model.logE, model.y, state, jnp.float32(0.0),
            stack_cameras(cams), gts,
        )
    assert int(nd_b) == 0  # small scene under default caps: drop-free
    assert bool(ok_b)

    # reference: mean over per-camera single losses and grads
    dt = cfg.frame_dt / N_SUB

    def frame_loss(logE, y, cam, gt):
        mu, lam = mu_lam_from_logE_y(logE, y)
        m = dataclasses.replace(model, logE=logE, y=y, mu=mu, lam=lam)
        st, _ = run_substeps(
            state, m, bcs, jnp.float32(0.0), N_SUB, grid, dt, fitting=True,
            checkpoint_policy="substep",
        )
        F = st.F
        cov6 = upper_from_mat(
            F @ mat_from_upper(st.init_cov) @ jnp.swapaxes(F, -1, -2)
        )
        xyz_w, cov_w = grid2world(st.x, cov6, scaling, pos_center, cfg.grid_extent)
        img = render(xyz_w, cov_w, opac, feats, cam, bg, scene.sh_degree,
                     RasterConfig())
        return photometric_loss(img, gt)

    losses, gEs, gys = [], [], []
    for k in range(B):
        l, (gE, gy) = jax.value_and_grad(
            frame_loss, argnums=(0, 1)
        )(model.logE, model.y, cams[k], gts[k])
        losses.append(float(l)); gEs.append(gE); gys.append(gy)
    mean_loss = float(np.mean(losses))
    gE = sum(gEs) / B
    gy = sum(gys) / B
    ref_logE = model.logE - 0.8 * jnp.clip(gE, -1, 1)
    ref_y = model.y - 1.6 * jnp.clip(gy, -1, 1)

    assert abs(float(loss_b) - mean_loss) < 1e-5, (float(loss_b), mean_loss)
    np.testing.assert_allclose(np.asarray(logE_b), np.asarray(ref_logE),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(ref_y),
                               rtol=1e-4, atol=1e-6)

    # VERDICT r4 item 2: the camera-DP step routed through the tiled
    # Pallas-VJP fitting engine (chunk_impl="vjp"; mm reference chunks on
    # CPU) must produce the same update as the XLA planes engine
    step_vjp = make_camera_dp_fit_step(
        mesh, model, bcs, grid, cfg.frame_dt, N_SUB, bg, opac, feats,
        scene.sh_degree, scaling, pos_center, cfg.grid_extent,
        example_camera=cams[0], sim_engine="tiled_vjp",
    )
    with mesh:
        loss_v, logE_v, y_v, state_v, t_v, nd_v, ok_v = step_vjp(
            model.logE, model.y, state, jnp.float32(0.0),
            stack_cameras(cams), gts,
        )
    assert bool(ok_v)
    assert abs(float(loss_v) - mean_loss) < 1e-4
    np.testing.assert_allclose(np.asarray(logE_v), np.asarray(ref_logE),
                               rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_v), np.asarray(ref_y),
                               rtol=2e-3, atol=1e-5)


def test_sharded_fit_step_tie_params_matches_single():
    """Tied-scalar mode through the sharded step == sgd_learn's tied update
    on single device: the summed gradient psums across particle shards."""
    from gsmpm_tpu.ops.losses import photometric_loss
    from gsmpm_tpu.render.renderer import render as render_full
    from gsmpm_tpu.sim.coupling import mat_from_upper, upper_from_mat
    from gsmpm_tpu.sim.fitting import FitConfig, sgd_learn
    from gsmpm_tpu.sim.state import mu_lam_from_logE_y

    cfg, state, model, _, grid = small_setup(fitting=True)
    bcs = BCSet(grid_ops=(StickyGroundBC(),))
    scene = synthetic_box_scene(n=N_PART)
    cam = make_camera(64, 64, 0.9, 0.9, np.eye(3), np.array([0.0, 0.0, -2.5]))
    bg = jnp.ones(3)
    opac = scene.get_opacity().reshape(-1)
    feats = scene.get_features()
    scaling, pos_center = jnp.float32(0.8), jnp.zeros(3)
    dt = cfg.frame_dt / N_SUB
    gt = jnp.zeros((64, 64, 3), jnp.float32)

    def frame_loss(logE, y, state, t):
        mu, lam = mu_lam_from_logE_y(logE, y)
        m = dataclasses.replace(model, logE=logE, y=y, mu=mu, lam=lam)
        st, t = run_substeps(
            state, m, bcs, t, N_SUB, grid, dt, fitting=True,
            checkpoint_policy="substep",
        )
        F = st.F
        cov6 = upper_from_mat(
            F @ mat_from_upper(st.init_cov) @ jnp.swapaxes(F, -1, -2)
        )
        xyz_w, cov_w = grid2world(st.x, cov6, scaling, pos_center,
                                  cfg.grid_extent)
        img = render_full(
            xyz_w, cov_w, opac, feats, cam, bg, scene.sh_degree,
            RasterConfig(),
        )
        return photometric_loss(img, gt)

    (g_E, g_y) = jax.grad(frame_loss, argnums=(0, 1))(
        model.logE, model.y, state, jnp.float32(0.0)
    )
    ref_logE, ref_y = sgd_learn(
        model.logE, model.y, g_E, g_y, FitConfig(tie_params=True)
    )

    mesh = make_mesh((("data", 4), ("tile", 2)))
    p_state, p_model, extras, n = pad_particles(
        state, model, 4, {"opacity": opac, "features": feats}
    )
    step = make_sharded_fit_step(
        mesh, p_state, p_model, bcs, grid, cfg.frame_dt, N_SUB, cam, bg,
        extras["opacity"], extras["features"], scene.sh_degree,
        scaling, pos_center, cfg.grid_extent, tie_params=True,
    )
    loss, logE, y, out_state, t, img, n_drop, sim_ok = step(
        p_model.logE, p_model.y, p_state, jnp.float32(0.0), gt
    )
    np.testing.assert_allclose(
        np.asarray(logE[:n]), np.asarray(ref_logE), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(y[:n]), np.asarray(ref_y), rtol=1e-4, atol=1e-6
    )
    assert float(jnp.ptp(logE)) < 1e-6  # stays a scalar pair
