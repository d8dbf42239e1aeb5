"""Stage breakdown of one system-ID fit_frame at reference scale.

Times, separately, on the current backend:
  fwd       : 30 fitting substeps, no grad
  fwd+bwd   : jax.grad of a substeps-only loss (sum x) — the physics
              adjoint without any rendering
  render    : one 512^2 render of the deformed state
  render+bwd: value_and_grad of photometric loss wrt (xyz, cov)
  full      : the actual SystemIdentifier.fit_frame

Usage: python scripts/profile_fit.py [--particles 245760] [--res 512]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

from gsmpm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gsmpm_tpu.config import MPMConfig
from gsmpm_tpu.models.synthetic import synthetic_blob_scene
from gsmpm_tpu.ops.losses import photometric_loss
from gsmpm_tpu.render.camera import make_camera
from gsmpm_tpu.render.renderer import RasterConfig, render
from gsmpm_tpu.sim.boundary import BCSet, StickyGroundBC
from gsmpm_tpu.sim.coupling import (
    grid2world, mat_from_upper, upper_from_mat, world2grid,
)
from gsmpm_tpu.sim.solver import run_substeps
from gsmpm_tpu.sim.state import (
    GridConfig, init_model, init_state, mu_lam_from_logE_y,
)
from gsmpm_tpu.sim.volume import particle_volume


def timeit(fn, *args, n=3, label=""):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:36s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=245760)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--substeps", type=int, default=30)
    ap.add_argument("--k_tile", type=int, default=1024)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--remat", default="substep",
                    help='"substep" | "none"')
    args = ap.parse_args()
    n = args.particles

    scene = synthetic_blob_scene(n=n, radius=0.4, center=(0.0, 0.8, 0.0))
    cfg = MPMConfig(
        material="jelly", E=1e4, nu=0.3, n_grid=50, grid_extent=2.0,
        gravity=[0.0, -9.81, 0.0], fitting=True,
    )
    grid = GridConfig(cfg.n_grid, cfg.grid_extent)
    g_xyz, pos_center, scaling = world2grid(scene.xyz, cfg.grid_extent, pad=0.3)
    g_cov = scene.get_covariance() * (scaling * scaling)
    vol = particle_volume(g_xyz, cfg.n_grid, cfg.grid_extent)
    init_v = jnp.tile(jnp.asarray([0.0, -2.0, 0.0], jnp.float32)[None], (n, 1))
    state = init_state(g_xyz, g_cov, vol, cfg, init_v)
    model = init_model(cfg, n)
    bcs = BCSet(grid_ops=(StickyGroundBC(),))
    dt = 0.03 / args.substeps
    ckpt = None if args.remat == "none" else "substep"

    @jax.jit
    def fwd(state, logE, y):
        mu, lam = mu_lam_from_logE_y(logE, y)
        m = dataclasses.replace(model, logE=logE, y=y, mu=mu, lam=lam)
        st, _ = run_substeps(
            state, m, bcs, jnp.float32(0.0), args.substeps, grid, dt,
            fitting=True, checkpoint_policy=ckpt,
        )
        return st

    timeit(lambda: fwd(state, model.logE, model.y), label="fwd 30 substeps")

    @jax.jit
    def fwd_bwd_physics(state, logE, y):
        def loss2(logE, y):
            mu, lam = mu_lam_from_logE_y(logE, y)
            m = dataclasses.replace(model, logE=logE, y=y, mu=mu, lam=lam)
            st, _ = run_substeps(
                state, m, bcs, jnp.float32(0.0), args.substeps, grid, dt,
                fitting=True, checkpoint_policy=ckpt,
            )
            return jnp.sum(st.x) + jnp.sum(st.F)
        return jax.grad(loss2, argnums=(0, 1))(logE, y)

    timeit(lambda: fwd_bwd_physics(state, model.logE, model.y),
           label="fwd+bwd physics only")

    # render-only timings on the advected state
    st1 = jax.block_until_ready(fwd(state, model.logE, model.y))
    F = st1.F
    cov6 = upper_from_mat(
        F @ mat_from_upper(st1.init_cov) @ jnp.swapaxes(F, -1, -2)
    )
    cam = make_camera(args.res, args.res, 0.7, 0.7, np.eye(3),
                      np.array([0.0, 0.8, -3.0]))
    bg = jnp.ones(3)
    opac = scene.get_opacity().reshape(-1)
    feats = scene.get_features()
    rcfg = RasterConfig(k_tile=args.k_tile)
    gt = jnp.zeros((args.res, args.res, 3), jnp.float32)

    @jax.jit
    def render_fwd(x, cov6):
        xyz_w, cov_w = grid2world(x, cov6, scaling, pos_center,
                                  cfg.grid_extent)
        return render(xyz_w, cov_w, opac, feats, cam, bg, scene.sh_degree,
                      rcfg)

    timeit(lambda: render_fwd(st1.x, cov6), label=f"render fwd {args.res}^2")

    @jax.jit
    def render_bwd(x, cov6):
        def loss2(x, cov6):
            xyz_w, cov_w = grid2world(x, cov6, scaling, pos_center,
                                      cfg.grid_extent)
            img = render(xyz_w, cov_w, opac, feats, cam, bg,
                         scene.sh_degree, rcfg)
            return photometric_loss(img, gt)
        return jax.grad(loss2, argnums=(0, 1))(x, cov6)

    timeit(lambda: render_bwd(st1.x, cov6), label="render fwd+bwd")

    # the full fit step
    @jax.jit
    def full(state, logE, y):
        def loss(logE, y):
            mu, lam = mu_lam_from_logE_y(logE, y)
            m = dataclasses.replace(model, logE=logE, y=y, mu=mu, lam=lam)
            st, _ = run_substeps(
                state, m, bcs, jnp.float32(0.0), args.substeps, grid, dt,
                fitting=True, checkpoint_policy=ckpt,
            )
            F = st.F
            cov6 = upper_from_mat(
                F @ mat_from_upper(st.init_cov) @ jnp.swapaxes(F, -1, -2)
            )
            xyz_w, cov_w = grid2world(st.x, cov6, scaling, pos_center,
                                      cfg.grid_extent)
            img = render(xyz_w, cov_w, opac, feats, cam, bg,
                         scene.sh_degree, rcfg)
            return photometric_loss(img, gt)
        return jax.value_and_grad(loss, argnums=(0, 1))(logE, y)

    timeit(lambda: full(state, model.logE, model.y), label="FULL fit step")


if __name__ == "__main__":
    main()
