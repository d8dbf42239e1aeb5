"""Measure the tiled differentiable fitting window vs the XLA planes path.

VERDICT r3 item 3: the training-step adjoint was ~1.6 s of XLA
scatter/gather transposes (BASELINE.md).  The tiled einsum formulation
(sim/tiles.py:run_substeps_tiled_fitting) keeps both transfer directions as
matmuls, so the jax.grad transposes are matmuls too.  This prints
physics-only forward and forward+backward times for both engines at the
reference fit scale (~245k particles, 50^3, 30 substeps).

Run on the TPU chip:  python scripts/profile_tiled_fit.py [--n 245760]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gsmpm_tpu.config import MPMConfig
from gsmpm_tpu.models.synthetic import synthetic_blob_scene
from gsmpm_tpu.sim.boundary import BCSet, StickyGroundBC
from gsmpm_tpu.sim.coupling import world2grid
from gsmpm_tpu.sim.kernels import soa_from_state, state_from_soa
from gsmpm_tpu.sim.solver import run_substeps
from gsmpm_tpu.sim.state import GridConfig, init_model, init_state, mu_lam_from_logE_y
from gsmpm_tpu.sim.tiles import default_tile_config, run_substeps_tiled_fitting
from gsmpm_tpu.sim.volume import particle_volume


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=245760)
    ap.add_argument("--n_grid", type=int, default=50)
    ap.add_argument("--substeps", type=int, default=30)
    args = ap.parse_args()

    n = args.n
    scene = synthetic_blob_scene(n=n, radius=0.4, center=(0.0, 0.8, 0.0))
    cfg = MPMConfig(material="jelly", E=1e4, nu=0.3, n_grid=args.n_grid,
                    grid_extent=2.0, gravity=[0.0, -9.81, 0.0], fitting=True)
    g_xyz, pc, sc = world2grid(scene.xyz, cfg.grid_extent, pad=0.3)
    g_cov = scene.get_covariance() * sc * sc
    vol = particle_volume(g_xyz, cfg.n_grid, cfg.grid_extent)
    init_v = jnp.tile(jnp.asarray([0.0, -2.0, 0.0], jnp.float32)[None], (n, 1))
    state = init_state(g_xyz, g_cov, vol, cfg, init_v)
    model = init_model(cfg, n)
    bcs = BCSet(grid_ops=(StickyGroundBC(),))
    grid = GridConfig(cfg.n_grid, cfg.grid_extent)
    dt = 0.03 / args.substeps
    tc = default_tile_config(cfg.n_grid, n)
    print(f"n={n} grid={cfg.n_grid} substeps={args.substeps} "
          f"tc: ntiles={tc.ntiles} occ_cap={tc.occ_cap} NP={tc.np_rows}")

    @jax.jit
    def fwd_xla(logE):
        mu, lam = mu_lam_from_logE_y(logE, model.y)
        m = dataclasses.replace(model, logE=logE, mu=mu, lam=lam)
        st, _ = run_substeps(state, m, bcs, jnp.float32(0.0), args.substeps,
                             grid, dt, fitting=True, checkpoint_policy=None)
        return jnp.sum(st.x)

    @jax.jit
    def fwd_tiled(logE):
        mu, lam = mu_lam_from_logE_y(logE, model.y)
        m = dataclasses.replace(model, logE=logE, mu=mu, lam=lam)
        soa, _, ok = run_substeps_tiled_fitting(
            soa_from_state(state), m, bcs, jnp.float32(0.0), args.substeps,
            grid, dt, tc=tc)
        return jnp.sum(soa.x[0]) + jnp.sum(soa.x[1]), ok

    def loss_xla(logE):
        mu, lam = mu_lam_from_logE_y(logE, model.y)
        m = dataclasses.replace(model, logE=logE, mu=mu, lam=lam)
        st, _ = run_substeps(state, m, bcs, jnp.float32(0.0), args.substeps,
                             grid, dt, fitting=True,
                             checkpoint_policy="substep")
        return jnp.sum(st.x * st.x) + jnp.sum(st.F * st.F)

    def make_loss_tiled(impl):
        def loss_tiled(logE):
            mu, lam = mu_lam_from_logE_y(logE, model.y)
            m = dataclasses.replace(model, logE=logE, mu=mu, lam=lam)
            soa, _, ok = run_substeps_tiled_fitting(
                soa_from_state(state), m, bcs, jnp.float32(0.0),
                args.substeps, grid, dt, tc=tc, chunk_impl=impl)
            st = state_from_soa(soa)
            return jnp.sum(st.x * st.x) + jnp.sum(st.F * st.F)
        return loss_tiled

    g_xla = jax.jit(jax.grad(loss_xla))
    g_tiled = jax.jit(jax.grad(make_loss_tiled("mm")))
    g_vjp = jax.jit(jax.grad(make_loss_tiled("vjp")))

    t, _ = timeit(fwd_xla, model.logE)
    print(f"forward xla   : {t*1e3:8.1f} ms")
    t, (_, ok) = timeit(fwd_tiled, model.logE)
    print(f"forward tiled : {t*1e3:8.1f} ms  (ok={bool(ok)})")
    t, gx = timeit(g_xla, model.logE)
    print(f"fwd+bwd xla   : {t*1e3:8.1f} ms")
    t, gt = timeit(g_tiled, model.logE)
    print(f"fwd+bwd mm    : {t*1e3:8.1f} ms")
    t, gv = timeit(g_vjp, model.logE)
    print(f"fwd+bwd VJP   : {t*1e3:8.1f} ms  (pallas transfers both ways)")
    sx, st_, sv = (float(jnp.sum(gx)), float(jnp.sum(gt)),
                   float(jnp.sum(gv)))
    print(f"grad sums xla={sx:.6e} mm={st_:.6e} vjp={sv:.6e}")
    gx_n, gv_n = np.asarray(gx), np.asarray(gv)
    print(f"per-particle |vjp - xla| max "
          f"{np.abs(gv_n - gx_n).max():.3e} of {np.abs(gx_n).max():.3e}")


if __name__ == "__main__":
    main()
