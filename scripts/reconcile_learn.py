"""Reconcile per-particle learn() vs tied-scalar system identification.

VERDICT r2 item 6: the reference's actual learn() mode is per-particle
clipped SGD on (logE, y) with lr 0.8/1.6
(/root/reference/mpm_solver/solver.py:92-108), read out as the particle
mean (extra.py:248-249).  BASELINE.md records that this mode moves mean E
by only ~1e-5 decades/step while the tied-scalar extension converges in
~50 iterations.  Why, exactly:

  The loss is a pixel MEAN; each particle's logE_p only enters through
  that particle's stress contribution, so g_p ~= g_total / N for a
  homogeneous scene (sum_p g_p == g_total is the chain rule for the
  broadcast scalar).  Per-particle SGD therefore moves mean logE by
  lr * mean(g_p) = lr * g_total / N — N times slower than the tied
  update lr * clip(g_total) whenever the clip is inactive.  The
  reference's own schedule (300 iters x 19 frames = 5700 steps) buys back
  a factor 5700, which at N = 2048 covers ~2.8x the tied mode's 250-step
  budget IF the gradient stays the same size — i.e. the reference's mode
  is slow but not structurally stalled at small N, and is hopeless at the
  240k-particle scale (N/steps ~= 42).

This script verifies all three claims empirically on the recorded
BASELINE.md scene (2048-gaussian blob, E*=3e3 from E0=3e4, 256^2,
30 substeps, 6 frames):

  A. per-particle reference lrs: measure decades/step, extrapolate the
     full 5700-step schedule;
  B. per-particle with lr x N (the derived equivalence): recovers E like
     the tied mode;
  C. tied-scalar (the shipped --tie_params): the reference point.

Usage: python scripts/reconcile_learn.py [--iters 50] [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--quick" in sys.argv or "--cpu" in sys.argv:
    # CPU run must be forced via jax.config before first backend use (the
    # shell pins JAX_PLATFORMS=axon; see tests/conftest.py)
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

from gsmpm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from gsmpm_tpu.config import MPMConfig
from gsmpm_tpu.models.synthetic import synthetic_blob_scene
from gsmpm_tpu.render.camera import make_camera
from gsmpm_tpu.render.renderer import RasterConfig
from gsmpm_tpu.sim.fitting import FitConfig, SystemIdentifier


def build(n, res, substeps, fit_cfg):
    scene = synthetic_blob_scene(n=n, radius=0.4, center=(0.0, 0.8, 0.0))
    cfg = MPMConfig(
        material="jelly", E=3e4, nu=0.4, n_grid=50, grid_extent=2.0,
        gravity=[0.0, -9.81, 0.0], fitting=True,
    )
    init_v = jnp.tile(jnp.asarray([0.0, -2.0, 0.0], jnp.float32)[None],
                      (n, 1))
    ident = SystemIdentifier(
        scene, cfg, init_velocity=init_v, fit_cfg=fit_cfg,
        raster_cfg=RasterConfig(k_block=min(512, n)), bg=jnp.ones(3),
    )
    center = np.asarray(scene.xyz.mean(0))
    pos = center + np.array([0.0, 0.25, 3.0])
    fwd = center - pos
    fwd /= np.linalg.norm(fwd)
    down = np.array([0.0, -1.0, 0.0])
    yv = down - down.dot(fwd) * fwd
    yv /= np.linalg.norm(yv)
    cam = make_camera(res, res, 0.7, 0.7,
                      np.column_stack([np.cross(yv, fwd), yv, fwd]), pos)
    return ident, cam


def run_mode(name, fit_cfg, n, res, substeps, n_frames, iters, E_true,
             nu_true):
    ident, cam = build(n, res, substeps, fit_cfg)
    gt = ident.generate_ground_truth(E_true, nu_true, [cam], n_frames)
    logE_hist = [float(np.log10(ident.optimized_E))]
    t0 = time.time()
    for it in range(1, iters + 1):
        state = ident.reset_state()
        t = jnp.float32(0.0)
        for fid in range(1, n_frames):
            loss, state, t, _ = ident.fit_frame(state, t, cam, gt[fid])
        logE_hist.append(float(np.log10(ident.optimized_E)))
        if it in (1, 2, 5, 10, 20, 30, 50) or it == iters:
            print(f"  [{name}] iter {it:3d}: E={ident.optimized_E:10.4g} "
                  f"nu={ident.optimized_nu:.4f} loss={float(loss):.5f} "
                  f"({(time.time()-t0)/it:.2f}s/iter)", flush=True)
    return ident, np.array(logE_hist)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--substeps", type=int, default=30)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--pp_iters", type=int, default=10,
                    help="iterations for the slope measurement of mode A")
    ap.add_argument("--E_true", type=float, default=3e3)
    ap.add_argument("--nu_true", type=float, default=0.3)
    ap.add_argument("--quick", action="store_true",
                    help="small sizes for a CPU smoke run")
    args = ap.parse_args()
    if args.quick:
        args.n, args.res, args.substeps = 256, 64, 8
        args.iters, args.pp_iters, args.frames = 6, 3, 3

    n = args.n
    steps_per_iter = args.frames - 1
    target_decades = abs(np.log10(3e4) - np.log10(args.E_true))

    print(f"== A: per-particle, reference lrs (0.8/1.6), "
          f"{args.pp_iters} iters ==")
    identA, histA = run_mode(
        "A", FitConfig(substeps_per_frame=args.substeps),
        n, args.res, args.substeps, args.frames, args.pp_iters,
        args.E_true, args.nu_true,
    )
    slope = (histA[0] - histA[-1]) / (args.pp_iters * steps_per_iter)
    ref_steps = 300 * 19
    print(f"A: mean-logE slope = {slope:.3e} decades/SGD-step")
    print(f"A: extrapolated over the reference's full 300x19 schedule "
          f"({ref_steps} steps): {slope * ref_steps:.2f} decades moved "
          f"(needed: {target_decades:.2f})")
    print(f"A: derived N-slowdown check: slope*N = {slope * n:.3e} "
          "decades/step — compare to mode C's early slope below")

    print(f"== B: per-particle, lr x N = ({0.8 * n:.0f}/{1.6 * n:.0f}), "
          f"{args.iters} iters ==")
    identB, histB = run_mode(
        "B", FitConfig(substeps_per_frame=args.substeps,
                       lr_logE=0.8 * n, lr_y=1.6 * n,
                       grad_clip=1.0 / n),
        n, args.res, args.substeps, args.frames, args.iters,
        args.E_true, args.nu_true,
    )

    print(f"== C: tied scalar (--tie_params), {args.iters} iters ==")
    identC, histC = run_mode(
        "C", FitConfig(substeps_per_frame=args.substeps, tie_params=True),
        n, args.res, args.substeps, args.frames, args.iters,
        args.E_true, args.nu_true,
    )
    slopeC = (histC[0] - histC[min(3, len(histC) - 1)]) / (
        min(3, len(histC) - 1) * steps_per_iter
    )
    print(f"C: early slope = {slopeC:.3e} decades/SGD-step "
          f"(A's slope*N = {slope * n:.3e})")

    errB = abs(np.log10(identB.optimized_E) - np.log10(args.E_true))
    errC = abs(np.log10(identC.optimized_E) - np.log10(args.E_true))
    print("\n== Summary ==")
    print(f"A per-particle ref-lrs : {slope:.2e} dec/step -> "
          f"{slope * ref_steps:.2f} decades over the 300x19 schedule")
    print(f"B per-particle lr x N  : final E {identB.optimized_E:.4g} "
          f"(|dlog10 E| = {errB:.3f})")
    print(f"C tied scalar          : final E {identC.optimized_E:.4g} "
          f"(|dlog10 E| = {errC:.3f})")


if __name__ == "__main__":
    main()
