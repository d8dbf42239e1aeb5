"""Probe the stream-renderer-in-fitting runtime anomaly (BASELINE.md
"Stream renderer in the fitting step").

Reproduces the bench_fit workload with a STREAM raster config and tests
whether `jax.clear_caches()` between the ground-truth generation (whose
jitted stream renders are the known trigger) and the fit step avoids the
`INVALID_ARGUMENT: TPU backend error`.

    python scripts/probe_stream_fit.py [--clear] [--particles N] [--res R]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=245760)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--substeps", type=int, default=30)
    ap.add_argument("--clear", action="store_true",
                    help="jax.clear_caches() between GT gen and fitting")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gsmpm_tpu.config import MPMConfig
    from gsmpm_tpu.models.synthetic import synthetic_blob_scene
    from gsmpm_tpu.render.camera import make_camera
    from gsmpm_tpu.render.renderer import RasterConfig
    from gsmpm_tpu.sim.fitting import FitConfig, SystemIdentifier
    from gsmpm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    n_particles = args.particles
    scene = synthetic_blob_scene(n=n_particles, radius=0.4,
                                 center=(0.0, 0.8, 0.0))
    cfg = MPMConfig(
        material="jelly", E=1e4, nu=0.3, n_grid=50, grid_extent=2.0,
        gravity=[0.0, -9.81, 0.0], fitting=True,
    )
    init_v = jnp.tile(jnp.asarray([0.0, -2.0, 0.0], jnp.float32)[None],
                      (n_particles, 1))
    ident = SystemIdentifier(
        scene, cfg, init_velocity=init_v,
        fit_cfg=FitConfig(substeps_per_frame=args.substeps),
        raster_cfg=RasterConfig(stream=True, stream_unroll=4),
        bg=jnp.ones(3),
    )
    center = np.asarray(scene.xyz.mean(0))
    pos = center + np.array([0.0, 0.25, 3.0])
    fwd = center - pos
    fwd /= np.linalg.norm(fwd)
    down = np.array([0.0, -1.0, 0.0])
    yv = down - down.dot(fwd) * fwd
    yv /= np.linalg.norm(yv)
    cam = make_camera(args.res, args.res, 0.7, 0.7,
                      np.column_stack([np.cross(yv, fwd), yv, fwd]), pos)

    t0 = time.perf_counter()
    gt = ident.generate_ground_truth(3e3, 0.3, [cam], 2)[1]
    jax.block_until_ready(gt)
    print(f"GT generation (stream renders): OK in "
          f"{time.perf_counter() - t0:.0f}s", flush=True)

    if args.clear:
        jax.clear_caches()
        print("jax.clear_caches() done", flush=True)

    state = ident.reset_state()
    t = jnp.float32(0.0)
    try:
        for i in range(2):
            t0 = time.perf_counter()
            loss, state, t, img = ident.fit_frame(state, t, cam, gt)
            jax.block_until_ready(img)
            print(f"fit_frame {i}: loss={float(loss):.5f} "
                  f"n_dropped={ident.n_dropped_last} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"FIT FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
        return 1
    # steady-state timing
    t0 = time.perf_counter()
    for _ in range(3):
        loss, state, t, img = ident.fit_frame(state, t, cam, gt)
    np.asarray(img.ravel()[0])
    print(f"steady-state fit_frame: "
          f"{(time.perf_counter() - t0) / 3:.3f} s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
