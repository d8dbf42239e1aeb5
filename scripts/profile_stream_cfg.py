"""A/B the production stream-rasterizer config against the sweep's best
points at the exact bench_render_dropfree workload.

Round-5 BASELINE records B64/C128/U4 as production (25.1-27.5 Mpix/s) and
B32/C512/U2 as the best sweep point (~29).  This script re-measures the
candidates on the current tree, checks n_dropped == 0 and pixel agreement
vs the two-tier drop-free path, and prints the winner so the production
selection in bench.py / apps/simulate.py can adopt it with evidence.

    python scripts/profile_stream_cfg.py [--reps 5]
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
    ap.add_argument("--n_grid", type=int, default=50)
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--substeps", type=int, default=100)
    ap.add_argument("--settle_frames", type=int, default=3)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import bench_mpm, build_problem
    from gsmpm_tpu.render.renderer import (
        RasterConfig, render_with_aux, required_raster_caps,
    )
    from gsmpm_tpu.render.stream_raster import required_stream_caps
    from gsmpm_tpu.sim.coupling import grid2world
    from gsmpm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    (cfg, scene, state, model, bcs, grid, camera, scaling, pos_center) = (
        build_problem(args.particles, args.n_grid, args.res)
    )
    _, state = bench_mpm(
        cfg, state, model, bcs, grid, args.substeps, args.settle_frames
    )

    bg = jnp.zeros(3)
    opacity = scene.get_opacity().reshape(-1)
    features = scene.get_features()
    xyz_w, cov_w = grid2world(
        state.x, state.cov, scaling, pos_center, cfg.grid_extent
    )

    def up(needed):
        return max(128, -(-int(needed * 1.25) // 128) * 128)

    need = required_raster_caps(xyz_w, cov_w, opacity, camera, RasterConfig())
    ref_cfg = RasterConfig()._replace(
        k_dense=up(need["k_tile"]),
        n_dense=min(max(need["n_fine_over"] + 4, 8), 64),
        k_coarse=up(need["k_coarse"]),
        k_global=up(need["k_global"]),
    )

    def stream_cfg(B, C, U):
        scfg = RasterConfig(block=B, stream=True, stream_chunk=C,
                            stream_unroll=U)
        sneed = required_stream_caps(xyz_w, cov_w, opacity, camera, scfg)
        return scfg._replace(
            stream_g2=max(256, -(-int(sneed["stream_g2"] * 1.5) // 32) * 32),
            stream_g3=max(64, -(-int(sneed["stream_g3"] * 1.5) // 32) * 32),
            stream_g4=max(16, -(-int(sneed["stream_g4"] * 1.5) // 32) * 32),
        )

    variants = {
        "prod B64 C128 U4": stream_cfg(64, 128, 4),
        "B32 C512 U2": stream_cfg(32, 512, 2),
        "B32 C256 U2": stream_cfg(32, 256, 2),
        "B32 C512 U1": stream_cfg(32, 512, 1),
        "B64 C256 U2": stream_cfg(64, 256, 2),
    }

    mpix = camera.width * camera.height / 1e6
    ref_img = None

    @jax.jit
    def ref_frame(xyz_g, cov_g, opacity, features):
        xw, cw = grid2world(xyz_g, cov_g, scaling, pos_center,
                            cfg.grid_extent)
        return render_with_aux(xw, cw, opacity, features, camera, bg,
                               scene.sh_degree, ref_cfg)

    ref_img, ref_nd = ref_frame(state.x, state.cov, opacity, features)
    ref_img = np.asarray(ref_img)
    print(f"two-tier reference: n_dropped={int(ref_nd)}", flush=True)

    for name, rcfg in variants.items():
        @jax.jit
        def frame(xyz_g, cov_g, opacity, features, rcfg=rcfg):
            xw, cw = grid2world(xyz_g, cov_g, scaling, pos_center,
                                cfg.grid_extent)
            return render_with_aux(xw, cw, opacity, features, camera, bg,
                                   scene.sh_degree, rcfg)

        try:
            t0 = time.perf_counter()
            img, nd = frame(state.x, state.cov, opacity, features)
            jax.block_until_ready(img)
            compile_s = time.perf_counter() - t0
        except Exception as e:
            print(f"{name:20s} FAILED: {type(e).__name__}: {str(e)[:160]}")
            continue
        err = float(np.max(np.abs(np.asarray(img) - ref_img)))
        xs = [state.x * (1.0 + 1e-6 * (i + 1))
              for i in range(2 * args.reps)]
        best = 0.0
        for g in range(2):
            t0 = time.perf_counter()
            for i in range(g * args.reps, (g + 1) * args.reps):
                img2, _ = frame(xs[i], state.cov, opacity, features)
            np.asarray(img2.ravel()[0])
            dt = (time.perf_counter() - t0) / args.reps
            best = max(best, mpix / dt)
        print(f"{name:20s} {best:8.2f} Mpix/s   n_dropped={int(nd)}"
              f"   max|img-ref|={err:.2e}   (compile {compile_s:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
