"""On-chip A/B of the drop-free render paths at the bench scene.

Builds the exact bench_render_dropfree workload (245k gaussians settled
into the compact box, 800^2) and times: legacy truncating, two-tier
drop-free, and the sorted-segment STREAM drop-free path over (block,
unroll) variants.  Usage:

    python scripts/profile_stream.py [--particles N] [--res R] [--quick]
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
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--bwd", action="store_true",
                    help="also time forward+backward via jax.grad")
    args = ap.parse_args()
    if args.quick:
        args.particles, args.n_grid, args.res = 16384, 32, 256
        args.substeps, args.settle_frames = 20, 1

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

    need = required_raster_caps(xyz_w, cov_w, opacity, camera,
                                RasterConfig())
    print("windowed caps needed:", need, flush=True)

    variants = {}
    variants["legacy(truncating)"] = RasterConfig()
    variants["two-tier dropfree"] = RasterConfig()._replace(
        k_dense=up(need["k_tile"]),
        n_dense=min(max(need["n_fine_over"] + 4, 8), 64),
        k_coarse=up(need["k_coarse"]),
        k_global=up(need["k_global"]),
    )
    for B in (16, 32):
        scfg = RasterConfig(block=B, stream=True)
        sneed = required_stream_caps(xyz_w, cov_w, opacity, camera, scfg)
        if B == 64:
            print("stream tier populations:", sneed, flush=True)
        g2 = max(256, -(-int(sneed["stream_g2"] * 1.3) // 128) * 128)
        g3 = max(64, 2 * sneed["stream_g3"])
        g4 = max(16, 2 * sneed["stream_g4"])
        for U in (4, 8, 16):
            variants[f"stream B{B} U{U}"] = RasterConfig(
                block=B, stream=True, stream_g2=g2, stream_g3=g3,
                stream_g4=g4, stream_unroll=U,
            )

    mpix = camera.width * camera.height / 1e6
    for name, rcfg in variants.items():
        @jax.jit
        def frame(xyz_g, cov_g, opacity, features, rcfg=rcfg):
            xw, cw = grid2world(
                xyz_g, cov_g, scaling, pos_center, cfg.grid_extent
            )
            return render_with_aux(
                xw, cw, opacity, features, camera, bg, scene.sh_degree,
                rcfg,
            )

        try:
            t0 = time.perf_counter()
            img, nd = frame(state.x, state.cov, opacity, features)
            jax.block_until_ready(img)
            compile_s = time.perf_counter() - t0
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:200]}")
            continue
        xs = [state.x * (1.0 + 1e-6 * (i + 1)) for i in range(2 * args.reps)]
        best = 0.0
        for g in range(2):
            t0 = time.perf_counter()
            for i in range(g * args.reps, (g + 1) * args.reps):
                img, nd2 = frame(xs[i], state.cov, opacity, features)
            np.asarray(img.ravel()[0])
            dt = (time.perf_counter() - t0) / args.reps
            best = max(best, mpix / dt)
        print(f"{name:24s} {best:8.2f} Mpix/s   n_dropped={int(nd)}"
              f"   (compile {compile_s:.0f}s)", flush=True)

        if args.bwd and "stream" in name:
            tgt = jnp.zeros((camera.height, camera.width, 3), jnp.float32)

            @jax.jit
            def step(xyz_g, cov_g, opacity, features, rcfg=rcfg):
                def loss(xyz_g, cov_g, opacity, features):
                    xw, cw = grid2world(
                        xyz_g, cov_g, scaling, pos_center, cfg.grid_extent
                    )
                    img, _ = render_with_aux(
                        xw, cw, opacity, features, camera, bg,
                        scene.sh_degree, rcfg,
                    )
                    return jnp.mean((img - tgt) ** 2)

                return jax.value_and_grad(loss, argnums=(0, 1, 2))(
                    xyz_g, cov_g, opacity, features
                )

            v, g_ = step(state.x, state.cov, opacity, features)
            jax.block_until_ready(v)
            t0 = time.perf_counter()
            for i in range(args.reps):
                v, g_ = step(xs[i], state.cov, opacity, features)
            jax.block_until_ready(v)
            dt = (time.perf_counter() - t0) / args.reps
            print(f"{name:24s} fwd+bwd {dt * 1e3:8.1f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
