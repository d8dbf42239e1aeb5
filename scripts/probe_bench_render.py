"""Probe: why does bench.py's render measure slower than profile_render?

Times the full render path on (a) the initial scene state and (b) the
post-simulation state (3 frames of bench_mpm), with both impls.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gsmpm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from tpu_timing import timeit
from bench import build_problem, bench_mpm
from gsmpm_tpu.render.renderer import RasterConfig, render_with_aux
from gsmpm_tpu.sim.coupling import grid2world


def main():
    cfg, scene, state0, model, bcs, grid, camera, scaling, pos_center = (
        build_problem(245760, 50, 800)
    )
    bg = jnp.zeros(3)
    opacity = scene.get_opacity().reshape(-1)
    features = scene.get_features()

    def run(tag, st, impl):
        rcfg = RasterConfig(impl=impl)

        @jax.jit
        def frame(xyz_g, cov_g):
            xyz_w, cov_w = grid2world(
                xyz_g, cov_g, scaling, pos_center, cfg.grid_extent
            )
            return render_with_aux(
                xyz_w, cov_w, opacity, features, camera, bg,
                scene.sh_degree, rcfg,
            )

        dt, (img, dropped) = timeit(frame, st.x, st.cov, n=8,
                                    label=f"{tag} impl={impl}")
        print(f"  -> {0.64/dt:.1f} Mpix/s  dropped={int(dropped)}")

    run("initial", state0, "pallas")
    run("initial", state0, "xla")

    _, state1 = bench_mpm(cfg, state0, model, bcs, grid, 100, 3)
    x = np.asarray(state1.x)
    print(f"post-sim: x range {x.min(0)} .. {x.max(0)}")
    run("post-sim", state1, "pallas")
    run("post-sim", state1, "xla")


if __name__ == "__main__":
    main()
