"""Sweep RasterConfig knobs for the full pallas render on the real TPU.

Reports ms/frame, Mpix/s and the cap-overflow drop count per config on the
bench workload (245k gaussians, 800x800).
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
from bench import build_problem
from gsmpm_tpu.render.renderer import RasterConfig, render_with_aux
from gsmpm_tpu.sim.coupling import grid2world


def main():
    cfg, scene, state, model, bcs, grid, camera, scaling, pos_center = (
        build_problem(245760, 50, 800)
    )
    bg = jnp.zeros(3)
    opacity = scene.get_opacity().reshape(-1)
    features = scene.get_features()
    xyz_w, cov_w = grid2world(
        state.x, state.cov, scaling, pos_center, cfg.grid_extent
    )
    xyz_w = jax.block_until_ready(xyz_w)

    sweeps = [
        ("default", {}),
        ("K896", dict(k_tile=512, k_coarse=256, k_global=128)),
        ("K1024", dict(k_tile=768, k_coarse=128, k_global=128)),
        ("chunk128", dict(chunk=128)),
        ("chunk32", dict(chunk=32)),
        ("B128", dict(block=128, k_tile=1024, k_coarse=256, k_global=128)),
        ("B32", dict(block=32, k_tile=512, k_coarse=128, k_global=128)),
    ]
    for name, kw in sweeps:
        rcfg = RasterConfig(impl="pallas", **kw)

        fn = jax.jit(
            lambda x, c: render_with_aux(
                x, c, opacity, features, camera, bg, scene.sh_degree, rcfg
            )
        )
        dt, (img, dropped) = timeit(fn, xyz_w, cov_w, n=8, label=name)
        print(f"  -> {0.64/dt:.1f} Mpix/s  dropped={int(dropped)}",
              flush=True)


if __name__ == "__main__":
    main()
