"""Backward-pass timing: pallas reverse-walk kernel vs XLA autodiff.

The system-ID workload renders 512x512 and backprops every frame
(/root/reference/extra.py:46-47,213-220); VERDICT round 1 flagged the
XLA-replay backward as 2x the slow blend per fit frame.
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
from gsmpm_tpu.render.renderer import RasterConfig, render
from gsmpm_tpu.sim.coupling import grid2world


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--n", type=int, default=8)
    args = ap.parse_args()

    cfg, scene, state, model, bcs, grid, camera, scaling, pos_center = (
        build_problem(245760, 50, args.res)
    )
    bg = jnp.zeros(3)
    opacity = scene.get_opacity().reshape(-1)
    features = scene.get_features()
    xyz_w, cov_w = grid2world(
        state.x, state.cov, scaling, pos_center, cfg.grid_extent
    )
    rng = np.random.default_rng(0)
    ct = jnp.asarray(
        rng.normal(size=(camera.height, camera.width, 3)).astype(np.float32)
    )

    for impl in ("pallas", "xla"):
        rcfg = RasterConfig(impl=impl)

        def fwd(x, c, op):
            return render(x, c, op, features, camera, bg, scene.sh_degree,
                          rcfg)

        f_jit = jax.jit(fwd)
        timeit(f_jit, xyz_w, cov_w, opacity, n=args.n,
               label=f"[{impl}] forward {args.res}^2")

        def fwdbwd(x, c, op):
            out, vjp = jax.vjp(fwd, x, c, op)
            return vjp(ct)

        fb_jit = jax.jit(fwdbwd)
        timeit(fb_jit, xyz_w, cov_w, opacity, n=args.n,
               label=f"[{impl}] forward+backward {args.res}^2")


if __name__ == "__main__":
    main()
