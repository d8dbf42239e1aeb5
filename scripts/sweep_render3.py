"""Sweep 3: noise-controlled timing of final default candidates.

Interleaves the candidate configs round-robin (3 passes x n=8 each) so
machine jitter averages out across configs instead of biasing one.
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

    cands = [
        ("K1152 default", {}),
        ("K896a 512/256/128", dict(k_tile=512, k_coarse=256, k_global=128)),
        ("K896b 640/128/128", dict(k_tile=640, k_coarse=128, k_global=128)),
        ("K640  384/128/128", dict(k_tile=384, k_coarse=128, k_global=128)),
    ]
    fns = {}
    for name, kw in cands:
        rcfg = RasterConfig(impl="pallas", **kw)
        fns[name] = jax.jit(
            lambda x, c, _r=rcfg: render_with_aux(
                x, c, opacity, features, camera, bg, scene.sh_degree, _r
            )
        )
    # compile all first
    for name, _ in cands:
        jax.block_until_ready(fns[name](xyz_w, cov_w)[0])
    times = {name: [] for name, _ in cands}
    for p in range(3):
        for name, _ in cands:
            dt, _ = timeit(fns[name], xyz_w, cov_w, n=8, label="")
            times[name].append(dt)
    for name, _ in cands:
        ts = np.array(times[name]) * 1e3
        best = ts.min()
        print(f"{name:20s} min {best:6.2f} ms ({0.64/best*1e3:5.1f} Mpix/s)"
              f"  runs={np.round(ts, 2).tolist()}", flush=True)


if __name__ == "__main__":
    main()
