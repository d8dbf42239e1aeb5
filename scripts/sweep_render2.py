"""Sweep 2: find the K knee + fidelity (PSNR vs high-cap golden) per config."""
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

    def run(rcfg):
        fn = jax.jit(
            lambda x, c: render_with_aux(
                x, c, opacity, features, camera, bg, scene.sh_degree, rcfg
            )
        )
        dt, (img, dropped) = timeit(fn, xyz_w, cov_w, n=8, label="")
        return dt, np.asarray(img), int(dropped)

    golden_cfg = RasterConfig(impl="pallas", k_tile=2048, k_coarse=512,
                              k_global=256)
    _, gold, gdrop = run(golden_cfg)
    print(f"golden K2816 dropped={gdrop}", flush=True)

    sweeps = [
        ("K1152 default", {}),
        ("K896", dict(k_tile=512, k_coarse=256, k_global=128)),
        ("K768", dict(k_tile=512, k_coarse=128, k_global=128)),
        ("K640", dict(k_tile=384, k_coarse=128, k_global=128)),
    ]
    for name, kw in sweeps:
        dt, img, dropped = run(RasterConfig(impl="pallas", **kw))
        err = np.abs(img - gold)
        mse = float(np.mean(err ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        print(f"{name:16s} {dt*1e3:7.2f} ms  {0.64/dt:5.1f} Mpix/s  "
              f"dropped={dropped}  PSNR_vs_golden={psnr:.1f} dB  "
              f"maxdiff={float(err.max()):.4f}", flush=True)


if __name__ == "__main__":
    main()
