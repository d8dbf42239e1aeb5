"""Stage-level profiling of the renderer on the real TPU.

Times: preprocess, depth sort, candidate selection (_select_candidates),
gather of raw planes, pallas blend, XLA blend path end-to-end, pallas path
end-to-end.  Run on the TPU chip (axon).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_problem
from gsmpm_tpu.render.renderer import (
    RasterConfig, _blend_blocks, _raw_planes, _render_pallas_fwd_impl,
    _select_candidates, preprocess,
)
from gsmpm_tpu.sim.coupling import grid2world


def timeit(fn, *args, n=5, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:34s} {dt*1e3:8.2f} ms")
    return out


def main():
    cfg, scene, state, model, bcs, grid, camera, scaling, pos_center = (
        build_problem(245760, 50, 800)
    )
    rcfg = RasterConfig()
    bg = jnp.zeros(3)
    opacity = scene.get_opacity().reshape(-1)
    features = scene.get_features()
    xyz_w, cov_w = grid2world(
        state.x, state.cov, scaling, pos_center, cfg.grid_extent
    )
    xyz_w = jax.block_until_ready(xyz_w)

    pre_fn = jax.jit(
        lambda x, c, op, fe: preprocess(
            x, c, op, fe, camera, scene.sh_degree, rcfg
        )
    )
    pre = timeit(pre_fn, xyz_w, cov_w, opacity, features, label="preprocess")

    sort_fn = jax.jit(
        lambda p: jnp.argsort(jnp.where(p.valid, p.depth, jnp.inf))
    )
    order = timeit(sort_fn, pre, label="depth argsort")

    sel_fn = jax.jit(
        lambda p, o: _select_candidates(p, o, camera, rcfg)
    )
    gidx, counts, origins = timeit(sel_fn, pre, order, label="_select_candidates")
    print(f"  counts: max={int(np.max(np.asarray(counts)))} "
          f"mean={float(np.mean(np.asarray(counts))):.0f}")

    gather_fn = jax.jit(
        lambda p, gi: _raw_planes(p)[:, gi.reshape(-1)].reshape(10, *gi.shape)
    )
    cand_raw = timeit(gather_fn, pre, gidx, label="raw planes gather")

    from gsmpm_tpu.render.pallas_blend import blend_blocks_pallas
    blend_fn = jax.jit(
        lambda cr, ct: blend_blocks_pallas(cr, ct, origins, bg, rcfg)
    )
    timeit(blend_fn, cand_raw, counts, label="pallas blend")

    xla_blend_fn = jax.jit(
        lambda p, o: _blend_blocks(p, o, camera, bg, rcfg)
    )
    timeit(xla_blend_fn, pre, order, label="XLA blend (two-stage+scan)")

    pallas_e2e = jax.jit(
        lambda p, o: _render_pallas_fwd_impl(p, o, camera, bg, rcfg)
    )
    timeit(pallas_e2e, pre, order, label="pallas fwd e2e (sel+gather+blend)")


if __name__ == "__main__":
    main()
