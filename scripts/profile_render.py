"""Stage-level profiling of the renderer on the real TPU.

Times: preprocess, depth sort, candidate selection (both variants), planes
gather, pallas blend, XLA blend, and both end-to-end paths — with the
dedup-proof timing from scripts/tpu_timing.py (see its docstring: naive
repeat-same-args loops measure nothing on the axon tunnel).
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
from gsmpm_tpu.render.renderer import (
    RasterConfig, _blend_blocks, _raw_planes, _render_pallas_fwd_impl,
    _select_candidates, _select_candidates_dupsort, preprocess, render,
)
from gsmpm_tpu.sim.coupling import grid2world


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--skip_topk", action="store_true")
    ap.add_argument("--block", type=int, default=None)
    ap.add_argument("--n", type=int, default=8)
    args = ap.parse_args()

    cfg, scene, state, model, bcs, grid, camera, scaling, pos_center = (
        build_problem(245760, 50, 800)
    )
    rcfg = RasterConfig() if args.block is None else RasterConfig(block=args.block)
    bg = jnp.zeros(3)
    opacity = scene.get_opacity().reshape(-1)
    features = scene.get_features()
    xyz_w, cov_w = grid2world(
        state.x, state.cov, scaling, pos_center, cfg.grid_extent
    )
    xyz_w = jax.block_until_ready(xyz_w)
    n = args.n

    pre_fn = jax.jit(
        lambda x, c, op, fe: preprocess(
            x, c, op, fe, camera, scene.sh_degree, rcfg
        )
    )
    _, pre = timeit(pre_fn, xyz_w, cov_w, opacity, features, n=n,
                    label="preprocess")

    sort_fn = jax.jit(
        lambda p: jnp.argsort(jnp.where(p.valid, p.depth, jnp.inf))
    )
    _, order = timeit(sort_fn, pre, n=n, label="depth argsort")

    from gsmpm_tpu.render.renderer import (
        _gather_candidates, _select_candidates_dupsort_v2,
    )
    dup_fn = jax.jit(
        lambda p: _select_candidates_dupsort_v2(p, camera, rcfg)
    )
    _, (gidx, counts, origins, dropped) = timeit(
        dup_fn, pre, n=n, label="_select_candidates_dupsort_v2")
    print(f"  dropped: {int(dropped)}")
    print(f"  dup counts: max={int(np.max(np.asarray(counts)))} "
          f"mean={float(np.mean(np.asarray(counts))):.0f}")

    if not args.skip_topk:
        sel_fn = jax.jit(lambda p, o: _select_candidates(p, o, camera, rcfg))
        _, (gidx2, counts2, _) = timeit(sel_fn, pre, order, n=n,
                                        label="_select_candidates (topk)")
        print(f"  topk counts: max={int(np.max(np.asarray(counts2)))} "
              f"mean={float(np.mean(np.asarray(counts2))):.0f}")

    gather_fn = jax.jit(lambda p, gi, ct: _gather_candidates(p, gi, ct))
    _, cand_raw = timeit(gather_fn, pre, gidx, counts, n=n,
                         label="candidate gather v2")

    from gsmpm_tpu.render.pallas_blend import blend_blocks_pallas
    blend_fn = jax.jit(
        lambda cr, ct: blend_blocks_pallas(cr, ct, origins, bg, rcfg)
    )
    timeit(blend_fn, cand_raw, counts, n=n, label="pallas blend")

    xla_blend_fn = jax.jit(lambda p, o: _blend_blocks(p, o, camera, bg, rcfg))
    timeit(xla_blend_fn, pre, order, n=n, label="XLA blend (two-stage+scan)")

    pallas_e2e = jax.jit(
        lambda p: _render_pallas_fwd_impl(p, camera, bg, rcfg)
    )
    timeit(pallas_e2e, pre, n=n, label="pallas fwd e2e (sel+gather+blend)")

    # full-path renders from gaussian inputs
    full_pallas = jax.jit(
        lambda x, c, op, fe: render(
            x, c, op, fe, camera, bg, scene.sh_degree,
            rcfg._replace(impl="pallas"),
        )
    )
    dt, _ = timeit(full_pallas, xyz_w, cov_w, opacity, features, n=n,
                   label="FULL pallas render")
    print(f"  -> {0.64/dt:.1f} Mpix/s")
    full_xla = jax.jit(
        lambda x, c, op, fe: render(
            x, c, op, fe, camera, bg, scene.sh_degree,
            rcfg._replace(impl="xla"),
        )
    )
    dt, _ = timeit(full_xla, xyz_w, cov_w, opacity, features, n=n,
                   label="FULL xla render")
    print(f"  -> {0.64/dt:.1f} Mpix/s")


if __name__ == "__main__":
    main()
