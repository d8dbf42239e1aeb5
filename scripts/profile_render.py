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
    ap.add_argument("--v2_stages", action="store_true",
                    help="time the dup-sort v2 selection sub-stages")
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

    if args.v2_stages:
        # fine-grained sub-stages of _select_candidates_dupsort_v2
        from gsmpm_tpu.render.renderer import (
            _COARSE, _depth_bits, _tile_interval, block_origins,
        )

        B = rcfg.block
        origins, nbx, nby = block_origins(camera, rcfg)
        N = 245760
        n4 = 4 * N
        ncx, ncy = -(-nbx // _COARSE), -(-nby // _COARSE)
        nf, nc = nbx * nby, ncx * ncy
        gid = nf + nc
        ntt = nf + nc + 1
        db = _depth_bits(ntt)
        M = jnp.int32(1 << db)
        sent = jnp.int32(2 ** 31 - 1)

        def build_keys(p):
            dq = jax.lax.shift_right_logical(
                jax.lax.bitcast_convert_type(
                    jnp.maximum(p.depth, rcfg.z_near), jnp.int32), 31 - db)
            fx0, fx1, offx = _tile_interval(p.pix_x, p.radius, B, nbx)
            fy0, fy1, offy = _tile_interval(p.pix_y, p.radius, B, nby)
            valid = p.valid & ~(offx | offy)
            spx, spy = fx1 - fx0, fy1 - fy0
            lvl0 = valid & (spx <= 1) & (spy <= 1)
            cx0, cx1 = fx0 // _COARSE, fx1 // _COARSE
            cy0, cy1 = fy0 // _COARSE, fy1 // _COARSE
            cspx, cspy = cx1 - cx0, cy1 - cy0
            lvl1 = valid & ~lvl0 & (cspx <= 1) & (cspy <= 1)
            lvl2 = valid & ~lvl0 & ~lvl1
            keys = []
            for dy in (0, 1):
                for dx in (0, 1):
                    ft = (fy0 + dy) * nbx + (fx0 + dx)
                    fok = lvl0 & (dx <= spx) & (dy <= spy)
                    ct = nf + (cy0 + dy) * ncx + (cx0 + dx)
                    cok = lvl1 & (dx <= cspx) & (dy <= cspy)
                    gok = lvl2 & (dx == 0) & (dy == 0)
                    tile = jnp.where(fok, ft, jnp.where(cok, ct, gid))
                    ok = fok | cok | gok
                    keys.append(jnp.where(ok, tile * M + dq, sent))
            return jnp.concatenate(keys)

        _, keys = timeit(jax.jit(build_keys), pre, n=n, label="v2: key build")
        pays = jnp.tile(jnp.arange(N, dtype=jnp.int32), 4)
        sort_fn2 = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1))
        _, (skeys, spay) = timeit(sort_fn2, keys, pays,
                                  label="v2: (2,4N) pair sort", n=n)
        bounds_fn = jax.jit(lambda sk: jnp.searchsorted(
            sk, jnp.arange(ntt + 1, dtype=jnp.int32) * M).astype(jnp.int32))
        _, bounds = timeit(bounds_fn, skeys, n=n, label="v2: bounds")

        st = jnp.stack([skeys, spay])
        k0 = min(rcfg.k_tile, N)
        k1 = min(rcfg.k_coarse, N)
        k2 = min(rcfg.k_global, N)
        bx = jnp.arange(nbx, dtype=jnp.int32)
        by = jnp.arange(nby, dtype=jnp.int32)
        t_f = (by[:, None] * nbx + bx[None, :]).reshape(-1)
        parent = ((by[:, None] // _COARSE) * ncx
                  + (bx[None, :] // _COARSE)).reshape(-1)

        def windows_all(st, bounds):
            def windows(tile_ids, k):
                s = bounds[tile_ids]
                e = bounds[tile_ids + 1]
                w = s[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
                wf = jnp.minimum(w, n4 - 1).reshape(-1)
                kk = st[:, wf].reshape(2, *w.shape)
                live = w < e[:, None]
                dqw = jnp.where(live, kk[0] & (M - 1), sent)
                gw = jnp.where(live, kk[1], 0)
                return dqw, gw

            dq_f, g_f = windows(t_f, k0)
            dq_c_all, g_c_all = windows(
                nf + jnp.arange(nc, dtype=jnp.int32), k1
            )
            dq_c, g_c = dq_c_all[parent], g_c_all[parent]
            dq_g, g_g = windows(jnp.full((1,), gid, jnp.int32), k2)
            dq_g = jnp.broadcast_to(dq_g, (nf, k2))
            g_g = jnp.broadcast_to(g_g, (nf, k2))
            return (jnp.concatenate([dq_f, dq_c, dq_g], axis=1),
                    jnp.concatenate([g_f, g_c, g_g], axis=1))

        _, (dq_all, g_all) = timeit(jax.jit(windows_all), st, bounds,
                                    n=n, label="v2: windows+concat")
        merge_fn = jax.jit(
            lambda d, g: jax.lax.sort((d, g), num_keys=1, dimension=1))
        timeit(merge_fn, dq_all, g_all, n=n, label="v2: merge row-sort")

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
