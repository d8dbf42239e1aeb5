"""Stage breakdown of the streaming rasterizer at the bench scene.

Times each pipeline stage in isolation (separate jits; chained-dispatch
style like scripts/profile_render.py) so the optimization target is
measured, not guessed.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timeit(fn, *args, reps=6):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=245760)
    ap.add_argument("--n_grid", type=int, default=50)
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--unroll", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import bench_mpm, build_problem
    from gsmpm_tpu.render import stream_raster as sr
    from gsmpm_tpu.render.renderer import (
        RasterConfig, _raw_planes_nosentinel, preprocess,
    )
    from gsmpm_tpu.sim.coupling import grid2world
    from gsmpm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    (cfg, scene, state, model, bcs, grid, camera, scaling, pos_center) = (
        build_problem(args.particles, args.n_grid, args.res)
    )
    _, state = bench_mpm(cfg, state, model, bcs, grid, 100, 2)

    rcfg = RasterConfig(block=args.block, stream=True,
                        stream_unroll=args.unroll)
    opacity = scene.get_opacity().reshape(-1)
    features = scene.get_features()
    bg = jnp.zeros(3)
    xyz_w, cov_w = grid2world(
        state.x, state.cov, scaling, pos_center, cfg.grid_extent
    )
    xyz_w = jax.device_put(xyz_w)

    sh_degree = scene.sh_degree

    @jax.jit
    def f_pre(xyz_w, cov_w, opacity, features):
        pre = preprocess(xyz_w, cov_w, opacity, features, camera, sh_degree,
                         rcfg)
        return pre

    pre = f_pre(xyz_w, cov_w, opacity, features)
    print(f"preprocess            {timeit(f_pre, xyz_w, cov_w, opacity, features):7.2f} ms")

    @jax.jit
    def f_emit(pre):
        planes = _raw_planes_nosentinel(pre)[:9]
        keys, emis, nd, lv = sr.stream_emission(pre, camera, rcfg, planes)
        return keys, emis

    keys, emis = f_emit(pre)
    print(f"emission (keys+planes){timeit(f_emit, pre):7.2f} ms   L={keys.shape[0]}")

    @jax.jit
    def f_sort(keys, emis):
        ops = (keys,) + tuple(emis[i] for i in range(9))
        return jax.lax.sort(ops, num_keys=1)

    sorted_ops = f_sort(keys, emis)
    print(f"10-operand sort       {timeit(f_sort, keys, emis):7.2f} ms")

    @jax.jit
    def f_sort2(keys):
        return jax.lax.sort((keys, keys), num_keys=1)

    print(f"2-operand sort        {timeit(f_sort2, keys):7.2f} ms")

    skeys = sorted_ops[0]
    splanes = jnp.stack(sorted_ops[1:10])
    lv = sr._stream_levels(pre, camera, rcfg)
    nf, M = lv.nf, lv.M

    @jax.jit
    def f_tables(skeys):
        bounds = jnp.searchsorted(
            skeys, jnp.arange(nf + 1, dtype=jnp.int32) * M
        ).astype(jnp.int32)
        C = sr._CHUNK
        U = rcfg.stream_unroll
        UC = U * C
        L = skeys.shape[0]
        L_pad = -(-L // UC) * UC
        nstep = L_pad // UC + nf
        return sr._build_tables(bounds, L_pad, UC, nf, nstep), bounds

    tables, bounds = f_tables(skeys)
    print(f"bounds+tables         {timeit(f_tables, skeys):7.2f} ms   "
          f"nstep_real={int(np.sum(np.asarray(tables['live'])))} "
          f"nstep={tables['blk'].shape[0]}")

    C = sr._CHUNK
    U = rcfg.stream_unroll
    UC = U * C
    L = skeys.shape[0]
    L_pad = -(-L // UC) * UC
    nstep = L_pad // UC + nf
    if L_pad != L:
        splanes_p = jnp.pad(splanes, ((0, 0), (0, L_pad - L)))
    else:
        splanes_p = splanes
    B = rcfg.block
    meta = (C, U, B, B * B, float(rcfg.t_min), float(rcfg.alpha_min),
            nstep, lv.nbx, nf)

    @jax.jit
    def f_kernel(tables, splanes_p):
        return sr._stream_core(tables, splanes_p, meta)

    out = f_kernel(tables, splanes_p)
    print(f"stream kernel (fwd)   {timeit(f_kernel, tables, splanes_p):7.2f} ms")

    # how much of the stream is actually walked?
    live = np.asarray(tables["live"]).astype(bool)
    lastrow = np.asarray(out[:, 5, :])
    b_counts = np.asarray(bounds[1:] - bounds[:-1])
    print(f"real candidates       {int(b_counts.sum())}   "
          f"max segment {int(b_counts.max())}   "
          f"nonempty blocks {(b_counts > 0).sum()}/{nf}")

    # backward pieces
    @jax.jit
    def f_bwd_kernel(tables, splanes_p, out):
        g = jnp.ones_like(out)
        _, vjp = jax.vjp(lambda sp: sr._stream_core(tables, sp, meta),
                         splanes_p)
        return vjp(g)[0]

    print(f"stream kernel (bwd)   {timeit(f_bwd_kernel, tables, splanes_p, out):7.2f} ms")

    @jax.jit
    def f_sort_vjp(keys, emis):
        def f(e):
            ops = (keys,) + tuple(e[i] for i in range(9))
            so = jax.lax.sort(ops, num_keys=1)
            return jnp.stack(so[1:10])

        _, vjp = jax.vjp(f, emis)
        return vjp(jnp.ones((9, keys.shape[0]), jnp.float32))[0]

    print(f"sort transpose (vjp)  {timeit(f_sort_vjp, keys, emis):7.2f} ms")

    @jax.jit
    def f_emit_vjp(pre):
        def f(p9):
            _, emis, _, _ = sr.stream_emission(pre, camera, rcfg, p9)
            return emis

        planes = _raw_planes_nosentinel(pre)[:9]
        _, vjp = jax.vjp(f, planes)
        return vjp(jnp.ones((9, keys.shape[0]), jnp.float32))[0]

    print(f"emission transpose    {timeit(f_emit_vjp, pre):7.2f} ms")


if __name__ == "__main__":
    main()
