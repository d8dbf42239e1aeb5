"""One parameterized measurement tool (VERDICT r2 weak-7 consolidation).

Replaces the numbered scratch generations probe_gather{,2..5}.py,
sweep_render{,2,3}.py, microbench_sg{,2}.py with three subcommands — the
latest (noise-controlled) methodology of each line of experiments:

  python scripts/sweep.py render   # rasterizer cap-config sweep on the
                                   # 245k/800^2 bench scene (round-robin
                                   # interleaved so jitter averages out)
  python scripts/sweep.py gather   # dup-sort selection windows() cost with
                                   # and without upstream fusion + the
                                   # searchsorted method variants
  python scripts/sweep.py sg       # raw scatter/gather/argsort microbench
                                   # (chained iterations defeat async-
                                   # dispatch artifacts), incl. sorted-index
                                   # and narrow-payload variants

All timings print milliseconds on the current backend.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gsmpm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, label=None):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    if label is not None:
        print(f"{label:52s} {dt*1e3:8.3f} ms", flush=True)
    return dt, out


def timeit_chain(fn, x0, *args, n=20):
    """fn(x, *args) -> x-like; chains x through n calls (defeats dispatch
    pipelining and the tunnel's identical-dispatch dedup)."""
    x = fn(x0, *args)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    x = x0
    for _ in range(n):
        x = fn(x, *args)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / n * 1e3


# ---------------------------------------------------------------------------
# render: cap-config sweep, round-robin interleaved
# ---------------------------------------------------------------------------

def cmd_render(args):
    from bench import build_problem
    from gsmpm_tpu.render.renderer import RasterConfig, render_with_aux
    from gsmpm_tpu.sim.coupling import grid2world

    cfg, scene, state, model, bcs, grid, camera, scaling, pos_center = (
        build_problem(args.particles, 50, args.res)
    )
    bg = jnp.zeros(3)
    opacity = scene.get_opacity().reshape(-1)
    features = scene.get_features()
    xyz_w, cov_w = grid2world(
        state.x, state.cov, scaling, pos_center, cfg.grid_extent
    )
    xyz_w = jax.block_until_ready(xyz_w)

    cands = []
    for spec in args.configs.split(";"):
        if not spec:
            continue
        kt, kc, kg = (int(v) for v in spec.split("/"))
        cands.append((f"{kt}/{kc}/{kg}",
                      dict(k_tile=kt, k_coarse=kc, k_global=kg)))
    if not cands:
        cands = [("default", {})]
    fns = {}
    for name, kw in cands:
        rcfg = RasterConfig(impl=args.impl, packed=not args.unpacked,
                            t_cap=args.t_cap, **kw)
        fns[name] = jax.jit(
            lambda x, c, _r=rcfg: render_with_aux(
                x, c, opacity, features, camera, bg, scene.sh_degree, _r
            )
        )
    for name, _ in cands:  # compile all before timing any
        jax.block_until_ready(fns[name](xyz_w, cov_w)[0])
    times = {name: [] for name, _ in cands}
    for _ in range(args.passes):
        for name, _ in cands:
            dt, _ = timeit(fns[name], xyz_w, cov_w, n=args.n)
            times[name].append(dt)
    mpix = camera.width * camera.height / 1e6
    for name, _ in cands:
        ts = np.array(times[name]) * 1e3
        best = ts.min()
        _, (_, dropped) = timeit(fns[name], xyz_w, cov_w, n=1)
        print(f"{name:20s} min {best:6.2f} ms ({mpix/best*1e3:5.1f} Mpix/s) "
              f"dropped={int(dropped)}  runs={np.round(ts, 2).tolist()}",
              flush=True)


# ---------------------------------------------------------------------------
# gather: selection windows() fusion pathology probes
# ---------------------------------------------------------------------------

def cmd_gather(args):
    _RANK_M = 1 << 19
    _SENT_RANK = jnp.int32(1 << 30)
    N = args.particles
    n4 = 4 * N
    NB, K = 169, args.k
    NTT = 186
    rng = np.random.default_rng(0)
    keys_raw = jnp.asarray(
        rng.integers(0, NTT, n4) * _RANK_M + rng.integers(0, N, n4), jnp.int32
    )
    t_f = jnp.asarray(np.arange(NB), jnp.int32)

    def windows(skeys, bounds, tile_ids, k):
        s = bounds[tile_ids]
        e = bounds[tile_ids + 1]
        w = s[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
        kk = skeys[jnp.minimum(w, n4 - 1)]
        return jnp.where(w < e[:, None], kk & (_RANK_M - 1), _SENT_RANK)

    def bounds_of(skeys, method=None):
        kw = {} if method is None else dict(method=method)
        return jnp.searchsorted(
            skeys, jnp.arange(NTT + 1, dtype=jnp.int32) * _RANK_M, **kw
        ).astype(jnp.int32)

    skeys0 = jnp.sort(keys_raw)
    bounds0 = bounds_of(skeys0)
    timeit(jax.jit(lambda s, b: windows(s, b, t_f, K)), skeys0, bounds0,
           label="windows(skeys,bounds as inputs)")
    timeit(jax.jit(lambda k: windows(jnp.sort(k), bounds_of(jnp.sort(k)),
                                     t_f, K)),
           keys_raw, label="sort+searchsorted+windows fused")

    def full_barrier(keys, method=None):
        skeys = jnp.sort(keys)
        bounds = bounds_of(skeys, method)
        skeys, bounds = jax.lax.optimization_barrier((skeys, bounds))
        return windows(skeys, bounds, t_f, K)

    timeit(jax.jit(full_barrier), keys_raw,
           label="... with optimization_barrier")
    timeit(jax.jit(lambda k: full_barrier(k, "sort")), keys_raw,
           label="searchsorted method='sort'")
    timeit(jax.jit(lambda k: full_barrier(k, "compare_all")), keys_raw,
           label="searchsorted method='compare_all'")
    timeit(jax.jit(lambda k: bounds_of(jnp.sort(k))), keys_raw,
           label="sort+searchsorted only")


# ---------------------------------------------------------------------------
# sg: scatter / gather / sort microbench
# ---------------------------------------------------------------------------

def cmd_sg(args):
    N, g = args.particles, 50
    gp = g + 4
    G = gp * gp * gp
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (N, 3), minval=0.25, maxval=0.75)
    cid3 = jnp.clip((pos * g).astype(jnp.int32), 0, g - 1)
    fid = ((cid3[:, 0] + 2) * gp + cid3[:, 1] + 2) * gp + cid3[:, 2] + 2
    vals_nc = jax.random.normal(key, (N, 108))
    vals_cn = jnp.asarray(vals_nc.T)
    grid_nc = jax.random.normal(key, (G, 81))
    grid_cn = jnp.asarray(grid_nc.T)

    cp = jax.jit(lambda v: v + 1.0)
    ms = timeit_chain(cp, vals_nc)
    print(f"copy (N,108) r+w {2*N*108*4/1e6:.0f}MB: {ms:7.3f} ms "
          f"-> {2*N*108*4/ms/1e6:.0f} GB/s")
    g1 = jax.jit(lambda x, gr: x + jnp.sum(gr[:, fid], axis=0)[:, None])
    print(f"gather col (81,G)[:,fid]: "
          f"{timeit_chain(g1, jnp.zeros((N, 1)), grid_cn):7.3f} ms")
    g2 = jax.jit(lambda x, gr: x + gr[fid, :])
    print(f"gather row (G,81)[fid,:]: "
          f"{timeit_chain(g2, jnp.zeros((N, 81)), grid_nc):7.3f} ms")
    s1 = jax.jit(lambda x, v: x.at[:, fid].add(v))
    print(f"scatter col (108,G): "
          f"{timeit_chain(s1, jnp.zeros((108, G)), vals_cn):7.3f} ms")
    s2 = jax.jit(lambda x, v: x.at[fid, :].add(v))
    print(f"scatter row (G,108): "
          f"{timeit_chain(s2, jnp.zeros((G, 108)), vals_nc):7.3f} ms")
    srt = jax.jit(lambda x, k: x + jnp.argsort(k + x[0]).astype(jnp.int32))
    print(f"argsort {N//1000}k: "
          f"{timeit_chain(srt, jnp.zeros((N,), jnp.int32), fid):7.3f} ms")

    # sorted-index and narrow-payload variants: is cost index- or byte-bound?
    fid_sorted = jnp.sort(fid)
    perm = jnp.argsort(fid)
    z = jnp.zeros((N, 81))
    zg = jnp.zeros((G, 108))
    g2i = jax.jit(lambda x, gr, i: x + gr[i, :])
    print(f"gather row random:  {timeit_chain(g2i, z, grid_nc, fid):7.3f} ms")
    print(f"gather row sorted:  "
          f"{timeit_chain(g2i, z, grid_nc, fid_sorted):7.3f} ms")
    s2i = jax.jit(lambda x, v, i: x.at[i, :].add(v))
    print(f"scatter row random: {timeit_chain(s2i, zg, vals_nc, fid):7.3f} ms")
    print(f"scatter row sorted: "
          f"{timeit_chain(s2i, zg, vals_nc, fid_sorted):7.3f} ms")
    pg = jax.jit(lambda x, v, p: x + v[p, :])
    print(f"perm gather (N,108): "
          f"{timeit_chain(pg, jnp.zeros((N, 108)), vals_nc, perm):7.3f} ms")
    for wcols in (3, 12, 48):
        gw = jax.jit(lambda x, gr, i: x + gr[i, :wcols])
        zw = jnp.zeros((N, wcols))
        print(f"gather row {wcols:3d}cols: "
              f"{timeit_chain(gw, zw, grid_nc, fid):7.3f} ms")
    ss = jax.jit(lambda x, v, i: x + jax.ops.segment_sum(v, i, num_segments=G))
    print(f"segment_sum sorted: "
          f"{timeit_chain(ss, zg, vals_nc, fid_sorted):7.3f} ms")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("render")
    r.add_argument("--particles", type=int, default=245760)
    r.add_argument("--res", type=int, default=800)
    r.add_argument("--impl", default="pallas")
    r.add_argument("--configs", default="512/128/128;640/128/128;768/256/128",
                   help='";"-separated k_tile/k_coarse/k_global triples')
    r.add_argument("--passes", type=int, default=3)
    r.add_argument("--unpacked", action="store_true",
                   help="use the padded (nblocks, K) blend layout")
    r.add_argument("--t_cap", type=int, default=65536)
    r.add_argument("--n", type=int, default=8)
    r.set_defaults(fn=cmd_render)
    gth = sub.add_parser("gather")
    gth.add_argument("--particles", type=int, default=245760)
    gth.add_argument("--k", type=int, default=768)
    gth.set_defaults(fn=cmd_gather)
    sg = sub.add_parser("sg")
    sg.add_argument("--particles", type=int, default=245760)
    sg.set_defaults(fn=cmd_sg)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
