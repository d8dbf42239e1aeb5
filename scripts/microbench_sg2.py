"""Microbench v2: chained iterations to defeat async-dispatch artifacts."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit_chain(fn, x0, *args, n=20):
    """fn(x, *args) -> x-like; chains x through n calls."""
    x = fn(x0, *args)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    x = x0
    for _ in range(n):
        x = fn(x, *args)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    N, g = 245760, 50
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

    # copy baseline: pure HBM bandwidth reference
    cp = jax.jit(lambda v: v + 1.0)
    ms = timeit_chain(cp, vals_nc)
    print(f"copy (N,108) r+w {2*N*108*4/1e6:.0f}MB: {ms:7.3f} ms "
          f"-> {2*N*108*4/ms/1e6:.0f} GB/s")

    g1 = jax.jit(lambda x, gr: x + jnp.sum(gr[:, fid], axis=0)[:, None])
    print(f"gather col (81,G)[:,fid]: {timeit_chain(g1, jnp.zeros((N,1)), grid_cn):7.3f} ms")
    g2 = jax.jit(lambda x, gr: x + gr[fid, :])
    print(f"gather row (G,81)[fid,:]: {timeit_chain(g2, jnp.zeros((N,81)), grid_nc):7.3f} ms")

    s1 = jax.jit(lambda x, v: x.at[:, fid].add(v))
    print(f"scatter col (108,G): {timeit_chain(s1, jnp.zeros((108,G)), vals_cn):7.3f} ms")
    s2 = jax.jit(lambda x, v: x.at[fid, :].add(v))
    print(f"scatter row (G,108): {timeit_chain(s2, jnp.zeros((G,108)), vals_nc):7.3f} ms")

    srt = jax.jit(lambda x, k: x + jnp.argsort(k + x[0]).astype(jnp.int32))
    print(f"argsort 245k: {timeit_chain(srt, jnp.zeros((N,), jnp.int32), fid):7.3f} ms")


if __name__ == "__main__":
    main()


def sorted_variants():
    N, g = 245760, 50
    gp = g + 4
    G = gp * gp * gp
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (N, 3), minval=0.25, maxval=0.75)
    cid3 = jnp.clip((pos * g).astype(jnp.int32), 0, g - 1)
    fid = ((cid3[:, 0] + 2) * gp + cid3[:, 1] + 2) * gp + cid3[:, 2] + 2
    fid_sorted = jnp.sort(fid)
    perm = jnp.argsort(fid)
    vals_nc = jax.random.normal(key, (N, 108))
    grid_nc = jax.random.normal(key, (G, 81))

    g2 = jax.jit(lambda x, gr, i: x + gr[i, :])
    z = jnp.zeros((N, 81))
    print(f"gather row random:  {timeit_chain(g2, z, grid_nc, fid):7.3f} ms")
    print(f"gather row sorted:  {timeit_chain(g2, z, grid_nc, fid_sorted):7.3f} ms")
    s2 = jax.jit(lambda x, v, i: x.at[i, :].add(v))
    zg = jnp.zeros((G, 108))
    print(f"scatter row random: {timeit_chain(s2, zg, vals_nc, fid):7.3f} ms")
    print(f"scatter row sorted: {timeit_chain(s2, zg, vals_nc, fid_sorted):7.3f} ms")
    # permutation gather (sorting all particle planes each substep)
    pg = jax.jit(lambda x, v, p: x + v[p, :])
    zn = jnp.zeros((N, 108))
    print(f"perm gather (N,108): {timeit_chain(pg, zn, vals_nc, perm):7.3f} ms")
    # narrow-payload gathers: is cost index-bound or byte-bound?
    for wcols in (3, 12, 48):
        gw = jax.jit(lambda x, gr, i: x + gr[i, :wcols])
        zw = jnp.zeros((N, wcols))
        print(f"gather row {wcols:3d}cols: {timeit_chain(gw, zw, grid_nc, fid):7.3f} ms")
    # segment_sum on sorted ids (XLA's segment path)
    ss = jax.jit(lambda x, v, i: x + jax.ops.segment_sum(v, i, num_segments=G))
    print(f"segment_sum sorted: {timeit_chain(ss, zg, vals_nc, fid_sorted):7.3f} ms")


sorted_variants()
