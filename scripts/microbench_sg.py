"""Microbench: scatter/gather layout variants for P2G/G2P on TPU."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    N, g = 245760, 50
    gp = g + 4
    G = gp * gp * gp
    key = jax.random.PRNGKey(0)
    # clustered cell ids, like a real scene (box occupying ~1/8 of cells)
    pos = jax.random.uniform(key, (N, 3), minval=0.25, maxval=0.75)
    cid3 = jnp.clip((pos * g).astype(jnp.int32), 0, g - 1)
    fid = ((cid3[:, 0] + 2) * gp + cid3[:, 1] + 2) * gp + cid3[:, 2] + 2
    vals_cn = jax.random.normal(key, (108, N))
    vals_nc = jnp.asarray(vals_cn.T)
    grid_cn = jax.random.normal(key, (81, G))
    grid_nc = jnp.asarray(grid_cn.T)

    print(f"argsort:        {timeit(jax.jit(jnp.argsort), fid):7.3f} ms")
    order = jnp.argsort(fid)
    fid_sorted = fid[order]

    g1 = jax.jit(lambda gr, i: gr[:, i])
    print(f"gather (81,G)[:,fid]:  {timeit(g1, grid_cn, fid):7.3f} ms")
    g2 = jax.jit(lambda gr, i: gr[i, :])
    print(f"gather (G,81)[fid,:]:  {timeit(g2, grid_nc, fid):7.3f} ms")
    print(f"gather (G,81)[sorted]: {timeit(g2, grid_nc, fid_sorted):7.3f} ms")

    s1 = jax.jit(lambda v, i: jnp.zeros((108, G), v.dtype).at[:, i].add(v))
    print(f"scatter (108,G)[:,fid]: {timeit(s1, vals_cn, fid):7.3f} ms")
    s2 = jax.jit(lambda v, i: jnp.zeros((G, 108), v.dtype).at[i, :].add(v))
    print(f"scatter (G,108)[fid,:]: {timeit(s2, vals_nc, fid):7.3f} ms")
    print(f"scatter (G,108)[sorted]:{timeit(s2, vals_nc, fid_sorted):7.3f} ms")

    # one-hot matmul segment-sum over sorted chunks (window 2048)
    S, W = 512, 2048
    nchunk = N // S

    def onehot_scatter(v_nc, fid_s):
        cmin = jnp.min(fid_s.reshape(nchunk, S), axis=1)
        local = fid_s.reshape(nchunk, S) - cmin[:, None]  # (nchunk,S)
        oh = (
            local[:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
        ).astype(v_nc.dtype)
        part = jnp.einsum(
            "csw,csv->cwv", oh, v_nc.reshape(nchunk, S, 108),
            preferred_element_type=jnp.float32,
        )  # (nchunk, W, 108)
        out = jnp.zeros((G, 108), v_nc.dtype)
        idx = cmin[:, None] + jnp.arange(W)[None, :]
        return out.at[idx.reshape(-1), :].add(part.reshape(-1, 108))

    vs = vals_nc[order]
    print(f"onehot-matmul scatter:  {timeit(jax.jit(onehot_scatter), vs, fid_sorted):7.3f} ms")
    spans = np.asarray(
        jnp.max(fid_sorted.reshape(nchunk, S), axis=1)
        - jnp.min(fid_sorted.reshape(nchunk, S), axis=1)
    )
    print(f"chunk span max={spans.max()} p99={np.percentile(spans,99):.0f}")


if __name__ == "__main__":
    main()
