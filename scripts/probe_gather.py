"""Microbench: candidate-gather and sort strategies on the real TPU.

Decides the round-2 rasterizer-selection redesign: where do the 7 ms
(planes gather) and ~10 ms (dup-sort selection) actually go, and which
layout/sort variant is fastest.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gsmpm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, label=""):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:44s} {dt*1e3:8.3f} ms")
    return out


def main():
    N = 245760
    NB, K = 169, 1088
    M = NB * K  # 183,872 gathered candidates
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, size=(M,)), jnp.int32)
    planes = jnp.asarray(rng.standard_normal((10, N + 1)), jnp.float32)
    planes16 = jnp.asarray(rng.standard_normal((16, N)), jnp.float32)
    rows16 = jnp.asarray(rng.standard_normal((N, 16)), jnp.float32)
    rows128 = jnp.asarray(rng.standard_normal((N, 128)), jnp.float32)

    timeit(jax.jit(lambda p, i: p[:, i]), planes, idx, label="gather (10,N+1)[:, idx] lanes")
    timeit(jax.jit(lambda p, i: p[:, i]), planes16, idx, label="gather (16,N)[:, idx] lanes")
    timeit(jax.jit(lambda p, i: p[i]), rows16, idx, label="gather (N,16)[idx] rows")
    timeit(jax.jit(lambda p, i: p[i]), rows128, idx, label="gather (N,128)[idx] rows")
    # gather with sorted indices (locality)
    sidx = jnp.sort(idx)
    timeit(jax.jit(lambda p, i: p[:, i]), planes16, sidx, label="gather (16,N)[:, sorted idx]")
    timeit(jax.jit(lambda p, i: p[i]), rows16, sidx, label="gather (N,16)[sorted idx] rows")

    # take_along_axis variant
    timeit(
        jax.jit(lambda p, i: jnp.take_along_axis(p, i[None, :], axis=1)),
        planes16, idx, label="take_along_axis (16,N) lanes",
    )

    # sorts
    keys = jnp.asarray(rng.integers(0, 2**31 - 1, size=(4 * N,)), jnp.int32)
    payload = jnp.asarray(rng.integers(0, N, size=(4 * N,)), jnp.int32)
    timeit(jax.jit(jnp.sort), keys, label="sort int32 4N")
    timeit(
        jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1)),
        keys, payload, label="sort int32 4N + payload",
    )
    keys64 = keys.astype(jnp.int64) if jax.config.jax_enable_x64 else None
    f32keys = jnp.asarray(rng.standard_normal((N,)), jnp.float32)
    timeit(jax.jit(jnp.argsort), f32keys, label="argsort f32 N")
    timeit(jax.jit(jnp.sort), f32keys, label="sort f32 N")
    rowsK = jnp.asarray(
        rng.integers(0, 2**30, size=(NB, K)), jnp.int32
    )
    timeit(jax.jit(lambda r: jnp.sort(r, axis=1)), rowsK, label="sort rows (169,1088) int32")

    # single coarse gather at 4N scale (sort-the-data strategy)
    idx4n = jnp.asarray(rng.integers(0, N, size=(4 * N,)), jnp.int32)
    timeit(jax.jit(lambda p, i: p[:, i]), planes16, idx4n, label="gather (16,N)[:, idx4N] lanes")

    # scatter-based alternative: one-hot matmul for a single block
    oneblk = idx[:K]
    timeit(
        jax.jit(lambda p, i: p[:, i]), planes16, oneblk,
        label="gather (16,N)[:, idx 1 block]",
    )


if __name__ == "__main__":
    main()
