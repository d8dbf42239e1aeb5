"""Find the fast lowering for the window gathers + layout-aligned reshapes."""

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
    print(f"{label:52s} {dt*1e3:8.3f} ms")
    return out


def main():
    N = 245760
    n4 = 4 * N
    NB, K = 169, 768
    rng = np.random.default_rng(0)
    skeys = jnp.asarray(np.sort(rng.integers(0, 2**31 - 1, n4)), jnp.int32)
    starts = jnp.asarray(rng.integers(0, n4 - K, NB), jnp.int32)
    w = starts[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]  # (NB, K)

    timeit(jax.jit(lambda s, w: s[w]), skeys, w, label="(a) skeys[w] 2D idx")
    timeit(
        jax.jit(lambda s, w: s[w.reshape(-1)].reshape(w.shape)),
        skeys, w, label="(b) flat idx + reshape",
    )
    timeit(
        jax.jit(lambda s, w: s[None, :][:, w.reshape(-1)].reshape(w.shape)),
        skeys, w, label="(c) 2D source, 1D idx, reshape",
    )
    timeit(
        jax.jit(lambda s, st: jax.vmap(
            lambda s0: jax.lax.dynamic_slice_in_dim(s, s0, K))(st)),
        skeys, starts, label="(d) vmap dynamic_slice windows",
    )

    # the planes gather + reshape to (10, NB, K) at aligned vs unaligned K
    planes = jnp.asarray(rng.standard_normal((10, N)), jnp.float32)
    for k in (1088, 1152, 1024):
        gidx = jnp.asarray(rng.integers(0, N, (NB, k)), jnp.int32)
        timeit(
            jax.jit(lambda p, g: p[:, g.reshape(-1)].reshape(10, NB, k)),
            planes, gidx, label=f"planes gather -> (10,{NB},{k})",
        )
        timeit(
            jax.jit(lambda p, g: p[:, g]),
            planes, gidx, label=f"planes gather 2D idx -> (10,{NB},{k})",
        )

    # raw planes build variants
    rows = [jnp.asarray(rng.standard_normal(N), jnp.float32) for _ in range(10)]

    def build_concat(*rs):
        planes = jnp.stack(rs, axis=0)
        sentinel = jnp.zeros((10, 1), planes.dtype).at[5, 0].set(-1e30)
        return jnp.concatenate([planes, sentinel], axis=1)

    def build_stack(*rs):
        return jnp.stack(rs, axis=0)

    timeit(jax.jit(build_concat), *rows, label="raw planes stack+concat (N+1)")
    timeit(jax.jit(build_stack), *rows, label="raw planes stack only (N)")


if __name__ == "__main__":
    main()
