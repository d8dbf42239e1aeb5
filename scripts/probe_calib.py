"""Calibrate microbench methodology against ops of known cost."""

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


def timeit(fn, *args, n=20, label=""):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:52s} {dt*1e3:8.3f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    # bf16 4096^3 matmul: 137 GFLOP -> ~0.7 ms at 197 TFLOPS
    a = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
    timeit(jax.jit(lambda x, y: x @ y), a, b, label="matmul bf16 4096^3 (~0.7ms ideal)")

    # elementwise on 256 MB: ~0.64 ms at 800 GB/s (read+write)
    big = jnp.asarray(rng.standard_normal((64, 1024, 1024)), jnp.float32)
    timeit(jax.jit(lambda x: x * 1.0001 + 1.0), big, label="elementwise 256MB (~0.6ms ideal)")

    for sz in (2**20, 2**22, 2**24):
        k = jnp.asarray(rng.integers(0, 2**31 - 1, sz), jnp.int32)
        timeit(jax.jit(jnp.sort), k, label=f"sort int32 {sz>>20}M")

    # the dup-sort again, forced non-DCE by returning a scalar reduction
    k = jnp.asarray(rng.integers(0, 2**31 - 1, 2**20), jnp.int32)
    timeit(jax.jit(lambda x: jnp.sort(x)[::65536].sum()), k,
           label="sort 1M int32 -> reduce (anti-DCE)")


if __name__ == "__main__":
    main()
