"""Pin the fusion pathology: windows() cost with/without upstream fusion."""

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

_RANK_M = 1 << 19
_SENT_RANK = jnp.int32(1 << 30)


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

    def from_inputs(skeys, bounds):
        return windows(skeys, bounds, t_f, K)

    def full(keys):
        skeys = jnp.sort(keys)
        bounds = jnp.searchsorted(
            skeys, jnp.arange(NTT + 1, dtype=jnp.int32) * _RANK_M
        ).astype(jnp.int32)
        return windows(skeys, bounds, t_f, K)

    def full_barrier(keys):
        skeys = jnp.sort(keys)
        bounds = jnp.searchsorted(
            skeys, jnp.arange(NTT + 1, dtype=jnp.int32) * _RANK_M
        ).astype(jnp.int32)
        skeys, bounds = jax.lax.optimization_barrier((skeys, bounds))
        return windows(skeys, bounds, t_f, K)

    skeys0 = jnp.sort(keys_raw)
    bounds0 = jnp.searchsorted(
        skeys0, jnp.arange(NTT + 1, dtype=jnp.int32) * _RANK_M
    ).astype(jnp.int32)
    timeit(jax.jit(from_inputs), skeys0, bounds0, label="windows(skeys,bounds as inputs)")
    timeit(jax.jit(full), keys_raw, label="sort+searchsorted+windows fused")
    timeit(jax.jit(full_barrier), keys_raw, label="... with optimization_barrier")

    # searchsorted method variants
    def full_sortmethod(keys):
        skeys = jnp.sort(keys)
        bounds = jnp.searchsorted(
            skeys, jnp.arange(NTT + 1, dtype=jnp.int32) * _RANK_M,
            method="sort",
        ).astype(jnp.int32)
        skeys, bounds = jax.lax.optimization_barrier((skeys, bounds))
        return windows(skeys, bounds, t_f, K)

    def full_comparemethod(keys):
        skeys = jnp.sort(keys)
        bounds = jnp.searchsorted(
            skeys, jnp.arange(NTT + 1, dtype=jnp.int32) * _RANK_M,
            method="compare_all",
        ).astype(jnp.int32)
        skeys, bounds = jax.lax.optimization_barrier((skeys, bounds))
        return windows(skeys, bounds, t_f, K)

    timeit(jax.jit(full_sortmethod), keys_raw, label="searchsorted method='sort'")
    timeit(jax.jit(full_comparemethod), keys_raw, label="searchsorted method='compare_all'")

    def just_searchsorted(keys):
        skeys = jnp.sort(keys)
        return jnp.searchsorted(
            skeys, jnp.arange(NTT + 1, dtype=jnp.int32) * _RANK_M
        ).astype(jnp.int32)

    timeit(jax.jit(just_searchsorted), keys_raw, label="sort+searchsorted only")


if __name__ == "__main__":
    main()
