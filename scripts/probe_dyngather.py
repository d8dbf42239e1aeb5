"""Probe: Pallas tpu.dynamic_gather (take_along_axis in-kernel) vs XLA gather.

If dynamic_gather runs at VPU-ish rate, every big gather in the rasterizer
selection pipeline (planes reorder, window reads, candidate materialization)
moves into kernels and the ~13 ns/index XLA gather tax disappears.
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gsmpm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_timing import timeit


def gather_cols_kernel(x_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)


def pallas_gather_cols(x, idx, rows_per_step=2):
    """out[r, j] = x[r, idx[j]] for 2D x, 1D idx broadcast to all rows."""
    R, N = x.shape
    idx2 = jnp.broadcast_to(idx[None, :], (R, N)).astype(jnp.int32)
    return pl.pallas_call(
        gather_cols_kernel,
        out_shape=jax.ShapeDtypeStruct((R, N), x.dtype),
        grid=(R // rows_per_step,),
        in_specs=[
            pl.BlockSpec((rows_per_step, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_step, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_per_step, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x, idx2)


def main():
    N = 245760  # 1920 * 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((10, N)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, N), jnp.int32)

    # correctness first (tiny)
    xs = jnp.asarray(rng.standard_normal((2, 256)), jnp.float32)
    ixs = jnp.asarray(rng.integers(0, 256, 256), jnp.int32)
    try:
        got = jax.jit(functools.partial(pallas_gather_cols, rows_per_step=2))(xs, ixs)
        want = xs[:, ixs]
        err = float(jnp.abs(got - want).max())
        print(f"correctness (2,256): max err {err}")
    except Exception as e:
        print(f"dynamic_gather FAILED: {type(e).__name__}: {e}")
        return

    fn = jax.jit(functools.partial(pallas_gather_cols, rows_per_step=2))
    timeit(fn, x, idx, n=16, label="pallas dynamic_gather (10,245760) cols")

    xla_fn = jax.jit(lambda x, i: x[:, i])
    timeit(xla_fn, x, idx, n=16, label="XLA gather (10,245760) cols")

    # 1-row giant gather (the skeys window read case)
    n4 = 4 * N
    sk = jnp.asarray(rng.standard_normal((1, n4)), jnp.float32)
    idx4 = jnp.asarray(rng.integers(0, n4, n4), jnp.int32)
    fn1 = jax.jit(functools.partial(pallas_gather_cols, rows_per_step=1))
    timeit(fn1, sk, idx4, n=16, label="pallas dynamic_gather (1,983040)")

    # int32 payload gather
    ski = jnp.asarray(rng.integers(0, 2**30, (1, n4)), jnp.int32)
    timeit(fn1, ski, idx4, n=16, label="pallas dynamic_gather (1,983040) i32")


if __name__ == "__main__":
    main()
