"""Probe: Pallas viability + per-grid-step overhead + dynamic-start DMA on this TPU."""

import time
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit_chain(fn, x0, *args, n=20):
    x = fn(x0, *args)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    x = x0
    for _ in range(n):
        x = fn(x, *args)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    # 1. trivial kernel works?
    def k_double(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    x = jnp.ones((256, 256), jnp.float32)
    y = pl.pallas_call(
        k_double,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    assert np.allclose(np.asarray(y), 2.0), "basic pallas broken"
    print("pallas basic: OK")

    # 2. per-grid-step overhead: G steps, each tiny matmul on resident blocks
    def k_mm(a_ref, b_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)

    for G in (256, 1024, 4096):
        f = jax.jit(
            lambda a, b, G=G: pl.pallas_call(
                k_mm,
                out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
                grid=(G,),
                in_specs=[
                    pl.BlockSpec((256, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((256, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((256, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            )(a + b[0, 0], b)
        )
        a = jnp.ones((256, 256), jnp.float32)
        ms = timeit_chain(f, a, jnp.ones((256, 256), jnp.float32))
        # each step: 256x256x256 matmul = 33.5 MFLOP
        print(f"grid={G}: {ms:8.3f} ms -> {ms*1e3/G:7.3f} us/step, "
              f"{G*33.5e6/ms*1e3/1e12:6.1f} TF/s f32")

    # 3. dynamic-start DMA from HBM + scalar prefetch
    S = 256
    def k_dyn(starts_ref, hbm_ref, o_ref, scratch, sem):
        c = pl.program_id(0)
        st = starts_ref[c]
        dma = pltpu.make_async_copy(
            hbm_ref.at[pl.ds(st, S), :], scratch, sem
        )
        dma.start()
        dma.wait()
        o_ref[:] = scratch[:] + 1.0

    N = 245760
    data = jnp.arange(N * 32, dtype=jnp.float32).reshape(N, 32)
    nchunk = 960
    starts = jnp.asarray(np.random.randint(0, N - S, size=(nchunk,)), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, S, 32), lambda c, starts: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((S, 32), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    def k_dyn2(starts_ref, hbm_ref, o_ref, scratch, sem):
        c = pl.program_id(0)
        st = starts_ref[c]
        dma = pltpu.make_async_copy(hbm_ref.at[pl.ds(st, S), :], scratch, sem)
        dma.start()
        dma.wait()
        o_ref[0] = scratch[:] + 1.0

    f2 = jax.jit(
        lambda st, d: pl.pallas_call(
            k_dyn2,
            out_shape=jax.ShapeDtypeStruct((nchunk, S, 32), jnp.float32),
            grid_spec=grid_spec,
        )(st, d)
    )
    out = f2(starts, data)
    ok = np.allclose(np.asarray(out[3]), np.asarray(data[int(starts[3]):int(starts[3])+S]) + 1.0)
    print(f"dynamic-start DMA: {'OK' if ok else 'WRONG'}")
    ms = timeit_chain(lambda x, d: f2(starts, d + x[0, 0, 0]), out, data)
    print(f"dyn DMA {nchunk} chunks of (256,32): {ms:8.3f} ms -> {ms*1e3/nchunk:6.2f} us/chunk")


if __name__ == "__main__":
    main()
