"""Reconcile probe_gather vs profile_render timings: same ops, real-shaped data."""

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

from gsmpm_tpu.render.renderer import (
    Preprocessed, RasterConfig, _raw_planes, _select_candidates,
    _select_candidates_dupsort,
)
from gsmpm_tpu.render.camera import make_camera


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
    rng = np.random.default_rng(0)
    # screen-space gaussians roughly covering an 800x800 image
    pre = Preprocessed(
        pix_x=jnp.asarray(rng.uniform(-50, 850, N), jnp.float32),
        pix_y=jnp.asarray(rng.uniform(-50, 850, N), jnp.float32),
        conic_a=jnp.asarray(rng.uniform(0.01, 1, N), jnp.float32),
        conic_b=jnp.asarray(rng.uniform(-0.1, 0.1, N), jnp.float32),
        conic_c=jnp.asarray(rng.uniform(0.01, 1, N), jnp.float32),
        depth=jnp.asarray(rng.uniform(0.5, 10, N), jnp.float32),
        radius=jnp.asarray(rng.uniform(1, 30, N), jnp.float32),
        color_r=jnp.asarray(rng.uniform(0, 1, N), jnp.float32),
        color_g=jnp.asarray(rng.uniform(0, 1, N), jnp.float32),
        color_b=jnp.asarray(rng.uniform(0, 1, N), jnp.float32),
        opacity=jnp.asarray(rng.uniform(0, 1, N), jnp.float32),
        valid=jnp.asarray(rng.uniform(0, 1, N) > 0.05),
    )
    camera = make_camera(800, 800, 0.7, 0.7, np.eye(3), np.zeros(3))
    rcfg = RasterConfig()

    sort_fn = jax.jit(lambda p: jnp.argsort(jnp.where(p.valid, p.depth, jnp.inf)))
    order = timeit(sort_fn, pre, label="argsort where(valid, depth, inf)")

    sort2 = jax.jit(lambda d: jnp.argsort(d))
    timeit(sort2, pre.depth, label="argsort depth plain")

    sel_dup = jax.jit(lambda p, o: _select_candidates_dupsort(p, o, camera, rcfg))
    gidx, counts, origins = timeit(sel_dup, pre, order, label="_select_candidates_dupsort")
    print(f"  dup counts: max={int(jnp.max(counts))} mean={float(jnp.mean(counts)):.0f}")

    raw_fn = jax.jit(_raw_planes)
    planes = timeit(raw_fn, pre, label="_raw_planes alone")

    gather_fn = jax.jit(
        lambda p, gi: _raw_planes(p)[:, gi.reshape(-1)].reshape(10, *gi.shape)
    )
    timeit(gather_fn, pre, gidx, label="raw_planes + gather (fused)")

    gather_only = jax.jit(lambda pl_, gi: pl_[:, gi.reshape(-1)].reshape(10, *gi.shape))
    timeit(gather_only, planes, gidx, label="gather only (10,N+1)[:, gidx]")


if __name__ == "__main__":
    main()
