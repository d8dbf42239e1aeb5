"""Stage-level timing of one MPM substep on the current backend.

Times stress / p2g / grid_update / g2p / full substep separately so kernel
work (Pallas) can target the real bottleneck. Not part of the test suite.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gsmpm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_problem
from gsmpm_tpu.ops.constitutive import compute_stress_soa
from gsmpm_tpu.sim.kernels import (
    g2p_soa,
    grid_update_soa,
    p2g_soa,
    soa_from_state,
    substep_soa,
)


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    n_particles, n_grid = 245760, 50
    (cfg, scene, state, model, bcs, grid, camera, scaling, pos_center) = (
        build_problem(n_particles, n_grid, 128)
    )
    soa = soa_from_state(state)
    dt = cfg.substep_dt

    stress_fn = jax.jit(
        lambda s: compute_stress_soa(
            s.F_trial, model.material, model.mu, model.lam, s.yield_stress,
            model.alpha, model.hardening, model.xi, model.plastic_viscosity,
            model.softening, dt, active_materials=model.active_materials,
        )
    )
    newF, stress, newy = stress_fn(soa)
    print(f"stress:      {timeit(stress_fn, soa):8.3f} ms")

    p2g_fn = jax.jit(lambda s, sig: p2g_soa(s, sig, grid, dt))
    gm, gmom = p2g_fn(soa, stress)
    print(f"p2g:         {timeit(p2g_fn, soa, stress):8.3f} ms")

    gu_fn = jax.jit(lambda m, mom: grid_update_soa(m, mom, model.gravity, dt))
    gv = gu_fn(gm, gmom)
    print(f"grid_update: {timeit(gu_fn, gm, gmom):8.3f} ms")

    g2p_fn = jax.jit(lambda s, v: g2p_soa(s, v, grid, dt))
    print(f"g2p:         {timeit(g2p_fn, soa, gv):8.3f} ms")

    sub_fn = jax.jit(
        lambda s, t: substep_soa(s, model, bcs, t, grid, dt)
    )
    print(f"substep:     {timeit(sub_fn, soa, jnp.float32(0.0)):8.3f} ms")


if __name__ == "__main__":
    main()
