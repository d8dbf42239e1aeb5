"""Compile + validate + benchmark the Pallas tiled transfer on real TPU."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_problem
from gsmpm_tpu.sim.kernels import soa_from_state, state_from_soa
from gsmpm_tpu.sim.tiles import default_tile_config, run_substeps_tiled
from gsmpm_tpu.sim.solver import run_substeps


def main():
    n_particles, n_grid = 245760, 50
    (cfg, scene, state, model, bcs, grid, camera, scaling, pos_center) = (
        build_problem(n_particles, n_grid, 128)
    )
    soa = soa_from_state(state)
    dt = cfg.substep_dt
    n_sub = 100

    # correctness: 10 substeps pallas vs existing XLA path
    f_ref = jax.jit(
        lambda s, t: run_substeps(s, model, bcs, t, 10, grid, dt,
                                  checkpoint_policy=None)
    )
    sref, _ = f_ref(state, jnp.float32(0.0))
    f_pal = jax.jit(
        lambda s, t: run_substeps_tiled(s, model, bcs, t, 10, grid, dt,
                                        impl="pallas")
    )
    spal, _, ok = f_pal(soa, jnp.float32(0.0))
    spal = state_from_soa(spal)
    assert bool(ok), "tiled layout overflow"
    for name, a, b, tol in [
        ("x", sref.x, spal.x, 1e-5),
        ("v", sref.v, spal.v, 2e-3),
        ("F_trial", sref.F_trial, spal.F_trial, 1e-3),
    ]:
        a, b = np.asarray(a), np.asarray(b)
        err = np.max(np.abs(a - b) / (np.abs(a) + 1e-3))
        print(f"{name}: max rel err {err:.2e}")
        assert err < tol, f"{name} mismatch {err}"
    print("correctness OK")

    # benchmark: n_sub substeps per call
    for impl, fn in [
        ("pallas", jax.jit(lambda s, t: run_substeps_tiled(
            s, model, bcs, t, n_sub, grid, dt, impl="pallas"))),
        ("ref   ", jax.jit(lambda s, t: run_substeps_tiled(
            s, model, bcs, t, n_sub, grid, dt, impl="ref"))),
    ]:
        out, t, ok = fn(soa, jnp.float32(0.0))
        _ = np.asarray(out.x[0][:1])
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out, t, ok = fn(soa, jnp.float32(0.0))
        _ = np.asarray(out.x[0][:1])
        dt_wall = (time.perf_counter() - t0) / reps
        print(f"tiled[{impl}]: {n_sub / dt_wall:8.1f} substeps/s "
              f"({dt_wall / n_sub * 1e3:6.2f} ms/substep)")


if __name__ == "__main__":
    main()
