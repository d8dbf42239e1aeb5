"""Stage-level timing of the tiled Pallas MPM substep on the real TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gsmpm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import dataclasses
import jax, jax.numpy as jnp, numpy as np

from bench import build_problem
from gsmpm_tpu.ops.constitutive import compute_stress_soa
from gsmpm_tpu.sim.kernels import soa_from_state, grid_update_soa
from gsmpm_tpu.sim import tiles as TI
from gsmpm_tpu.sim.tiles import (
    TiledState, bootstrap, default_tile_config, extract_windows,
    fold_windows, substep_tiled, rebucket,
    RX, RV, RF, RFT, RYIELD, RMASS, RDRIFT, AMU, ALAM, T_TILE, PAD_LO,
)
from gsmpm_tpu.sim.pallas_mpm import g2p_tiled_pallas, p2g_tiled_pallas


from tpu_timing import timeit as _timeit


def timeit(fn, *args, n=16, label=""):
    # dedup-proof (axon caches identical dispatches — scripts/tpu_timing.py)
    dt, out = _timeit(fn, *args, n=n, label=label)
    return out


def main():
    n_particles, n_grid = 245760, 50
    cfg, scene, state, model, bcs, grid, camera, scaling, pos_center = (
        build_problem(n_particles, n_grid, 128)
    )
    dt = cfg.substep_dt
    tc = default_tile_config(n_grid, n_particles)
    soa = soa_from_state(state)
    ts = jax.jit(lambda s: bootstrap(s, model, grid, tc))(soa)
    ts = jax.block_until_ready(ts)
    print(f"NP rows={tc.np_rows} nchunk={tc.nchunk} ntiles={tc.ntiles}")

    q = ts.q
    def stress_fn(q, ts):
        F_trial = tuple(q[RFT + i] for i in range(9))
        return compute_stress_soa(
            F_trial, ts.material, ts.aux[AMU], ts.aux[ALAM], q[RYIELD],
            model.alpha, model.hardening, model.xi, model.plastic_viscosity,
            model.softening, dt, active_materials=model.active_materials,
        )
    new_F, stress, new_yield = timeit(jax.jit(stress_fn), q, ts, label="stress (XLA elementwise)")
    sig = jnp.concatenate([
        jnp.stack(stress), jnp.zeros((16 - 9, q.shape[1]), q.dtype)
    ])
    sig = jax.block_until_ready(sig)

    p2g_fn = jax.jit(lambda ts, sig: p2g_tiled_pallas(ts, sig, grid, tc, dt))
    windows = timeit(p2g_fn, ts, sig, label="p2g pallas")

    fold_fn = jax.jit(lambda w: fold_windows(w, tc))
    acc = timeit(fold_fn, windows, label="fold_windows")

    gu_fn = jax.jit(lambda acc: grid_update_soa(
        acc[:, :, :, 0:T_TILE],
        (acc[:, :, :, T_TILE:2*T_TILE],
         acc[:, :, :, 2*T_TILE:3*T_TILE],
         acc[:, :, :, 3*T_TILE:4*T_TILE]),
        model.gravity, dt))
    grid_v = timeit(gu_fn, acc, label="grid_update")

    def bc_fn(grid_v):
        T = tc.nt + 1
        sh = (T, T, T, T_TILE, T_TILE * T_TILE)
        lane = jax.lax.broadcasted_iota(jnp.int32, sh, 4)
        li = [jax.lax.broadcasted_iota(jnp.int32, sh, 3), lane // T_TILE, lane % T_TILE]
        coords = jnp.stack([
            (jax.lax.broadcasted_iota(jnp.int32, sh, d) * T_TILE + li[d] - PAD_LO).astype(jnp.float32)
            for d in range(3)], axis=-1).reshape(-1, 3)
        gv_aos = jnp.stack(grid_v, axis=-1).reshape(-1, 3)
        for op in bcs.grid_ops:
            gv_aos = op.apply_grid(gv_aos, coords, 0.0, dt, grid.dx)
        return tuple(gv_aos[:, r].reshape(sh) for r in range(3))
    grid_v = timeit(jax.jit(bc_fn), grid_v, label="grid BCs (collider)")

    ext_fn = jax.jit(lambda gv: extract_windows(jnp.concatenate(gv, axis=3), tc))
    win_in = timeit(ext_fn, grid_v, label="extract_windows")

    g2p_fn = jax.jit(lambda ts, w: g2p_tiled_pallas(ts, w, grid, tc, dt))
    new_q = timeit(g2p_fn, ts, win_in, label="g2p pallas")

    full = jax.jit(lambda ts: substep_tiled(ts, model, bcs, 0.0, grid, tc, dt, impl="pallas"))
    timeit(full, ts, label="full substep_tiled (pallas)")

    reb = jax.jit(lambda ts: rebucket(ts, grid, tc))
    timeit(reb, ts, n=10, label="rebucket (when it fires)")


if __name__ == "__main__":
    main()
