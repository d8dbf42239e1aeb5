"""MPM kernel lever: chunk size S sweep (VERDICT r4 weak #5).

The per-substep budget at 245k/50^3 (3.54 ms) is ~40% grid-step overhead
(~1300 chunks x ~1 us); bigger chunks amortize it and widen the matmuls.
Times frame_tiled at S in {128, 256, 512} on the bench shape.
"""
import sys, time
sys.path.insert(0, ".")
import dataclasses
import numpy as np

import jax, jax.numpy as jnp
from bench import build_problem
from gsmpm_tpu.sim.kernels import soa_from_state, state_from_soa
from gsmpm_tpu.sim.solver import postprocess
from gsmpm_tpu.sim.tiles import TileConfig, bootstrap, frame_tiled
from gsmpm_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

n_grid = int(sys.argv[1]) if len(sys.argv) > 1 else 50
(cfg, scene, state, model, bcs, grid, camera, scaling, pos_center) = (
    build_problem(245760, n_grid, 800)
)
n = int(state.mass.shape[0])
substeps = 100

for S in (128, 256, 512):
    nt = -(-n_grid // 8)
    cap = min(nt ** 3, max(512, 4 * max(1, n // 256)))
    tc = TileConfig(n_grid, n, S=S, n_occ_cap=cap)
    soa_tpl = soa_from_state(state)

    @jax.jit
    def frame(ts, t, tc=tc):
        ts, soa, t = frame_tiled(
            ts, soa_tpl, model, bcs, t, substeps, grid, tc,
            cfg.substep_dt, impl="pallas",
        )
        st = state_from_soa(soa)
        cov6, _ = postprocess(st)
        return ts, dataclasses.replace(st, cov=cov6), t

    try:
        ts = jax.jit(
            lambda s, tc=tc: bootstrap(soa_from_state(s), model, grid, tc)
        )(state)
        assert bool(ts.ok)
        t_sim = jnp.float32(0.0)
        ts, st, t_sim = frame(ts, t_sim)
        jax.block_until_ready(st.x)
    except Exception as e:
        print(f"S={S}: FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)
        continue
    best = 0.0
    for g in range(2):
        t0 = time.perf_counter()
        for _ in range(3):
            ts, st, t_sim = frame(ts, t_sim)
        np.asarray(st.x.ravel()[0])
        best = max(best, substeps * 3 / (time.perf_counter() - t0))
    nchunk = int(ts.chunk_tile.shape[0])
    print(f"S={S}: {best:7.2f} substeps/s   nchunk={nchunk}   ok={bool(ts.ok)}",
          flush=True)
