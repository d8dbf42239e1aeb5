"""Measure per-substep collective traffic of every parallel engine from the
COMPILED HLO, cross-check against the analytic numbers documented in
parallel/halo.py / halo_tiled.py / tiled_sharded.py, and project 1->N-chip
scaling efficiency (VERDICT r3 item 6; BASELINE north star >= 70%).

Method: build each engine's frame step on the 8-virtual-device CPU mesh,
lower + compile, and parse the collective ops (all-reduce / all-gather /
collective-permute / reduce-scatter) with their shapes out of the HLO text.
Per-op wire cost model on a bidirectional ring (ICI):
    all-reduce:          2 (N-1)/N * bytes
    reduce-scatter:        (N-1)/N * bytes
    all-gather:            (N-1)/N * bytes(out)
    collective-permute:              bytes        (point-to-point)
Efficiency projection combines the measured single-chip compute time per
substep (BENCH r3/r4: 3.57 ms at 50^3/245k, 10.1 ms at 100^3) with the
audited comm bytes over an assumed effective per-chip ICI bandwidth
(v5e: 3 links x 400 Gbps/2 dir ~ 75 GB/s effective per direction is the
public order of magnitude; the table reports efficiency at 45 and 90 GB/s
so the conclusion does not hinge on the constant):
    eff = t_comp_per_chip / (t_comp_per_chip + t_comm)    (t_comm
    overlappable traffic treated as fully exposed — a conservative bound).

Run:  python scripts/comm_audit.py            (CPU, 8 virtual devices)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from gsmpm_tpu.config import MPMConfig
from gsmpm_tpu.sim.boundary import BCSet, make_surface_collider
from gsmpm_tpu.sim.state import GridConfig, init_model, init_state
from gsmpm_tpu.sim.volume import particle_volume

_DTYPE_BYTES = {"f32": 4, "f16": 2, "bf16": 2, "s32": 4, "u32": 4,
                "pred": 1, "s8": 1, "u8": 1, "f64": 8, "s64": 8}

_SHAPE_RE = re.compile(r"(f32|bf16|f16|s32|u32|s64|f64|u8|s8|pred)\[([0-9,]*)\]")


def _shape_bytes(sig: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(sig):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_bytes(hlo: str, ndev: int):
    """Sum ring-model wire bytes of every collective in an HLO dump."""
    out = {"all-reduce": 0, "all-gather": 0, "reduce-scatter": 0,
           "collective-permute": 0}
    counts = dict.fromkeys(out, 0)
    for line in hlo.splitlines():
        line = line.strip()
        m = re.match(r".*= (.*?) (all-reduce|all-gather|reduce-scatter|"
                     r"collective-permute)(?:-start)?\(", line)
        if not m:
            continue
        sig, op = m.group(1), m.group(2)
        b = _shape_bytes(sig)
        if op == "all-reduce":
            w = 2.0 * (ndev - 1) / ndev * b
        elif op in ("all-gather", "reduce-scatter"):
            w = (ndev - 1) / ndev * b
        else:
            w = float(b)
        out[op] += int(w)
        counts[op] += 1
    return out, counts


def _problem(n, n_grid):
    rng = np.random.default_rng(0)
    cfg = MPMConfig(
        E=2e4, nu=0.3, material="jelly", n_grid=n_grid, grid_extent=2.0,
        substep_dt=2e-4, density=300.0, gravity=[0.0, 0.0, -9.8],
    )
    ext = cfg.grid_extent
    x = np.stack([
        rng.uniform(0.05 * ext, 0.95 * ext, n),
        rng.uniform(0.40 * ext, 0.60 * ext, n),
        rng.uniform(0.45 * ext, 0.70 * ext, n),
    ], axis=1).astype(np.float32)
    cov = np.tile(np.array([1e-4, 0, 0, 1e-4, 0, 1e-4], np.float32), (n, 1))
    vol = particle_volume(jnp.asarray(x), n_grid, ext)
    state = init_state(jnp.asarray(x), jnp.asarray(cov), vol, cfg)
    model = init_model(cfg, n)
    grid = GridConfig(n_grid, ext)
    bcs = BCSet(grid_ops=(make_surface_collider((0, 0, 0.3), (0, 0, 1)),))
    return cfg, state, model, grid, bcs


def audit_engine(name, n, n_grid, substeps=1):
    """Lower ONE-substep frames: a lax.scan body appears once in HLO text
    regardless of trip count, so per-module counts at n_substeps=1 ARE the
    per-substep counts (plus one migration + the frame-end replicated view
    for the halo engines, and both branches of the migration lax.cond —
    the gathered-fallback all-gathers are counted though the steady-state
    path never runs them; the table therefore splits permute/all-reduce
    traffic, which IS steady-state, from all-gather, which is
    bootstrap/fallback/frame-view only)."""
    cfg, state, model, grid, bcs = _problem(n, n_grid)
    devs = jax.devices()
    nd = len(devs)
    mesh = Mesh(np.array(devs), ("x",))

    if name == "psum":
        from gsmpm_tpu.parallel.mesh import pad_particles
        from gsmpm_tpu.parallel.sharded import make_sharded_frame_fn

        st, md, _, _ = pad_particles(state, model, nd)
        fn = make_sharded_frame_fn(
            mesh, st, md, bcs, grid, cfg.substep_dt, substeps, data_axis="x"
        )
        lowered = fn.lower(st, md, jnp.float32(0.0))
    elif name == "tiled":
        from gsmpm_tpu.parallel.mesh import pad_particles
        from gsmpm_tpu.parallel.tiled_sharded import (
            make_sharded_frame_tiled, sharded_tile_config,
        )
        from gsmpm_tpu.sim.kernels import soa_from_state
        from gsmpm_tpu.sim.tiles import bootstrap

        st, md, _, _ = pad_particles(state, model, nd)
        tc = sharded_tile_config(n_grid, int(st.mass.shape[0]), nd)
        fn = make_sharded_frame_tiled(
            mesh, "x", md, bcs, grid, tc, cfg.substep_dt, substeps,
            impl="ref", rebucket_every=min(10, substeps),
        )
        soa = soa_from_state(st)
        with mesh:
            ts = jax.jit(lambda s: bootstrap(s, md, grid, tc))(soa)
        lowered = jax.jit(fn).lower(ts, soa, jnp.float32(0.0))
    elif name == "halo":
        from gsmpm_tpu.parallel.halo import (
            bootstrap_slots, make_halo_frame, quantile_slab_starts,
        )

        res = quantile_slab_starts(
            np.asarray(state.x[:, 0]), n_grid, cfg.grid_extent, nd
        )
        if res is None:
            return None
        starts, hc = res
        fn = jax.jit(make_halo_frame(
            mesh, "x", bcs, grid, hc, cfg.substep_dt, substeps,
            migrate_every=min(5, substeps),
        ))
        soa, aux, mat, orig, ok = bootstrap_slots(
            state, model, starts, grid, hc
        )
        lowered = fn.lower(
            soa, aux, mat, orig, jnp.asarray(starts, jnp.int32), model,
            jnp.float32(0.0),
        )
    elif name == "halo_tiled":
        from gsmpm_tpu.parallel.halo_tiled import (
            bootstrap_slots_tiled, make_halo_tiled_frame,
            quantile_tile_starts,
        )

        res = quantile_tile_starts(
            np.asarray(state.x[:, 0]), n_grid, cfg.grid_extent, nd
        )
        if res is None:
            return None
        starts, hc, tc = res
        fn = jax.jit(make_halo_tiled_frame(
            mesh, "x", bcs, grid, hc, tc, cfg.substep_dt, substeps,
            migrate_every=min(5, substeps), impl="ref",
        ))
        (soa, aux, mat, orig, ok), _ = bootstrap_slots_tiled(
            state, model, starts, grid, hc
        )
        lowered = fn.lower(
            soa, aux, mat, orig, jnp.asarray(starts, jnp.int32), model,
            jnp.float32(0.0),
        )
    else:
        raise ValueError(name)

    hlo = lowered.compile().as_text()
    per_frame, counts = collective_bytes(hlo, nd)
    # classification per engine family:
    # - psum/tiled: the grid psum (all-reduce) IS the per-substep traffic;
    #   their all-gathers are bootstrap/view only.
    # - halo/halo_tiled: collective-permutes (strips + the small migration
    #   buffers) are the per-substep traffic; their all-reduce is the
    #   frame-END replicated original-order view (once per frame — divide
    #   by substeps/frame when amortizing) plus scalar ok-flags; their
    #   all-gathers are bootstrap + the never-taken gathered-fallback
    #   branch of the migration lax.cond (HLO text counts both branches).
    if name in ("psum", "tiled"):
        steady = per_frame["all-reduce"] + per_frame["reduce-scatter"]
        view = 0
    else:
        steady = per_frame["collective-permute"]
        view = per_frame["all-reduce"]
    return {
        "per_substep_MB": steady / 1e6,
        "frame_view_MB": view / 1e6,
        "per_frame": {k: v / 1e6 for k, v in per_frame.items() if v},
        "counts": {k: v for k, v in counts.items() if v},
    }


def main():
    nd = jax.device_count()
    assert nd == 8, nd
    # measured single-chip compute per substep (BENCH r3/r4, v5e)
    t_comp_ms = {50: 3.57, 100: 10.08, 128: 10.08 * (128 / 100) ** 3}
    shapes = [("lego", 24576, 50), ("mic", 24576, 100),
              ("mic128", 24576, 128)]
    engines = ["psum", "tiled", "halo", "halo_tiled"]
    results = {}
    for sname, n, g in shapes:
        for e in engines:
            try:
                r = audit_engine(e, n, g)
            except Exception as ex:
                r = {"error": repr(ex)[:120]}
            if r is None:
                r = {"skipped": "decomposition infeasible at this shape"}
            results[(sname, e)] = r
            print(f"{sname:7s} {e:11s} {r}", flush=True)

    print("\n--- projected 1->8 chip efficiency (exposed-comm bound; "
          "frame view amortized over 100 substeps/frame) ---")
    print(f"{'shape':7s} {'engine':11s} {'comm MB/sub':>11s} "
          f"{'eff @45GB/s':>12s} {'eff @90GB/s':>12s}")
    for sname, n, g in shapes:
        for e in engines:
            r = results[(sname, e)]
            if "per_substep_MB" not in r:
                continue
            mb = r["per_substep_MB"] + r.get("frame_view_MB", 0.0) / 100.0
            tc = t_comp_ms[g] / 8.0  # perfect compute split
            e45 = tc / (tc + mb / 45e3 * 1e3)
            e90 = tc / (tc + mb / 90e3 * 1e3)
            print(f"{sname:7s} {e:11s} {mb:11.2f} {e45:12.1%} {e90:12.1%}")


if __name__ == "__main__":
    main()
