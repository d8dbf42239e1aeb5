"""Benchmark: MPM substeps/s, splat Mpix/s, and system-ID fit_frame seconds.

Workload shapes follow BASELINE.md (the reference publishes no numbers, so
the baseline is self-measured):
- forward MPM: ~240k particles, 50^3 grid (and a secondary 100^3 run), 100
  substeps/frame, fixed-corotated jelly;
- splat: 800x800, ~240k gaussians;
- fit_frame: one differentiable system-ID step (30 fwd substeps + render +
  full backward + SGD) at 240k gaussians / 512^2 — the unit the reference
  runs 300x19 times (/root/reference/extra.py:61-64).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

vs_baseline compares against BENCH_BASELINE.json, which the first real-TPU
run writes (all metrics); later runs report per-metric ratios in
extra.vs_baseline_per_metric (>1 is better for every metric; fit is
inverted since lower seconds is better).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import numpy as np


def build_problem(n_particles: int, n_grid: int, res: int):
    import jax.numpy as jnp

    from gsmpm_tpu.config import MPMConfig
    from gsmpm_tpu.models.synthetic import synthetic_box_scene
    from gsmpm_tpu.render.camera import make_camera
    from gsmpm_tpu.sim.boundary import BCSet, make_surface_collider
    from gsmpm_tpu.sim.coupling import world2grid
    from gsmpm_tpu.sim.state import GridConfig, init_model, init_state
    from gsmpm_tpu.sim.volume import particle_volume

    cfg = MPMConfig(
        E=2e5, nu=0.3, material="jelly", n_grid=n_grid, grid_extent=2.0,
        substep_dt=1e-4, frame_dt=1e-2, density=200.0,
    )
    scene = synthetic_box_scene(
        n=n_particles, lo=(-0.5, -0.5, 0.2), hi=(0.5, 0.5, 1.2)
    )
    g_xyz, pos_center, scaling = world2grid(scene.xyz, cfg.grid_extent)
    g_cov = scene.get_covariance() * (scaling * scaling)
    vol = particle_volume(g_xyz, cfg.n_grid, cfg.grid_extent)
    state = init_state(g_xyz, g_cov, vol, cfg)
    model = init_model(cfg, n_particles)
    bcs = BCSet(grid_ops=(make_surface_collider((0, 0, 0.4), (0, 0, 1)),))
    grid = GridConfig(cfg.n_grid, cfg.grid_extent)
    camera = make_camera(
        res, res, 0.8, 0.8, np.eye(3), np.array([0.0, 0.0, -3.0])
    )
    return cfg, scene, state, model, bcs, grid, camera, scaling, pos_center


def bench_mpm(cfg, state, model, bcs, grid, substeps_per_frame, n_frames):
    import jax
    import jax.numpy as jnp

    from gsmpm_tpu.sim.solver import postprocess, run_substeps

    use_tiled = jax.default_backend() == "tpu"
    if use_tiled:
        # the production forward engine on TPU: tiled Pallas transfers with
        # a persistent TiledState across frames (sim/tiles.py)
        from gsmpm_tpu.sim.kernels import soa_from_state, state_from_soa
        from gsmpm_tpu.sim.tiles import (
            bootstrap, default_tile_config, frame_tiled,
        )

        tc = default_tile_config(cfg.n_grid, int(state.mass.shape[0]))
        soa_tpl = soa_from_state(state)

        # soa_tpl/model stay CLOSURE constants here: XLA DCEs the unused
        # template planes so the executable stays small, and passing the
        # ~55-leaf pytrees as per-dispatch args costs ~2 s/frame in tunnel
        # argument overhead (measured).  The renderer is the opposite case
        # (see bench_render).
        @jax.jit
        def frame(ts, t):
            ts, soa, t = frame_tiled(
                ts, soa_tpl, model, bcs, t, substeps_per_frame, grid, tc,
                cfg.substep_dt, impl="pallas",
            )
            st = state_from_soa(soa)
            cov6, _ = postprocess(st)
            return ts, dataclasses.replace(st, cov=cov6), t

        ts = jax.jit(lambda s: bootstrap(soa_from_state(s), model, grid, tc))(
            state
        )
        assert bool(ts.ok), "tile cap overflow in bench scene"
        t_sim = jnp.float32(0.0)
        ts, state, t_sim = frame(ts, t_sim)  # compile + warmup
        jax.block_until_ready(state.x)
        # best of 2 groups: the shared tunnel shows transient slow windows
        # (observed 200 vs 281 substeps/s minutes apart on the identical
        # executable); a single group would record the throttle
        best = 0.0
        for _g in range(2):
            t0 = time.perf_counter()
            for _ in range(n_frames):
                ts, state, t_sim = frame(ts, t_sim)
            np.asarray(state.x.ravel()[0])  # host-forced completion
            best = max(
                best,
                substeps_per_frame * n_frames / (time.perf_counter() - t0),
            )
        assert bool(ts.ok), "tile cap overflow during bench"
        assert bool(np.isfinite(np.asarray(state.x)).all()), "sim diverged"
        return best, state

    @jax.jit
    def frame(state, t):
        state, t = run_substeps(
            state, model, bcs, t, substeps_per_frame, grid, cfg.substep_dt,
            checkpoint_policy=None,
        )
        cov6, _ = postprocess(state)
        return dataclasses.replace(state, cov=cov6), t

    t_sim = jnp.float32(0.0)
    state, t_sim = frame(state, t_sim)  # compile + warmup
    jax.block_until_ready(state.x)
    best = 0.0
    for _g in range(2):  # best of 2 groups (tunnel throttle windows)
        t0 = time.perf_counter()
        for _ in range(n_frames):
            state, t_sim = frame(state, t_sim)
        np.asarray(state.x.ravel()[0])  # host-forced completion
        best = max(
            best, substeps_per_frame * n_frames / (time.perf_counter() - t0)
        )
    assert bool(np.isfinite(np.asarray(state.x)).all()), "sim diverged"
    return best, state


def bench_render(scene, state, camera, scaling, pos_center, cfg, n_frames):
    import jax
    import jax.numpy as jnp

    from gsmpm_tpu.render.renderer import RasterConfig, render
    from gsmpm_tpu.sim.coupling import grid2world

    rcfg = RasterConfig()
    bg = jnp.zeros(3)
    opacity = scene.get_opacity().reshape(-1)
    features = scene.get_features()

    # opacity/features are traced ARGS, not closure constants: closed over,
    # the ~48 MB of SH coefficients get constant-folded into the serialized
    # executable (measured 178 MB), making each compile AND each
    # persistent-cache load minutes-slow over the tunnel; as 2 argument
    # leaves they cost nothing per dispatch
    @jax.jit
    def frame(xyz_g, cov_g, opacity, features):
        xyz_w, cov_w = grid2world(
            xyz_g, cov_g, scaling, pos_center, cfg.grid_extent
        )
        return render(
            xyz_w, cov_w, opacity, features, camera, bg, scene.sh_degree, rcfg
        )

    # distinct input buffers per dispatch: the axon tunnel deduplicates
    # identical dispatches (same executable + args return a cached result),
    # so a repeat-same-args loop measures dispatch overhead, not rendering
    # (scripts/tpu_timing.py).  Best of 3 groups: the shared tunnel shows
    # transient ~3x slow windows (observed 25 vs 67 Mpix/s on identical
    # executables minutes apart); a single mean would record the throttle,
    # not the renderer.
    n_rep = max(n_frames, 8)
    xs = [state.x * (1.0 + 1e-6 * (i + 1)) for i in range(3 * n_rep)]
    img = frame(xs[0], state.cov, opacity, features)
    jax.block_until_ready(img)
    best = 0.0
    mpix = camera.width * camera.height * n_rep / 1e6
    for g in range(3):
        t0 = time.perf_counter()
        for i in range(g * n_rep, (g + 1) * n_rep):
            img = frame(xs[i], state.cov, opacity, features)
        np.asarray(img.ravel()[0])  # host-forced completion
        best = max(best, mpix / (time.perf_counter() - t0))
    return best, img


def bench_render_dropfree(scene, state, camera, scaling, pos_center, cfg,
                          n_frames):
    """The HONEST splat number (round 4): caps sized to the scene's
    measured per-stream candidate maxima so n_dropped == 0 — the uncapped
    CUDA tile pipeline's semantics (/root/reference/main.py:148-156).  The
    legacy bench_render number renders with the default caps, which on the
    bench scene silently truncate ~514k intersecting candidates (measured
    r4); this one blends every candidate, like the reference would.
    Returns (mpix_per_s, n_dropped) — n_dropped asserted zero."""
    import jax
    import jax.numpy as jnp

    from gsmpm_tpu.render.renderer import (
        RasterConfig, render_with_aux, required_raster_caps,
    )
    from gsmpm_tpu.sim.coupling import grid2world

    bg = jnp.zeros(3)
    opacity = scene.get_opacity().reshape(-1)
    features = scene.get_features()
    xyz_w, cov_w = grid2world(
        state.x, state.cov, scaling, pos_center, cfg.grid_extent
    )
    if jax.default_backend() == "tpu":
        # round-5 production selection: the sorted-segment STREAMING
        # rasterizer (render/stream_raster.py) — no per-tile K caps, so
        # drop-free at any density; only the (small) tier budgets for
        # large splats are sized from the measured populations
        from gsmpm_tpu.render.stream_raster import required_stream_caps

        scfg = RasterConfig(stream=True, stream_unroll=4)
        sneed = required_stream_caps(xyz_w, cov_w, opacity, camera, scfg)

        def upg(cur, needed, floor):
            return max(cur, floor, -(-int(needed * 1.5) // 32) * 32)

        rcfg = scfg._replace(
            stream_g2=upg(scfg.stream_g2, sneed["stream_g2"], 256),
            stream_g3=upg(scfg.stream_g3, sneed["stream_g3"], 64),
            stream_g4=upg(scfg.stream_g4, sneed["stream_g4"], 16),
        )
    else:
        need = required_raster_caps(
            xyz_w, cov_w, opacity, camera, RasterConfig()
        )

        def up(needed):
            return max(128, -(-int(needed * 1.25) // 128) * 128)

        # two-tier drop-free config (the pre-stream path, kept for CPU
        # smoke runs): every block keeps the default k_tile; only the
        # measured number of over-cap tiles is re-blended at the measured
        # maximum (renderer._render_pallas_two_tier)
        rcfg = RasterConfig()._replace(
            k_dense=up(need["k_tile"]),
            n_dense=min(max(need["n_fine_over"] + 4, 8), 64),
            k_coarse=up(need["k_coarse"]),
            k_global=up(need["k_global"]),
        )

    @jax.jit
    def frame(xyz_g, cov_g, opacity, features):
        xyz_w, cov_w = grid2world(
            xyz_g, cov_g, scaling, pos_center, cfg.grid_extent
        )
        return render_with_aux(
            xyz_w, cov_w, opacity, features, camera, bg, scene.sh_degree,
            rcfg,
        )

    n_rep = min(max(n_frames, 4), 6)
    xs = [state.x * (1.0 + 1e-6 * (i + 1)) for i in range(2 * n_rep)]
    img, nd = frame(xs[0], state.cov, opacity, features)
    jax.block_until_ready(img)
    n_dropped = int(nd)
    best = 0.0
    mpix = camera.width * camera.height * n_rep / 1e6
    for g in range(2):
        t0 = time.perf_counter()
        for i in range(g * n_rep, (g + 1) * n_rep):
            img, nd = frame(xs[i], state.cov, opacity, features)
        np.asarray(img.ravel()[0])  # host-forced completion
        best = max(best, mpix / (time.perf_counter() - t0))
    return best, n_dropped


def bench_fit(n_particles: int, res: int, substeps: int, n_reps: int):
    """One system-ID fit_frame at reference scale: forward `substeps`
    differentiable substeps + render + full backward + SGD (VERDICT r2
    item 2 — the reference workload is 300 iters x 19 frames of exactly
    this step at ~240k gaussians / 512^2 / 30 substeps,
    /root/reference/extra.py:61-64,206-234).  Returns seconds per fit_frame.
    """
    import jax
    import jax.numpy as jnp

    from gsmpm_tpu.config import MPMConfig
    from gsmpm_tpu.models.synthetic import synthetic_blob_scene
    from gsmpm_tpu.render.camera import make_camera
    from gsmpm_tpu.render.renderer import RasterConfig
    from gsmpm_tpu.sim.fitting import FitConfig, SystemIdentifier

    scene = synthetic_blob_scene(n=n_particles, radius=0.4,
                                 center=(0.0, 0.8, 0.0))
    cfg = MPMConfig(
        material="jelly", E=1e4, nu=0.3, n_grid=50, grid_extent=2.0,
        gravity=[0.0, -9.81, 0.0], fitting=True,
    )
    init_v = jnp.tile(jnp.asarray([0.0, -2.0, 0.0], jnp.float32)[None],
                      (n_particles, 1))
    ident = SystemIdentifier(
        scene, cfg, init_velocity=init_v,
        fit_cfg=FitConfig(substeps_per_frame=substeps),
        raster_cfg=RasterConfig(), bg=jnp.ones(3),
    )
    center = np.asarray(scene.xyz.mean(0))
    pos = center + np.array([0.0, 0.25, 3.0])
    fwd = center - pos
    fwd /= np.linalg.norm(fwd)
    down = np.array([0.0, -1.0, 0.0])
    yv = down - down.dot(fwd) * fwd
    yv /= np.linalg.norm(yv)
    cam = make_camera(res, res, 0.7, 0.7,
                      np.column_stack([np.cross(yv, fwd), yv, fwd]), pos)
    gt = ident.generate_ground_truth(3e3, 0.3, [cam], 2)[1]

    state = ident.reset_state()
    t = jnp.float32(0.0)
    # warm up: fit_frame internally measures + resizes the rasterizer caps
    # and re-runs until the frame is drop-free (a dense 512^2 scene
    # overflows the default k_tile), so two calls settle it — one to
    # converge the caps + compile, one steady-state.  The timed region must
    # measure the DROP-FREE step (VERDICT r3 item 1: the reference's CUDA
    # binning is uncapped; a dropped-candidate step times a gradient the
    # reference would not compute).
    for _ in range(2):
        loss, state, t, img = ident.fit_frame(state, t, cam, gt)
    jax.block_until_ready(img)
    assert ident.n_dropped_last == 0, (
        f"fit bench is not drop-free: n_dropped={ident.n_dropped_last} "
        f"after {ident._k_bumps} cap rebuilds"
    )
    assert np.isfinite(float(loss)), "fit bench produced non-finite loss"
    for _attempt in range(3):
        k0 = ident._total_rebuilds
        t0 = time.perf_counter()
        for _ in range(n_reps):
            loss, state, t, img = ident.fit_frame(state, t, cam, gt)
        np.asarray(img.ravel()[0])  # host-forced completion
        dt_wall = time.perf_counter() - t0
        if ident._total_rebuilds == k0:
            break  # no cap rebuild (recompile) polluted the timed region
        # (_k_bumps resets on every drop-free frame since r5, so the
        # monotonic counter is the reliable recompile detector)
    assert np.isfinite(float(loss)), "fit bench diverged"
    assert ident.n_dropped_last == 0, "fit bench dropped candidates mid-timing"
    return dt_wall / n_reps, int(ident.n_dropped_last)


def _load_baseline():
    if not os.path.exists("BENCH_BASELINE.json"):
        return None
    try:
        with open("BENCH_BASELINE.json") as f:
            return json.load(f)
    except Exception:
        return None


def _maybe_write_baseline(metrics: dict):
    """First real-TPU run records the baseline all later runs compare to
    (VERDICT r2 item 8 — vs_baseline must be real, regressions visible)."""
    import jax

    if jax.default_backend() != "tpu":
        return False
    with open("BENCH_BASELINE.json", "w") as f:
        json.dump({k: v for k, v in metrics.items() if v is not None},
                  f, indent=1)
    return True


def main():
    from gsmpm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=245760)
    ap.add_argument("--n_grid", type=int, default=50)
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--substeps", type=int, default=100)
    ap.add_argument("--sim_frames", type=int, default=3)
    ap.add_argument("--render_frames", type=int, default=3)
    ap.add_argument("--fit_particles", type=int, default=245760)
    ap.add_argument("--fit_res", type=int, default=512)
    ap.add_argument("--fit_substeps", type=int, default=30)
    ap.add_argument("--fit_frames", type=int, default=3)
    ap.add_argument("--small", action="store_true",
                    help="tiny CPU-friendly smoke-test sizes")
    ap.add_argument("--skip_100grid", action="store_true",
                    help="skip the secondary 100^3-grid MPM measurement")
    ap.add_argument("--skip_fit", action="store_true",
                    help="skip the system-ID fit_frame measurement")
    args = ap.parse_args()
    if args.small:
        args.particles, args.n_grid, args.res = 4096, 24, 128
        args.substeps, args.sim_frames, args.render_frames = 10, 2, 2
        args.skip_100grid = True
        args.fit_particles, args.fit_res = 512, 64
        args.fit_substeps, args.fit_frames = 5, 1

    (cfg, scene, state, model, bcs, grid, camera, scaling, pos_center) = (
        build_problem(args.particles, args.n_grid, args.res)
    )

    substeps_per_s, state = bench_mpm(
        cfg, state, model, bcs, grid, args.substeps, args.sim_frames
    )
    mpix_per_s, _ = bench_render(
        scene, state, camera, scaling, pos_center, cfg, args.render_frames
    )
    # honest drop-free splat number (round 4): caps sized to the measured
    # per-stream maxima; the legacy number above keeps the default caps for
    # cross-round comparability but truncates on this scene (BASELINE.md)
    mpix_dropfree = splat_n_dropped = None
    try:
        mpix_dropfree, splat_n_dropped = bench_render_dropfree(
            scene, state, camera, scaling, pos_center, cfg,
            args.render_frames,
        )
        assert splat_n_dropped == 0, splat_n_dropped
    except Exception as e:  # keep the primary metrics alive
        print(f"(drop-free render bench failed: {e!r})", flush=True)

    # the reference's large scenes (mic/chair/udon/metal_cupnoodle) run a
    # 100^3 grid (/root/reference/configs/mic.json:14); measure that shape
    # too so scaling past 50^3 stays validated (VERDICT r1 item 7)
    substeps_per_s_100 = None
    if not args.skip_100grid and args.n_grid != 100:
        try:
            (cfg2, _, state2, model2, bcs2, grid2, *_rest) = build_problem(
                args.particles, 100, args.res
            )
            substeps_per_s_100, _ = bench_mpm(
                cfg2, state2, model2, bcs2, grid2, args.substeps,
                max(1, args.sim_frames - 1),
            )
        except Exception as e:  # keep the primary metric alive
            print(f"(100-grid bench failed: {e!r})", flush=True)

    # system-ID training step at reference scale (VERDICT r2 item 2)
    fit_frame_s = fit_n_dropped = None
    if not args.skip_fit:
        try:
            fit_frame_s, fit_n_dropped = bench_fit(
                args.fit_particles, args.fit_res, args.fit_substeps,
                args.fit_frames,
            )
        except Exception as e:  # keep the primary metrics alive
            print(f"(fit bench failed: {e!r})", flush=True)

    metrics = {
        "mpm_substeps_per_s": round(substeps_per_s, 2),
        "splat_mpix_per_s": round(mpix_per_s, 2),
        "mpm_substeps_per_s_100grid": (
            round(substeps_per_s_100, 2)
            if substeps_per_s_100 is not None else None
        ),
        "fit_frame_s": round(fit_frame_s, 3) if fit_frame_s else None,
    }
    baseline = _load_baseline()
    wrote_baseline = False
    if baseline is None and not args.small:
        wrote_baseline = _maybe_write_baseline(metrics)

    def ratio(key, higher_is_better=True):
        if not baseline or baseline.get(key) in (None, 0) or \
                metrics.get(key) is None:
            return None
        r = metrics[key] / baseline[key]
        return round(r if higher_is_better else 1.0 / r, 3)

    vs = ratio("mpm_substeps_per_s") or 1.0
    print(json.dumps({
        "metric": "mpm_substeps_per_s_per_chip",
        "value": round(substeps_per_s, 2),
        "unit": "substeps/s",
        "vs_baseline": vs,
        "extra": {
            "splat_mpix_per_s_per_chip": round(mpix_per_s, 2),
            **(
                {
                    # drop-free (uncapped CUDA semantics) splat number:
                    # every intersecting candidate blended, n_dropped == 0
                    "splat_mpix_per_s_dropfree": round(mpix_dropfree, 2),
                    "splat_dropfree_n_dropped": splat_n_dropped,
                }
                if mpix_dropfree is not None else {}
            ),
            "particles": args.particles,
            "n_grid": args.n_grid,
            "res": args.res,
            "substeps_per_frame": args.substeps,
            # methodology tag (ADVICE r4): since r4, MPM/render groups
            # report best-of-N timing windows (throttle-robust on the
            # shared tunnel); r1-r3 numbers were single-group means
            "timing": "best_of_groups",
            **(
                {"mpm_substeps_per_s_100grid": round(substeps_per_s_100, 2)}
                if substeps_per_s_100 is not None else {}
            ),
            **(
                {
                    "fit_frame_s": round(fit_frame_s, 3),
                    # drop-free proof (VERDICT r3 item 1): the timed step
                    # truncated zero candidates, like the uncapped CUDA
                    # binning it replaces
                    "fit_n_dropped": fit_n_dropped,
                    # full reference system-ID workload
                    # (300 iters x 19 frames, extra.py:61-64)
                    "fit_ref_workload_h": round(
                        300 * 19 * fit_frame_s / 3600.0, 2
                    ),
                }
                if fit_frame_s is not None else {}
            ),
            **(
                {"vs_baseline_per_metric": {
                    "mpm": ratio("mpm_substeps_per_s"),
                    "mpm_100grid": ratio("mpm_substeps_per_s_100grid"),
                    "splat": ratio("splat_mpix_per_s"),
                    "fit": ratio("fit_frame_s", higher_is_better=False),
                }}
                if baseline else
                ({"baseline_recorded": True} if wrote_baseline else {})
            ),
        },
    }))


if __name__ == "__main__":
    main()
