"""Entry point #1: simulate a 3DGS scene as MPM particles and re-render.

Parity target: /root/reference/main.py (simulate()) — same config files, same
pipeline: load gaussians -> sim_area mask -> world2grid -> volumes -> MPM
substeps per frame -> cov = F Sigma0 F^T -> grid2world -> rasterize -> PNG+mp4.

TPU-native difference: the whole frame (substep scan + postprocess + inverse
transforms + rasterization) is ONE jit-compiled function — no host round-trips
inside a frame (the reference crosses host<->device per kernel launch and
copies taichi->torch per frame, /root/reference/main.py:305-313).

Usage:
    python -m gsmpm_tpu.apps.simulate --config_path configs/lego.json \
        [--output_path out] [--synthetic N] [--frames K]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from gsmpm_tpu.config import SimConfig
from gsmpm_tpu.io.cameras import load_cameras
from gsmpm_tpu.io.video import encode_video, save_frame
from gsmpm_tpu.models.gaussians import GaussianScene, load_gaussians
from gsmpm_tpu.models.synthetic import synthetic_box_scene
from gsmpm_tpu.render.camera import Camera, make_camera, orbit_camera
from gsmpm_tpu.render.renderer import RasterConfig, render_with_aux
from gsmpm_tpu.render.sh import rotate_sh
from gsmpm_tpu.sim.boundary import build_boundary_conditions, make_surface_collider, BCSet
from gsmpm_tpu.sim.coupling import (
    apply_cov_rotations,
    apply_inverse_cov_rotations,
    apply_inverse_rotations,
    apply_rotations,
    get_center_view_worldspace_and_observant_coordinate,
    grid2world,
    rotation_matrices,
    world2grid,
)
from gsmpm_tpu.sim.solver import postprocess, run_substeps
from gsmpm_tpu.sim.state import GridConfig, init_model, init_state
from gsmpm_tpu.sim.volume import particle_volume


def load_scene(cfg: SimConfig, synthetic: Optional[int]) -> GaussianScene:
    if synthetic:
        return synthetic_box_scene(n=synthetic, lo=(-0.5, -0.5, 0.2), hi=(0.5, 0.5, 1.2))
    try:
        return load_gaussians(cfg.model.model_path, cfg.model.loaded_iter)
    except FileNotFoundError as e:
        raise SystemExit(
            f"Could not load {cfg.model.model_path}: {e}\n"
            "(checkpoints in this snapshot are git-lfs stubs; pass --synthetic N "
            "to run on a generated scene)"
        )


def simulate(cfg: SimConfig, synthetic: Optional[int] = None,
             frames: Optional[int] = None, quiet: bool = False,
             checkpoint_interval: int = 0, resume: bool = False,
             mesh: str = "auto", synthetic_res: int = 800):
    """Simulate + render.

    mesh: "auto" (shard over all devices when jax.device_count() > 1),
    "none" (single-device jit), or "data=N" (N-way particle sharding).
    Multi-device runs pick an engine per scene — halo x-slab decomposition
    for big grids, chunk-sharded tiled Pallas on TPU, psum-sharded planes
    otherwise (parallel/engines.py) — and tile-shard the renderer over the
    same axis; frames match the single-device run (tests/test_apps_mesh.py).
    """
    mpm = cfg.mpm
    t_start = time.time()

    scene = load_scene(cfg, synthetic)

    # rotation pre-transform (identity by default; parity /root/reference/main.py:175-176)
    mats = rotation_matrices(
        list(mpm.rotation_degree)[: len(mpm.rotation_axis)], list(mpm.rotation_axis)
    ) if any(d != 0 for d in mpm.rotation_degree) else rotation_matrices([0.0], [0])
    rotated_xyz = apply_rotations(scene.xyz, mats)

    # sim_area mask (parity /root/reference/main.py:189-194)
    bounds = jnp.asarray(mpm.sim_area, jnp.float32)
    sim_mask = jnp.all(
        (rotated_xyz >= bounds[0]) & (rotated_xyz <= bounds[1]), axis=1
    )
    sim_idx = jnp.nonzero(sim_mask)[0]
    n_sim = int(sim_mask.sum())
    if not quiet:
        print(f"Number of simulatable Gaussians: {n_sim} / {scene.num_gaussians}")

    sim_means = rotated_xyz[sim_idx]
    sim_covs = apply_cov_rotations(scene.get_covariance()[sim_idx], mats)

    g_xyz, pos_center, scaling = world2grid(sim_means, mpm.grid_extent)
    g_cov = sim_covs * (scaling * scaling)

    # camera (parity /root/reference/main.py:244-268: orbit re-aim with
    # azimuth 130, elevation 10, radius 5.75 around the grid center)
    center_w, obs = get_center_view_worldspace_and_observant_coordinate(
        np.array([mpm.grid_extent / 2.0] * 3, np.float32).reshape(1, 3) * 0
        + np.array([0.5, 0.5, 0.5], np.float32),
        np.array([0.0, 0.0, 1.0], np.float32),
        mats,
        scaling,
        pos_center,
        mpm.grid_extent,
    )
    if synthetic:
        template = make_camera(synthetic_res, synthetic_res, 0.8, 0.8,
                               np.eye(3), np.zeros(3))
    else:
        template = load_cameras(cfg.model.model_path)[0]
    camera = orbit_camera(template, 130.0, 10.0, 5.75, center_w, obs)

    # volumes + solver state
    vol = particle_volume(g_xyz, mpm.n_grid, mpm.grid_extent)
    model = init_model(mpm, n_sim)
    state = init_state(g_xyz, g_cov, vol, mpm)
    bcs, state, model = build_boundary_conditions(
        mpm.boundary_conditions, mpm, state, model
    )
    # unconditional ground collider at z=0.4 (parity quirk #10,
    # /root/reference/main.py:276)
    bcs = BCSet(
        particle_ops=bcs.particle_ops,
        grid_ops=bcs.grid_ops + (make_surface_collider((0, 0, 0.4), (0, 0, 1)),),
    )

    grid = GridConfig(mpm.n_grid, mpm.grid_extent)
    bg = jnp.ones(3) if cfg.render.white_background else jnp.zeros(3)
    opacity = scene.get_opacity()[sim_idx].reshape(-1)
    features = scene.get_features()[sim_idx]
    n_steps = mpm.steps_per_frame
    rcfg = RasterConfig()

    # --- multi-device: shard the product path over a mesh (VERDICT r2 #1) --
    # --mesh auto | none | data=N[,engine=halo_tiled|halo|tiled|psum]
    mesh_req = (mesh or "auto").lower()
    ndata = jax.device_count()
    prefer_engine = None
    for part in mesh_req.split(","):
        part = part.strip()
        if part.startswith("data="):
            ndata = int(part.split("=", 1)[1])
        elif part.startswith("engine="):
            prefer_engine = part.split("=", 1)[1]
        elif part == "none":
            ndata = 1
        elif part in ("auto", ""):
            pass
        else:
            raise ValueError(f"unknown --mesh component: {part!r}")
    use_mesh = ndata > 1
    n_unpadded = n_sim
    mesh_engine = render_frame_mesh = None
    if use_mesh:
        from gsmpm_tpu.parallel import make_mesh, pad_particles
        from gsmpm_tpu.parallel.engines import (
            MeshSimEngine, make_mesh_render_fn,
        )

        mesh_obj = make_mesh((("data", ndata),))
        state, model, extras, n_unpadded = pad_particles(
            state, model, ndata, {"opacity": opacity, "features": features}
        )
        opacity, features = extras["opacity"], extras["features"]
        mesh_engine = MeshSimEngine(
            mesh_obj, "data", state, model, bcs, grid, mpm.substep_dt,
            n_steps, incremental_cov=mpm.incremental_cov,
            rotate_sh=mpm.rotate_sh, quiet=quiet, prefer=prefer_engine,
        )

        def _mesh_transform(xyz_g, cov_g, R, opac, feats):
            w_xyz, w_cov = grid2world(
                xyz_g, cov_g, scaling, pos_center, mpm.grid_extent
            )
            w_xyz = apply_inverse_rotations(w_xyz, mats)
            w_cov = apply_inverse_cov_rotations(w_cov, mats)
            shs = feats
            if mpm.rotate_sh:
                shs = rotate_sh(feats, jnp.swapaxes(R, -1, -2), scene.sh_degree)
            return w_xyz, w_cov, opac, shs

        if not quiet:
            print(f"mesh: data={ndata}, sim engine: {mesh_engine.engine}, "
                  "render: tile-sharded")

    @jax.jit
    def sim_frame(state, model, time_):
        state, time_ = run_substeps(
            state, model, bcs, time_, n_steps, grid, mpm.substep_dt,
            mpm.incremental_cov, checkpoint_policy=None,
        )
        cov6_g, R = postprocess(state, rotate_sh=mpm.rotate_sh)
        state = dataclasses.replace(state, cov=cov6_g)
        return state, time_, R

    # tiled Pallas transfer engine (sim/tiles.py + sim/pallas_mpm.py): the
    # default forward path on TPU; persistent TiledState across frames,
    # XLA fallback when the occupied-tile cap overflows
    use_tiled = (
        jax.default_backend() == "tpu" and not mpm.incremental_cov
        and not use_mesh  # mesh mode selects its engine in MeshSimEngine
    )
    if use_tiled:
        from gsmpm_tpu.sim.kernels import soa_from_state, state_from_soa
        from gsmpm_tpu.sim.tiles import (
            bootstrap, default_tile_config, frame_tiled,
        )

        tc = default_tile_config(mpm.n_grid, int(state.mass.shape[0]))

        @jax.jit
        def tiled_boot(state, model):
            return bootstrap(soa_from_state(state), model, grid, tc)

        @jax.jit
        def sim_frame_tiled(ts, soa_tpl, model, time_):
            ts, soa, time_ = frame_tiled(
                ts, soa_tpl, model, bcs, time_, n_steps, grid, tc,
                mpm.substep_dt, impl="pallas",
            )
            st = state_from_soa(soa)
            cov6_g, R = postprocess(st, rotate_sh=mpm.rotate_sh)
            return ts, dataclasses.replace(st, cov=cov6_g), time_, R

    # drop-free product rendering (parity: the reference renders every frame
    # uncapped, /root/reference/main.py:148-156).  Single-device TPU runs the
    # sorted-segment streaming rasterizer (no per-tile K caps — density never
    # truncates); any residual overflow (tier budgets on the stream path,
    # k_row/k_block on the CPU/mesh XLA path) is measured at the offending
    # frame's geometry, the caps resized, and the SAME frame re-rendered
    # (do_render below) — no frame is saved truncated.
    if jax.default_backend() == "tpu" and not use_mesh:
        rcfg = rcfg._replace(stream=True)

    def build_render_fns(rc):
        rf_mesh = None
        if use_mesh:
            rf_mesh = make_mesh_render_fn(
                mesh_obj, "data", camera, bg, scene.sh_degree, rc,
                _mesh_transform,
            )

        # opacity/features are traced ARGS, not closure constants:
        # closed-over arrays are embedded in the serialized executable,
        # which balloons it (~50 MB of SH coefficients at 245k gaussians)
        # and makes both the compile and every persistent-cache load
        # minutes-slow over the tunnel
        @jax.jit
        def rf(xyz_g, cov_g, R, opacity, features):
            # inverse transforms back to world space (parity main.py:139-146)
            w_xyz, w_cov = grid2world(
                xyz_g, cov_g, scaling, pos_center, mpm.grid_extent
            )
            w_xyz = apply_inverse_rotations(w_xyz, mats)
            w_cov = apply_inverse_cov_rotations(w_cov, mats)
            shs = features
            if mpm.rotate_sh and R is not None:
                shs = rotate_sh(
                    features, jnp.swapaxes(R, -1, -2), scene.sh_degree
                )
            return render_with_aux(
                w_xyz, w_cov, opacity, shs, camera, bg, scene.sh_degree, rc
            )

        return rf, rf_mesh

    render_frame, render_frame_mesh = build_render_fns(rcfg)

    out_dir = cfg.render.output_path or "outputs/run"
    images_dir = os.path.join(out_dir, "images")
    os.makedirs(images_dir, exist_ok=True)

    num_frames = frames if frames is not None else cfg.render.num_frames
    t_sim = jnp.float32(0.0)
    frames_np = []
    start_frame = 1

    # full-state resume (state + material model + sim clock; SURVEY.md §5 —
    # capability the reference lacks, its PLY dumps are view-only).
    # Checkpoints always hold the UNPADDED particle set: a run written with
    # --mesh data=N stays resumable under --mesh none or any other N
    # (the padding multiple is a launch-time detail, not sim state).
    n_padded = int(state.x.shape[0])

    def _strip_pad(tree):
        return jax.tree.map(
            lambda l: l[:n_unpadded]
            if hasattr(l, "ndim") and l.ndim >= 1 and l.shape[0] == n_padded
            else l,
            tree,
        )

    ckpt_dir = os.path.join(out_dir, "checkpoints")
    if resume:
        from gsmpm_tpu.io.checkpoint import latest_step, restore_checkpoint

        if latest_step(ckpt_dir) is not None:
            st_tpl, md_tpl = _strip_pad((state, model))
            (state_u, model_u, t_sim), fid0, extra = restore_checkpoint(
                ckpt_dir, (st_tpl, md_tpl, t_sim)
            )
            # checkpoints written before the unpadded-template change (under
            # --mesh data=N) stored PADDED particle arrays; restore is
            # structure-only, so strip any stored padding down to the real
            # particle count before re-padding for this launch (ADVICE r4)
            n_stored = int(state_u.x.shape[0])
            if n_stored > n_unpadded:
                state_u, model_u = jax.tree.map(
                    lambda l: l[:n_unpadded]
                    if hasattr(l, "ndim") and l.ndim >= 1
                    and l.shape[0] == n_stored
                    else l,
                    (state_u, model_u),
                )
            if use_mesh:
                from gsmpm_tpu.parallel import pad_particles as _pp

                state, model, _, _ = _pp(state_u, model_u, ndata)
            else:
                state, model = state_u, model_u
            start_frame = fid0 + 1
            if not quiet:
                print(f"resumed from checkpoint at frame {fid0}")

    _df_bumps = [0]  # consecutive drop-free rebuild budget (cf. fitting)

    def do_render(state, R):
        """Render, and if ANY candidate was truncated, measure the needed
        caps at this frame's geometry, resize, rebuild and re-render the
        SAME frame — the saved PNGs/video match the reference's uncapped
        semantics (VERDICT r4 item 3)."""
        nonlocal rcfg, render_frame, render_frame_mesh
        from gsmpm_tpu.render.renderer import bump_caps_for_dropfree

        while True:
            if use_mesh:
                Rm = R if R is not None else jnp.broadcast_to(
                    jnp.eye(3, dtype=jnp.float32), (state.x.shape[0], 3, 3)
                )
                img, nd = render_frame_mesh(
                    state.x, state.cov, Rm, opacity, features
                )
            else:
                img, nd = render_frame(
                    state.x, state.cov, R, opacity, features
                )
            if int(nd) == 0:
                _df_bumps[0] = 0
                return img, nd
            if _df_bumps[0] >= 6:
                return img, nd
            w_xyz, w_cov = grid2world(
                state.x, state.cov, scaling, pos_center, mpm.grid_extent
            )
            w_xyz = apply_inverse_rotations(w_xyz, mats)
            w_cov = apply_inverse_cov_rotations(w_cov, mats)
            new = bump_caps_for_dropfree(rcfg, w_xyz, w_cov, opacity, camera)
            if not quiet:
                print(
                    f"render: {int(nd)} candidates over the caps — resizing "
                    "for a drop-free frame and re-rendering "
                    f"(stream_g2/g3/g4 {new.stream_g2}/{new.stream_g3}/"
                    f"{new.stream_g4}, k_row {new.k_row}, "
                    f"k_block {new.k_block}, k_dense {new.k_dense})"
                )
            rcfg = new
            render_frame, render_frame_mesh = build_render_fns(rcfg)
            _df_bumps[0] += 1

    img, n_dropped = do_render(state, None)
    if int(n_dropped):
        print(f"WARNING: frame {start_frame - 1}: {int(n_dropped)} candidates "
              "still dropped after cap rebuilds")
    save_frame(np.asarray(img), images_dir, start_frame - 1)
    frames_np.append(np.asarray(img))

    ts = None
    for fid in range(start_frame, num_frames + 1):
        t0 = time.time()
        if use_mesh:
            state, t_sim, R = mesh_engine.frame(state, model, t_sim)
        if use_tiled:
            if ts is None:
                ts = tiled_boot(state, model)
                if not bool(ts.ok):
                    use_tiled = False  # too many occupied tiles for the cap
            if use_tiled:
                ts2, state2, t2, R = sim_frame_tiled(
                    ts, soa_from_state(state), model, t_sim
                )
                if bool(ts2.ok):
                    ts, state, t_sim = ts2, state2, t2
                else:
                    use_tiled = False  # overflow mid-frame: redo on XLA
        if not use_tiled and not use_mesh:
            state, t_sim, R = sim_frame(state, model, t_sim)
        img, n_dropped = do_render(state, R)
        img.block_until_ready()
        if int(n_dropped):
            print(f"WARNING: frame {fid}: {int(n_dropped)} candidates still "
                  "dropped after cap rebuilds")
        save_frame(np.asarray(img), images_dir, fid)
        frames_np.append(np.asarray(img))

        if checkpoint_interval and fid % checkpoint_interval == 0:
            from gsmpm_tpu.io.checkpoint import save_checkpoint

            st_u, md_u = _strip_pad((state, model))
            save_checkpoint(
                ckpt_dir, fid, (st_u, md_u, t_sim), extra={"frame": fid}
            )

        if cfg.render.save_pcd and fid % cfg.render.save_pcd_interval == 0:
            w_xyz, _ = grid2world(
                state.x[:n_unpadded], state.cov[:n_unpadded],
                scaling, pos_center, mpm.grid_extent,
            )
            w_xyz = apply_inverse_rotations(w_xyz, mats)
            displaced = dataclasses.replace(
                scene, xyz=scene.xyz.at[sim_idx].set(w_xyz)
            )
            displaced.save_ply(
                os.path.join(
                    out_dir, "point_cloud", f"iteration_{fid}", "point_cloud.ply"
                )
            )
        if not quiet:
            print(f"frame {fid}/{num_frames}  {time.time()-t0:.2f}s", flush=True)

    if cfg.render.save_pcd:
        # viewer-loadable output tree: copy the scene metadata next to the
        # exported point-cloud sequence (parity /root/reference/main.py:327-330)
        import shutil

        for name in ("cameras.json", "cfg_args", "input.ply"):
            src = os.path.join(cfg.model.model_path, name)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(out_dir, name))
            elif not quiet:
                print(f"(save_pcd: {src} not present; skipped)")

    video_path = encode_video(images_dir, os.path.join(out_dir, "simulated"))
    if video_path and not quiet:
        print(f"wrote {video_path}")
    if not quiet:
        print(f"Done in {time.time()-t_start:.1f}s.")
    return frames_np


def main(argv=None):
    from gsmpm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(add_help=True)
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--synthetic", type=int, default=None,
                        help="run on a generated scene with N gaussians")
    parser.add_argument("--frames", type=int, default=None,
                        help="override render.num_frames")
    parser.add_argument("--checkpoint_interval", type=int, default=0,
                        help="save full sim state every N frames")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint in output_path")
    parser.add_argument("--mesh", type=str, default="auto",
                        help='"auto" | "none" | '
                             '"data=N[,engine=halo_tiled|halo|tiled|psum]": '
                             "multi-device particle sharding; engine= forces "
                             "a specific parallel engine (default "
                             "auto-selected; see parallel/engines.py)")
    parser.add_argument("--synthetic_res", type=int, default=800,
                        help="render resolution for --synthetic scenes")
    args, remaining = parser.parse_known_args(argv)
    cfg = SimConfig.from_json(args.config_path).override_from_args(remaining)
    simulate(cfg, synthetic=args.synthetic, frames=args.frames,
             checkpoint_interval=args.checkpoint_interval, resume=args.resume,
             mesh=args.mesh, synthetic_res=args.synthetic_res)


if __name__ == "__main__":
    main()
