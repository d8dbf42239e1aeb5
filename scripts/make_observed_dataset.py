"""Generate a reference-format observed-video dataset at full scale.

VERDICT r4 item 7: the recorded E/nu recoveries drove
SystemIdentifier.generate_ground_truth in-process; the reference's actual
input mode is a DIRECTORY of multi-camera video frames
(/root/reference/extra.py:79-151).  This script simulates the identify
app's own synthetic scene at known (E*, nu*), renders EVERY ring camera
each frame, and writes the camera.json / frame.json / physical.json /
<cam>/NNN.png layout io/dataset.py loads — so
``apps/identify.py --data_path`` exercises the dataset door end-to-end at
245k/512^2.

    python scripts/make_observed_dataset.py --out /tmp/obs245k \
        [--particles 245760] [--res 512] [--frames 20] [--cams 8]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--particles", type=int, default=245760)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--cams", type=int, default=8)
    ap.add_argument("--E_true", type=float, default=3e3)
    ap.add_argument("--nu_true", type=float, default=0.3)
    args = ap.parse_args()

    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    from gsmpm_tpu.config import MPMConfig
    from gsmpm_tpu.models.synthetic import synthetic_blob_scene
    from gsmpm_tpu.render.camera import fov2focal, make_camera
    from gsmpm_tpu.render.renderer import RasterConfig
    from gsmpm_tpu.sim.fitting import FitConfig, SystemIdentifier
    from gsmpm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # the identify app's own synthetic scene + init velocity
    # (apps/identify.py:load_scene_and_velocity)
    scene = synthetic_blob_scene(
        n=args.particles, radius=0.4, center=(0.0, 0.8, 0.0)
    )
    init_v = jnp.tile(
        jnp.asarray([0.0, -2.0, 0.0], jnp.float32)[None],
        (args.particles, 1),
    )
    mpm_cfg = MPMConfig(
        material="jelly", E=3e4, nu=0.4, n_grid=50, grid_extent=2.0,
        gravity=[0.0, -9.81, 0.0], fitting=True,
    )
    ident = SystemIdentifier(
        scene, mpm_cfg, init_velocity=init_v, fit_cfg=FitConfig(),
        raster_cfg=RasterConfig(), bg=jnp.ones(3),
    )

    # ring cameras (identify.make_ring_cameras geometry) + their
    # camera.json entries in the loader's K + OpenGL-c2w convention
    center = np.asarray(scene.xyz.mean(0))
    res = args.res
    fov = 0.7
    f = fov2focal(fov, res)
    defs, cams = [], []
    for i in range(args.cams):
        a = np.deg2rad(360.0 * i / args.cams)
        pos = center + 3.0 * np.array([np.cos(a), 0.25, np.sin(a)])
        fwd = center - pos
        fwd = fwd / np.linalg.norm(fwd)
        down = np.array([0.0, -1.0, 0.0])
        y = down - down.dot(fwd) * fwd
        y = y / np.linalg.norm(y)
        x = np.cross(y, fwd)
        R_c2w = np.column_stack([x, y, fwd])
        c2w = np.eye(4)
        c2w[:3, :3] = R_c2w
        c2w[:3, 3] = pos
        c2w_gl = np.array(c2w, copy=True)
        c2w_gl[:3, 1:3] *= -1  # loader un-flips (extra.py:91)
        K = [[f, 0.0, res / 2], [0.0, f, res / 2], [0.0, 0.0, 1.0]]
        defs.append({"camera": f"cam{i}", "K": K, "c2w": c2w_gl.tolist()})
        cams.append(make_camera(res, res, fov, fov, R_c2w, pos))

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "camera.json"), "w") as fjs:
        json.dump(defs, fjs)
    fdt = FitConfig().frame_dt
    with open(os.path.join(args.out, "frame.json"), "w") as fjs:
        json.dump([{f"{i:03d}": fdt * i} for i in range(args.frames)], fjs)
    with open(os.path.join(args.out, "physical.json"), "w") as fjs:
        json.dump({"E": args.E_true, "nu": args.nu_true}, fjs)
    for d in defs:
        os.makedirs(os.path.join(args.out, d["camera"]), exist_ok=True)

    # simulate at (E*, nu*) and render EVERY camera each frame — the
    # multi-camera observation set the reference trains against.
    # generate_ground_truth's own loop renders one camera per frame, so
    # drive the internal frame fn directly; cap-resize machinery applies.
    from gsmpm_tpu.sim.state import logE_y_from_E_nu, mu_lam_from_logE_y
    from gsmpm_tpu.sim.solver import run_substeps
    from gsmpm_tpu.sim.coupling import grid2world, mat_from_upper, upper_from_mat
    from gsmpm_tpu.render.renderer import (
        bump_caps_for_dropfree, render_with_aux,
    )

    logE0, y0 = logE_y_from_E_nu(args.E_true, args.nu_true)
    n = ident.model.logE.shape[0]
    mu, lam = mu_lam_from_logE_y(
        jnp.full((n,), logE0, jnp.float32), jnp.full((n,), y0, jnp.float32)
    )
    model = dataclasses.replace(
        ident.model, logE=jnp.full((n,), logE0, jnp.float32),
        y=jnp.full((n,), y0, jnp.float32), mu=mu, lam=lam,
    )
    state = ident.reset_state()
    fcfg = ident.fit_cfg
    dt = fcfg.frame_dt / fcfg.substeps_per_frame
    grid = ident.grid
    opac, feats = ident._padded_appearance()

    def build(rcfg):
        @jax.jit
        def advance(state, t):
            return run_substeps(
                state, model, ident.bcs, t, fcfg.substeps_per_frame, grid,
                dt, fitting=True, checkpoint_policy=None,
            )

        @jax.jit
        def render_cam(state, view, proj, campos):
            from gsmpm_tpu.render.camera import Camera

            cam = Camera(view=view, full_proj=proj, campos=campos,
                         width=res, height=res, fovx=fov, fovy=fov)
            F = state.F
            cov6 = upper_from_mat(
                F @ mat_from_upper(state.init_cov)
                @ jnp.swapaxes(F, -1, -2)
            )
            xyz_w, cov_w = grid2world(
                state.x, cov6, ident.scaling, ident.pos_center,
                mpm_cfg.grid_extent,
            )
            return render_with_aux(
                xyz_w, cov_w, opac, feats, cam, ident.bg,
                ident.scene.sh_degree, rcfg,
            )

        return advance, render_cam

    rcfg = ident.raster_cfg
    advance, render_cam = build(rcfg)
    t = jnp.float32(0.0)
    for fid in range(args.frames):
        if fid > 0:
            state, t = advance(state, t)
        for ci, cam in enumerate(cams):
            for _try in range(4):
                img, nd = render_cam(
                    state, cam.view, cam.full_proj, cam.campos
                )
                if int(nd) == 0:
                    break
                # drop-free observations (the reference's are uncapped):
                # resize from this frame's world geometry and re-render
                F = state.F
                cov6 = upper_from_mat(
                    F @ mat_from_upper(state.init_cov)
                    @ jnp.swapaxes(F, -1, -2)
                )
                xyz_w, cov_w = grid2world(
                    state.x, cov6, ident.scaling, ident.pos_center,
                    mpm_cfg.grid_extent,
                )
                rcfg = bump_caps_for_dropfree(
                    rcfg, xyz_w, cov_w, opac, cam
                )
                print(f"frame {fid} cam {ci}: resized caps, re-rendering",
                      flush=True)
                advance, render_cam = build(rcfg)
            rgb = np.clip(np.asarray(img), 0.0, 1.0)
            rgba = np.concatenate(
                [rgb, np.ones_like(rgb[..., :1])], axis=-1
            )
            imageio.imwrite(
                os.path.join(args.out, f"cam{ci}", f"{fid:03d}.png"),
                np.round(rgba * 255).astype(np.uint8),
            )
        print(f"frame {fid} done", flush=True)
    print(f"wrote {args.frames} frames x {args.cams} cams to {args.out}")


if __name__ == "__main__":
    main()
