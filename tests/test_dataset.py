"""Observed-video dataset loading (io/dataset.py) + identify --data_path e2e.

Parity target: SystemIndentifier.load_data_and_cameras / load_physics_info
(/root/reference/extra.py:79-151).
"""

import json
import os

import numpy as np
import jax.numpy as jnp

from gsmpm_tpu.io.dataset import camera_from_K_c2w, load_observed_dataset
from gsmpm_tpu.render.camera import fov2focal, make_camera


def _write_png(path, rgba):
    import imageio.v2 as imageio

    imageio.imwrite(
        path, np.round(np.clip(rgba, 0, 1) * 255).astype(np.uint8)
    )


def _camera_files(res, positions):
    """camera.json entries (K + OpenGL-convention c2w) aimed at the origin."""
    defs, cams = [], []
    for i, pos in enumerate(positions):
        pos = np.asarray(pos, np.float64)
        fwd = -pos / np.linalg.norm(pos)
        down = np.array([0.0, -1.0, 0.0])
        y = down - down.dot(fwd) * fwd
        y = y / np.linalg.norm(y)
        x = np.cross(y, fwd)
        R_c2w = np.column_stack([x, y, fwd])  # COLMAP/3DGS convention
        fov = 0.7
        f = fov2focal(fov, res)
        K = [[f, 0.0, res / 2], [0.0, f, res / 2], [0.0, 0.0, 1.0]]
        c2w = np.eye(4)
        c2w[:3, :3] = R_c2w
        c2w[:3, 3] = pos
        c2w_gl = np.array(c2w, copy=True)
        c2w_gl[:3, 1:3] *= -1  # loader un-flips (extra.py:91)
        defs.append({"camera": f"cam{i}", "K": K, "c2w": c2w_gl.tolist()})
        cams.append(make_camera(res, res, fov, fov, R_c2w, pos))
    return defs, cams


def test_observed_dataset_roundtrip(tmp_path):
    res, n_frames = 32, 3
    defs, expected_cams = _camera_files(
        res, [(0.0, 0.3, 3.0), (3.0, 0.3, 0.0)]
    )
    with open(tmp_path / "camera.json", "w") as f:
        json.dump(defs, f)
    with open(tmp_path / "frame.json", "w") as f:
        json.dump([{f"{i:03d}": 0.04 * i} for i in range(n_frames)], f)
    with open(tmp_path / "physical.json", "w") as f:
        json.dump({"E": 12345.0, "nu": 0.25}, f)

    rng = np.random.default_rng(0)
    truth = {}
    for d in defs:
        os.makedirs(tmp_path / d["camera"], exist_ok=True)
        for fid in range(n_frames):
            rgba = rng.uniform(0.0, 1.0, size=(res, res, 4)).astype(np.float32)
            _write_png(tmp_path / d["camera"] / f"{fid:03d}.png", rgba)
            truth[(fid, d["camera"])] = rgba

    bg = np.array([1.0, 0.5, 0.0], np.float32)
    ds = load_observed_dataset(str(tmp_path), width=res, height=res, bg=bg)
    assert ds.n_frames == n_frames and ds.n_cameras == 2
    assert ds.physics["E"] == 12345.0
    np.testing.assert_allclose(ds.frame_dts, [0.04, 0.04], atol=1e-6)

    # camera round-trip: K + OpenGL c2w -> the same Camera we authored
    for cam, exp in zip(ds.cameras, expected_cams):
        np.testing.assert_allclose(
            np.asarray(cam.view), np.asarray(exp.view), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(cam.campos), np.asarray(exp.campos), atol=1e-6
        )
        assert abs(cam.fovx - exp.fovx) < 1e-6

    # image compositing: rgb*a + bg*(1-a), 8-bit quantized
    rgba = truth[(1, "cam0")]
    q = np.round(np.clip(rgba, 0, 1) * 255) / 255.0
    exp_img = q[..., :3] * q[..., 3:4] + bg[None, None, :] * (1 - q[..., 3:4])
    np.testing.assert_allclose(ds.images[1][0], exp_img, atol=2e-3)


def test_identify_from_png_dir_descends(tmp_path):
    """identify.py --data_path end to end: ground truth simulated at E*,
    saved as a reference-format observation directory, then recovered from
    the PNGs alone (loss decreases, E moves toward E*)."""
    from gsmpm_tpu.config import MPMConfig
    from gsmpm_tpu.models.synthetic import synthetic_blob_scene
    from gsmpm_tpu.render.renderer import RasterConfig
    from gsmpm_tpu.sim.fitting import FitConfig, SystemIdentifier

    res, n, n_frames = 48, 256, 3
    defs, cams = _camera_files(res, [(0.0, 0.3, 3.0)])
    scene = synthetic_blob_scene(n=n, radius=0.4, center=(0.0, 0.6, 0.0))
    init_v = jnp.tile(jnp.asarray([0.0, -4.0, 0.0], jnp.float32)[None],
                      (n, 1))
    mpm_cfg = MPMConfig(
        material="jelly", E=1e4, nu=0.4, n_grid=32, grid_extent=2.0,
        gravity=[0.0, -9.81, 0.0], fitting=True,
    )
    rcfg = RasterConfig(block=32, k_block=min(256, n), chunk=32, impl="xla")
    ident = SystemIdentifier(
        scene, mpm_cfg, init_velocity=init_v,
        fit_cfg=FitConfig(substeps_per_frame=8, tie_params=True),
        raster_cfg=rcfg, bg=jnp.ones(3),
    )
    gt = ident.generate_ground_truth(3e3, 0.3, cams, n_frames)

    with open(tmp_path / "camera.json", "w") as f:
        json.dump(defs, f)
    os.makedirs(tmp_path / "cam0", exist_ok=True)
    for fid in range(n_frames):
        _write_png(tmp_path / "cam0" / f"{fid:03d}.png",
                   np.asarray(gt[fid]))

    ds = load_observed_dataset(str(tmp_path), width=res, height=res,
                               bg=np.ones(3, np.float32))
    E0 = ident.optimized_E
    losses = []
    for it in range(3):
        state = ident.reset_state()
        t = jnp.float32(0.0)
        for fid in range(1, n_frames):
            loss, state, t, _ = ident.fit_frame(
                state, t, ds.cameras[0], jnp.asarray(ds.images[fid][0])
            )
            losses.append(float(loss))
    assert ident.optimized_E < E0, (E0, ident.optimized_E)
    # same-frame loss (the last fit frame) must not rise across iterations
    assert losses[-1] <= losses[1] + 1e-6, losses
