"""Observed-video dataset loading for system identification.

Parity target: SystemIndentifier.load_data_and_cameras / load_physics_info
(/root/reference/extra.py:79-151) — the reference trains E, nu against a
directory of multi-camera video frames:

    data_path/
      camera.json      # [{"camera": name, "K": 3x3, "c2w": 4x4}, ...]
      frame.json       # [{"000": t0}, {"001": t1}, ...] capture times
      physical.json    # physics metadata (E/nu ground truth etc.)
      <cam_name>/
        000.png ... NNN.png   # RGBA frames, composited onto the bg color

The c2w matrices use the OpenGL/Blender convention (the reference flips
columns 1:3 before inverting, extra.py:91-92); intrinsics K give the focal
lengths for focal2fov.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from gsmpm_tpu.render.camera import Camera, focal2fov, make_camera


@dataclass
class ObservedDataset:
    """Multi-camera video observations: images[fid][cam] is (H, W, 3) f32."""

    cameras: List[Camera]  # one per camera (static across frames)
    images: List[List[np.ndarray]]  # [n_frames][n_cameras]
    frame_dts: List[float]  # len n_frames-1, from frame.json capture times
    physics: Dict  # physical.json contents ({} if absent)

    @property
    def n_frames(self) -> int:
        return len(self.images)

    @property
    def n_cameras(self) -> int:
        return len(self.cameras)


def _load_image_rgb(path: str, bg: np.ndarray) -> np.ndarray:
    """PNG -> (H, W, 3) float32 in [0,1], alpha composited onto bg.

    Parity: the RGBA->RGB compositing at /root/reference/extra.py:101-105.
    """
    import imageio.v2 as imageio

    im = np.asarray(imageio.imread(path)).astype(np.float32) / 255.0
    if im.ndim == 2:
        im = np.stack([im] * 3, axis=-1)
    if im.shape[-1] == 4:
        rgb, a = im[..., :3], im[..., 3:4]
        im = rgb * a + bg[None, None, :] * (1.0 - a)
    return im[..., :3]


def camera_from_K_c2w(
    K: np.ndarray, c2w: np.ndarray, width: int, height: int,
    znear: float = 0.01, zfar: float = 100.0,
) -> Camera:
    """Build a Camera from an intrinsic matrix + OpenGL-convention c2w."""
    c2w = np.array(c2w, dtype=np.float64)
    c2w[:3, 1:3] *= -1  # OpenGL -> COLMAP/3DGS convention (extra.py:91)
    R_c2w = c2w[:3, :3]
    position = c2w[:3, 3]
    fovx = focal2fov(float(K[0][0]), width)
    fovy = focal2fov(float(K[1][1]), height)
    return make_camera(width, height, fovx, fovy, R_c2w, position, znear, zfar)


def load_observed_dataset(
    data_path: str,
    width: int = 512,
    height: int = 512,
    bg: Sequence[float] = (1.0, 1.0, 1.0),
    n_frames: Optional[int] = None,
) -> ObservedDataset:
    """Load a reference-format observation directory (see module docstring)."""
    bg = np.asarray(bg, np.float32)
    with open(os.path.join(data_path, "camera.json")) as f:
        cam_defs = json.load(f)

    cameras = []
    names = []
    for cd in cam_defs:
        cameras.append(camera_from_K_c2w(cd["K"], cd["c2w"], width, height))
        names.append(cd["camera"])

    # frame count: explicit, from frame.json, or from the first camera dir
    frame_times = None
    frame_json = os.path.join(data_path, "frame.json")
    if os.path.exists(frame_json):
        with open(frame_json) as f:
            raw = json.load(f)
        frame_times = [float(list(entry.values())[0]) for entry in raw]
    if n_frames is None:
        if frame_times is not None:
            n_frames = len(frame_times)
        else:
            cam_dir = os.path.join(data_path, names[0])
            n_frames = len(
                [p for p in os.listdir(cam_dir) if p.endswith(".png")]
            )

    images: List[List[np.ndarray]] = []
    for fid in range(n_frames):
        per_cam = []
        for name in names:
            path = os.path.join(data_path, name, f"{fid:03d}.png")
            per_cam.append(_load_image_rgb(path, bg))
        images.append(per_cam)

    if frame_times is not None and len(frame_times) >= 2:
        dts = [
            frame_times[i + 1] - frame_times[i]
            for i in range(min(n_frames, len(frame_times)) - 1)
        ]
    else:
        dts = [1.0 / 25.0] * max(n_frames - 1, 0)

    physics: Dict = {}
    phys_json = os.path.join(data_path, "physical.json")
    if os.path.exists(phys_json):
        with open(phys_json) as f:
            physics = json.load(f)

    return ObservedDataset(
        cameras=cameras, images=images, frame_dts=dts, physics=physics
    )
