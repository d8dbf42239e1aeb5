"""Frame saving and mp4 encoding.

Parity: save_frame + ffmpeg encode (/root/reference/main.py:159-161,333).
Uses imageio for PNGs and subprocess ffmpeg (no shell interpolation) for mp4.
"""

from __future__ import annotations

import os
import subprocess
from typing import Optional

import numpy as np


def to8b(x: np.ndarray) -> np.ndarray:
    """Parity: to8b (/root/reference/utils/render_utils.py:20-21)."""
    return (255 * np.clip(x, 0, 1)).astype(np.uint8)


def save_frame(frame: np.ndarray, save_dir: str, fid: int) -> str:
    import imageio.v2 as imageio

    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, f"{fid:04d}.png")
    imageio.imwrite(path, to8b(np.asarray(frame)))
    return path


def encode_mp4(images_dir: str, out_path: str, fps: int = 25) -> bool:
    """H.264 mp4 from numbered PNGs; pads to even dims like the reference.

    Parity: /root/reference/main.py:333.  Returns False (and leaves the PNG
    sequence) if ffmpeg is unavailable.
    """
    cmd = [
        "ffmpeg",
        "-framerate",
        str(fps),
        "-i",
        os.path.join(images_dir, "%04d.png"),
        "-c:v",
        "libx264",
        "-vf",
        "pad=ceil(iw/2)*2:ceil(ih/2)*2",
        "-y",
        "-pix_fmt",
        "yuv420p",
        out_path,
    ]
    try:
        subprocess.run(
            cmd, check=True, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL
        )
        return True
    except (FileNotFoundError, subprocess.CalledProcessError):
        return False


def encode_avi(images_dir: str, out_path: str, fps: int = 25,
               quality: int = 90) -> bool:
    """MJPEG-in-AVI from numbered PNGs via the native encoder
    (csrc/gsmpm_video.cpp) -- no ffmpeg required.  Returns False if the
    native tier or the frames are unavailable.
    """
    from gsmpm_tpu.io import _native

    if not _native.avi_available():
        return False
    names = sorted(
        f for f in os.listdir(images_dir) if f.endswith(".png")
    ) if os.path.isdir(images_dir) else []
    if not names:
        return False
    import imageio.v2 as imageio

    first = imageio.imread(os.path.join(images_dir, names[0]))
    h, w = first.shape[:2]
    try:
        with _native.AviWriter(out_path, w, h, fps, quality) as vw:
            for name in names:
                img = imageio.imread(os.path.join(images_dir, name))
                vw.add_frame(np.asarray(img)[..., :3])
        return True
    except (RuntimeError, ValueError, OSError):
        return False


def encode_video(images_dir: str, out_base: str, fps: int = 25) -> Optional[str]:
    """Encode the PNG sequence to a video next to the reference's mp4 output
    (/root/reference/main.py:333): H.264 mp4 when ffmpeg exists, else the
    built-in native MJPEG AVI.  Returns the written path or None.
    """
    mp4 = out_base + ".mp4"
    if encode_mp4(images_dir, mp4, fps):
        return mp4
    avi = out_base + ".avi"
    if encode_avi(images_dir, avi, fps):
        return avi
    return None
