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
