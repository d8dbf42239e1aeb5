"""Camera model and projection math.

Parity targets: the TinyCam container (/root/reference/utils/render_utils.py:4-17)
and the graphics helpers the reference consumes from the gaussian-splatting
submodule — focal2fov, getProjectionMatrix, getWorld2View2
(/root/reference/main.py:22,64,74,100-101).

Convention difference (TPU-native, on purpose): we use column-vector matrices
(x_clip = full_proj @ x_world_h).  The reference stores glm-style transposed
matrices for the CUDA rasterizer (view_mat = W2C^T, /root/reference/main.py:72);
loaders here produce the plain (untransposed) W2C.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def focal2fov(focal: float, pixels: int) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2.0 * math.tan(fov * 0.5))


def projection_matrix(
    znear: float, zfar: float, fovx: float, fovy: float
) -> np.ndarray:
    """OpenGL-style perspective with z mapped to [0, zfar/(zfar-znear)] range.

    Matches the matrix the reference builds via getProjectionMatrix
    (/root/reference/main.py:74) in column-vector convention.
    """
    tan_half_y = math.tan(fovy / 2.0)
    tan_half_x = math.tan(fovx / 2.0)
    top = tan_half_y * znear
    bottom = -top
    right = tan_half_x * znear
    left = -right
    P = np.zeros((4, 4), dtype=np.float32)
    z_sign = 1.0
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = z_sign
    P[2, 2] = z_sign * zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def world_to_view(R_c2w: np.ndarray, position: np.ndarray) -> np.ndarray:
    """W2C 4x4 from a camera-to-world rotation and camera position.

    Net-equivalent of the reference's C2W-invert dance
    (/root/reference/main.py:66-72, 92-101).
    """
    c2w = np.eye(4, dtype=np.float64)
    c2w[:3, :3] = R_c2w
    c2w[:3, 3] = position
    return np.linalg.inv(c2w).astype(np.float32)


@jax.tree_util.register_dataclass
@dataclass
class Camera:
    """Pytree camera. width/height/fov are static; matrices are arrays.

    Parity: TinyCam (/root/reference/utils/render_utils.py:4-17).
    """

    view: jnp.ndarray  # (4,4) W2C, column-vector convention
    full_proj: jnp.ndarray  # (4,4) proj @ view
    campos: jnp.ndarray  # (3,)
    width: int = field(metadata=dict(static=True), default=800)
    height: int = field(metadata=dict(static=True), default=800)
    fovx: float = field(metadata=dict(static=True), default=0.8)
    fovy: float = field(metadata=dict(static=True), default=0.8)

    @property
    def tanfovx(self) -> float:
        return math.tan(self.fovx * 0.5)

    @property
    def tanfovy(self) -> float:
        return math.tan(self.fovy * 0.5)

    @property
    def focal_x(self) -> float:
        return self.width / (2.0 * self.tanfovx)

    @property
    def focal_y(self) -> float:
        return self.height / (2.0 * self.tanfovy)


def make_camera(
    width: int,
    height: int,
    fovx: float,
    fovy: float,
    R_c2w: np.ndarray,
    position: np.ndarray,
    znear: float = 0.01,
    zfar: float = 100.0,
) -> Camera:
    view = world_to_view(np.asarray(R_c2w, np.float64), np.asarray(position, np.float64))
    proj = projection_matrix(znear, zfar, fovx, fovy)
    return Camera(
        view=jnp.asarray(view),
        full_proj=jnp.asarray((proj @ view).astype(np.float32)),
        campos=jnp.asarray(np.asarray(position, np.float32)),
        width=int(width),
        height=int(height),
        fovx=float(fovx),
        fovy=float(fovy),
    )


def orbit_camera(
    template: Camera,
    azimuth: float,
    elevation: float,
    radius: float,
    center: np.ndarray,
    observant_coordinates: np.ndarray,
) -> Camera:
    """Re-aim a camera onto an orbit point around the scene center.

    Parity: modify_cam (/root/reference/main.py:84-106) with the same
    get_camera_position_and_rotation math.
    """
    from gsmpm_tpu.sim.coupling import get_camera_position_and_rotation

    position, R = get_camera_position_and_rotation(
        azimuth, elevation, radius, center, observant_coordinates
    )
    return make_camera(
        template.width, template.height, template.fovx, template.fovy, R, position
    )
