"""World <-> MPM-grid coupling transforms and covariance packing.

Parity target: /root/reference/utils/transform_utils.py (torch) — re-done as
pure jax.numpy functions over batched arrays.  The 6-packed symmetric
covariance layout matches the reference ([xx, xy, xz, yy, yz, zz],
/root/reference/utils/transform_utils.py:64-85).
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# world <-> grid normalization
# ---------------------------------------------------------------------------

def world2grid(means3d: jnp.ndarray, grid_extent: float, pad: float = 0.0):
    """Fit the scene AABB into the grid cube [0, grid_extent]^3 (centered).

    Parity: /root/reference/utils/transform_utils.py:8-15 (pad=0) and the
    system-ID variant /root/reference/extra.py:319-325 (pad=0.3).

    Returns (transformed_means3d, pos_center, scaling_modifier).
    """
    pos_min = means3d.min(axis=0) - pad
    pos_max = means3d.max(axis=0) + pad
    pos_center = (pos_min + pos_max) / 2.0
    scaling_modifier = grid_extent / 2.0 / (pos_max - pos_min).max()
    transformed = (means3d - pos_center) * scaling_modifier + grid_extent / 2.0
    return transformed, pos_center, scaling_modifier


def grid2world(
    means3d: jnp.ndarray,
    covs6: jnp.ndarray,
    scaling_modifier,
    pos_center,
    grid_extent: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of world2grid for positions; covariances scale by 1/s^2.

    Parity: /root/reference/utils/transform_utils.py:18-21.
    """
    out_means = (means3d - grid_extent / 2.0) / scaling_modifier + pos_center
    out_covs = covs6 / (scaling_modifier * scaling_modifier)
    return out_means, out_covs.reshape(-1, 6)


# ---------------------------------------------------------------------------
# 6-packed symmetric covariance <-> full 3x3
# ---------------------------------------------------------------------------

def mat_from_upper(upper6: jnp.ndarray) -> jnp.ndarray:
    """(N,6) [xx,xy,xz,yy,yz,zz] -> (N,3,3) symmetric.

    Parity: get_mat_from_upper (/root/reference/utils/transform_utils.py:64-75).
    """
    upper6 = upper6.reshape(-1, 6)
    xx, xy, xz, yy, yz, zz = [upper6[:, i] for i in range(6)]
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], axis=-1),
            jnp.stack([xy, yy, yz], axis=-1),
            jnp.stack([xz, yz, zz], axis=-1),
        ],
        axis=-2,
    )


def upper_from_mat(mat: jnp.ndarray) -> jnp.ndarray:
    """(N,3,3) -> (N,6) upper-triangle packing.

    Parity: get_upper_from_mat (/root/reference/utils/transform_utils.py:77-85).
    """
    m = mat.reshape(-1, 3, 3)
    return jnp.stack(
        [m[:, 0, 0], m[:, 0, 1], m[:, 0, 2], m[:, 1, 1], m[:, 1, 2], m[:, 2, 2]],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# rotation pre-transforms
# ---------------------------------------------------------------------------

def rotation_matrix(degree: float, axis: int) -> jnp.ndarray:
    """Axis-aligned rotation matrix (degrees).

    Parity: generate_rotation_matrix (/root/reference/utils/transform_utils.py:23-40).
    """
    theta = degree / 180.0 * math.pi
    c, s = math.cos(theta), math.sin(theta)
    if axis == 0:
        m = [[1, 0, 0], [0, c, -s], [0, s, c]]
    elif axis == 1:
        m = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
    elif axis == 2:
        m = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    else:
        raise ValueError("Invalid axis selection")
    return jnp.asarray(m, dtype=jnp.float32)


def rotation_matrices(
    degrees: Sequence[float], axes: Sequence[int]
) -> List[jnp.ndarray]:
    assert len(degrees) == len(axes)
    return [rotation_matrix(d, a) for d, a in zip(degrees, axes)]


def apply_rotations(points: jnp.ndarray, mats: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """points (N,3) @ R^T for each R in order.

    Parity: apply_rotations (/root/reference/utils/transform_utils.py:87-90).
    """
    for r in mats:
        points = points @ r.T
    return points


def apply_inverse_rotations(
    points: jnp.ndarray, mats: Sequence[jnp.ndarray]
) -> jnp.ndarray:
    """Parity: apply_inverse_rotations (/root/reference/utils/transform_utils.py:109-113)."""
    for r in reversed(mats):
        points = points @ r
    return points


def apply_cov_rotations(
    upper6: jnp.ndarray, mats: Sequence[jnp.ndarray]
) -> jnp.ndarray:
    """R Sigma R^T on 6-packed covariances.

    Parity: apply_cov_rotations (/root/reference/utils/transform_utils.py:93-97).
    """
    cov = mat_from_upper(upper6)
    for r in mats:
        cov = r @ cov @ r.T
    return upper_from_mat(cov)


def apply_inverse_cov_rotations(
    upper6: jnp.ndarray, mats: Sequence[jnp.ndarray]
) -> jnp.ndarray:
    """Parity: apply_inverse_cov_rotations (/root/reference/utils/transform_utils.py:116-121)."""
    cov = mat_from_upper(upper6)
    for r in reversed(mats):
        cov = r.T @ cov @ r
    return upper_from_mat(cov)


def undo_all_transforms(
    points: jnp.ndarray,
    mats: Sequence[jnp.ndarray],
    scaling_modifier,
    pos_center,
    grid_extent: float = 2.0,
) -> jnp.ndarray:
    """Map grid-space points back to the original world space.

    Parity: undo_all_transforms (/root/reference/utils/transform_utils.py:127-133);
    the reference hard-codes the grid-center shift as (1,1,1) (grid_extent 2).
    """
    shifted = points - grid_extent / 2.0
    unscaled = pos_center + shifted / scaling_modifier
    return apply_inverse_rotations(unscaled, mats)


# ---------------------------------------------------------------------------
# camera orbit math (numpy — host-side, once per scene)
# ---------------------------------------------------------------------------

def generate_local_coord(vertical: np.ndarray):
    """Parity: generate_local_coord (/root/reference/utils/transform_utils.py:136-148)."""
    vertical = vertical / np.linalg.norm(vertical)
    h1 = np.array([1.0, 1.0, 1.0])
    if np.abs(np.dot(h1, vertical)) < 0.01:
        h1 = np.array([0.72, 0.37, -0.67])
    h1 = h1 - np.dot(h1, vertical) * vertical
    h1 = h1 / np.linalg.norm(h1)
    h2 = np.cross(h1, vertical)
    return vertical, h1, h2


def get_center_view_worldspace_and_observant_coordinate(
    mpm_space_center: np.ndarray,
    mpm_space_up_axis: np.ndarray,
    mats: Sequence[jnp.ndarray],
    scaling_modifier,
    pos_center,
    grid_extent: float = 2.0,
):
    """Parity: /root/reference/utils/transform_utils.py:150-173."""
    center = np.asarray(
        undo_all_transforms(
            jnp.asarray(mpm_space_center, dtype=jnp.float32).reshape(1, 3),
            mats,
            scaling_modifier,
            pos_center,
            grid_extent,
        )
    )
    up_pt = np.asarray(
        undo_all_transforms(
            jnp.asarray(
                mpm_space_up_axis + mpm_space_center, dtype=jnp.float32
            ).reshape(1, 3),
            mats,
            scaling_modifier,
            pos_center,
            grid_extent,
        )
    )
    world_up = (up_pt - center)[0]
    vertical, h1, h2 = generate_local_coord(world_up)
    observant_coordinates = np.column_stack((h1, h2, vertical))
    return center[0], observant_coordinates


def get_point_on_sphere(azimuth, elevation, radius, center, observant_coordinates):
    """Parity: get_point_on_sphere (/root/reference/utils/transform_utils.py:176-188)."""
    az, el = np.deg2rad(azimuth), np.deg2rad(elevation)
    canonical = (
        np.array([np.cos(az) * np.cos(el), np.sin(az) * np.cos(el), np.sin(el)])
        * radius
    )
    return center + observant_coordinates @ canonical


def generate_camera_rotation_matrix(camera_to_object, object_vertical_downward):
    """Parity: /root/reference/utils/transform_utils.py:204-216."""
    z = camera_to_object / np.linalg.norm(camera_to_object)
    y = object_vertical_downward - np.dot(object_vertical_downward, z) * z
    y = y / np.linalg.norm(y)
    x = np.cross(y, z)
    return np.column_stack((x, y, z))


def get_camera_position_and_rotation(
    azimuth, elevation, radius, view_center, observant_coordinates
):
    """Parity: /root/reference/utils/transform_utils.py:191-202."""
    position = get_point_on_sphere(
        azimuth, elevation, radius, view_center, observant_coordinates
    )
    R = generate_camera_rotation_matrix(
        view_center - position, -observant_coordinates[:, 2]
    )
    return position, R
