"""3D Gaussian scene container (pytree) with 3DGS activations and PLY I/O.

Parity target: the GaussianModel surface the reference consumes from the
gaussian-splatting submodule — get_xyz/get_opacity/get_features/get_covariance/
active_sh_degree, raw params _xyz/_features_dc/_features_rest/_opacity/_scaling,
load_ply/load_multiple_plys/save_ply, searchForMaxIteration
(/root/reference/main.py:37-48,135-137,320; /root/reference/extra.py:156,310-314).

TPU-native design: an immutable dataclass pytree of jnp arrays; activations are
pure functions; all consumers jit over it directly.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field, replace
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gsmpm_tpu.io.ply import read_gaussian_ply, write_gaussian_ply
from gsmpm_tpu.sim.coupling import upper_from_mat


@jax.tree_util.register_dataclass
@dataclass
class GaussianScene:
    """Raw (pre-activation) 3DGS parameters, one array per property."""

    xyz: jnp.ndarray  # (N, 3)
    features_dc: jnp.ndarray  # (N, 1, 3)
    features_rest: jnp.ndarray  # (N, K-1, 3)
    opacity: jnp.ndarray  # (N, 1) raw logits
    scaling: jnp.ndarray  # (N, 3) log-scales
    rotation: jnp.ndarray  # (N, 4) unnormalized quaternions (w, x, y, z)
    sh_degree: int = field(metadata=dict(static=True), default=3)

    @property
    def num_gaussians(self) -> int:
        return self.xyz.shape[0]

    @property
    def active_sh_degree(self) -> int:
        return self.sh_degree

    # --- activations (3DGS conventions) ---

    def get_opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity)

    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.scaling)

    def get_rotation(self) -> jnp.ndarray:
        q = self.rotation
        return q / jnp.linalg.norm(q, axis=-1, keepdims=True)

    def get_features(self) -> jnp.ndarray:
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def get_covariance(self, scaling_modifier: float = 1.0) -> jnp.ndarray:
        """Sigma = R S S^T R^T as 6-packed upper triangle (N, 6)."""
        S = self.get_scaling() * scaling_modifier
        R = quat_to_rotmat(self.get_rotation())
        L = R * S[:, None, :]  # R @ diag(S)
        cov = L @ jnp.swapaxes(L, -1, -2)
        return upper_from_mat(cov)

    def with_xyz_at(self, mask_idx: jnp.ndarray, new_xyz: jnp.ndarray) -> "GaussianScene":
        """Functional update of a subset of gaussian positions (for PCD export)."""
        return replace(self, xyz=self.xyz.at[mask_idx].set(new_xyz))

    def select(self, keep: jnp.ndarray) -> "GaussianScene":
        """Keep a boolean mask / index array of gaussians (functional)."""
        return replace(
            self,
            xyz=self.xyz[keep],
            features_dc=self.features_dc[keep],
            features_rest=self.features_rest[keep],
            opacity=self.opacity[keep],
            scaling=self.scaling[keep],
            rotation=self.rotation[keep],
        )

    def drop_low_opacity(self, threshold: float = 0.02) -> "GaussianScene":
        """Prune gaussians below an activated-opacity threshold.

        Parity: the fork-only GaussianModel.drop_low_opacity the reference
        calls (commented) at /root/reference/main.py:172.
        """
        return self.select(self.get_opacity().reshape(-1) >= threshold)

    def drop_empty_gaussians(self, mask: jnp.ndarray) -> "GaussianScene":
        """Prune gaussians outside a boolean keep-mask (e.g. the sim_area
        mask). Parity: GaussianModel.drop_empty_gaussians (commented) at
        /root/reference/main.py:173.
        """
        return self.select(jnp.asarray(mask, bool))

    # --- I/O ---

    @classmethod
    def from_ply(cls, path: str, sh_degree: int = 3) -> "GaussianScene":
        p = read_gaussian_ply(path, sh_degree)
        return cls(
            xyz=jnp.asarray(p["xyz"]),
            features_dc=jnp.asarray(p["features_dc"]),
            features_rest=jnp.asarray(p["features_rest"]),
            opacity=jnp.asarray(p["opacity"]),
            scaling=jnp.asarray(p["scaling"]),
            rotation=jnp.asarray(p["rotation"]),
            sh_degree=sh_degree,
        )

    @classmethod
    def from_plys(cls, paths: Sequence[str], sh_degree: int = 3) -> "GaussianScene":
        """Concatenate several checkpoints.

        Parity: the fork-only load_multiple_plys (/root/reference/main.py:47);
        unlike the reference we skip missing files instead of crashing
        (SURVEY quirk #4: single-PLY scenes must work).
        """
        parts = [cls.from_ply(p, sh_degree) for p in paths if os.path.exists(p)]
        if not parts:
            raise FileNotFoundError(f"No PLYs found among {list(paths)}")
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)

    def save_ply(self, path: str) -> None:
        write_gaussian_ply(
            path,
            dict(
                xyz=np.asarray(self.xyz),
                features_dc=np.asarray(self.features_dc),
                features_rest=np.asarray(self.features_rest),
                opacity=np.asarray(self.opacity),
                scaling=np.asarray(self.scaling),
                rotation=np.asarray(self.rotation),
            ),
        )


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Batched unit quaternion (w,x,y,z) -> rotation matrix (N,3,3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack(
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                axis=-1,
            ),
        ],
        axis=-2,
    )


def search_for_max_iteration(folder: str) -> int:
    """Parity: searchForMaxIteration (consumed at /root/reference/main.py:40)."""
    iters = []
    for name in os.listdir(folder):
        m = re.search(r"iteration_(\d+)", name)
        if m:
            iters.append(int(m.group(1)))
    if not iters:
        raise FileNotFoundError(f"No iteration_* checkpoints in {folder}")
    return max(iters)


def load_gaussians(
    model_path: str, loaded_iter: int = -1, sh_degree: int = 3
) -> GaussianScene:
    """Parity: load_model (/root/reference/main.py:32-48): resolves the
    checkpoint iteration and loads point_cloud.ply (+ optional point_cloud2.ply)."""
    if loaded_iter == -1:
        loaded_iter = search_for_max_iteration(os.path.join(model_path, "point_cloud"))
    base = os.path.join(model_path, "point_cloud", f"iteration_{loaded_iter}")
    return GaussianScene.from_plys(
        [os.path.join(base, "point_cloud.ply"), os.path.join(base, "point_cloud2.ply")],
        sh_degree,
    )
