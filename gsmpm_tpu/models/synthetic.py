"""Synthetic Gaussian scenes for tests and benchmarks.

The reference's trained checkpoints are git-lfs stubs in this snapshot
(/root/reference/models/*/point_cloud/.../point_cloud.ply), so tests and
benchmarks generate scenes with the same statistics (lego: ~240k gaussians,
800x800 cameras — see BASELINE.md).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gsmpm_tpu.models.gaussians import GaussianScene


def _scene_from_numpy(xyz, colors_dc, scale_log, seed_rng, sh_degree, opacity_logit=2.0):
    n = xyz.shape[0]
    k_rest = (sh_degree + 1) ** 2 - 1
    quat = seed_rng.normal(size=(n, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    return GaussianScene(
        xyz=jnp.asarray(xyz.astype(np.float32)),
        features_dc=jnp.asarray(colors_dc.astype(np.float32)[:, None, :]),
        features_rest=jnp.asarray(
            0.01 * seed_rng.normal(size=(n, k_rest, 3)).astype(np.float32)
        ),
        opacity=jnp.full((n, 1), opacity_logit, jnp.float32),
        scaling=jnp.asarray(scale_log.astype(np.float32)),
        rotation=jnp.asarray(quat),
        sh_degree=sh_degree,
    )


def synthetic_blob_scene(
    n: int = 4096, seed: int = 0, sh_degree: int = 3, radius: float = 0.5,
    center=(0.0, 0.0, 1.0),
) -> GaussianScene:
    """Gaussian-distributed blob of splats around `center`."""
    rng = np.random.default_rng(seed)
    xyz = rng.normal(size=(n, 3)) * radius / 2.0 + np.asarray(center)
    dc = rng.uniform(-1.0, 2.0, size=(n, 3))
    scale_log = np.log(rng.uniform(0.005, 0.03, size=(n, 3)) * radius)
    return _scene_from_numpy(xyz, dc, scale_log, rng, sh_degree)


def synthetic_box_scene(
    n: int = 4096,
    seed: int = 0,
    sh_degree: int = 3,
    lo=(-0.5, -0.5, 0.5),
    hi=(0.5, 0.5, 1.5),
) -> GaussianScene:
    """Uniform box of splats — lego-like solid block for MPM tests."""
    rng = np.random.default_rng(seed)
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    xyz = rng.uniform(size=(n, 3)) * (hi - lo) + lo
    dc = rng.uniform(-1.0, 2.0, size=(n, 3))
    extent = float((hi - lo).max())
    # particle spacing ~ (volume/n)^(1/3); splat scale a fraction of it
    spacing = (np.prod(hi - lo) / max(n, 1)) ** (1.0 / 3.0)
    scale_log = np.log(
        rng.uniform(0.5, 1.5, size=(n, 3)) * spacing + 1e-9
    )
    del extent
    return _scene_from_numpy(xyz, dc, scale_log, rng, sh_degree)
