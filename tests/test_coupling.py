"""world<->grid transforms and covariance packing."""

import jax.numpy as jnp
import numpy as np

from gsmpm_tpu.sim.coupling import (
    apply_cov_rotations,
    apply_inverse_cov_rotations,
    apply_inverse_rotations,
    apply_rotations,
    grid2world,
    mat_from_upper,
    rotation_matrices,
    upper_from_mat,
    world2grid,
)


def test_world2grid_roundtrip():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(500, 3)).astype(np.float32) * 3 + 1.5)
    covs = jnp.asarray(np.abs(rng.normal(size=(500, 6))).astype(np.float32))
    g, center, s = world2grid(pts, grid_extent=2.0)
    # scene fits in the grid cube
    assert float(g.min()) >= 0.0 and float(g.max()) <= 2.0
    covs_g = covs * (s * s)
    back_pts, back_covs = grid2world(g, covs_g, s, center, 2.0)
    np.testing.assert_allclose(np.asarray(back_pts), np.asarray(pts), atol=1e-4)
    np.testing.assert_allclose(np.asarray(back_covs), np.asarray(covs), rtol=1e-5)


def test_cov_packing_roundtrip():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(64, 3, 3)).astype(np.float32)
    sym = A @ A.transpose(0, 2, 1)
    packed = upper_from_mat(jnp.asarray(sym))
    unpacked = mat_from_upper(packed)
    np.testing.assert_allclose(np.asarray(unpacked), sym, rtol=1e-6)


def test_rotation_inverse():
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
    mats = rotation_matrices([30.0, -45.0], [0, 2])
    rotated = apply_rotations(pts, mats)
    back = apply_inverse_rotations(rotated, mats)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


def test_cov_rotation_inverse_and_consistency():
    rng = np.random.default_rng(3)
    A = rng.normal(size=(32, 3, 3)).astype(np.float32)
    sym = A @ A.transpose(0, 2, 1)
    packed = upper_from_mat(jnp.asarray(sym))
    mats = rotation_matrices([20.0], [1])
    rot = apply_cov_rotations(packed, mats)
    # matches R Sigma R^T done densely
    R = np.asarray(mats[0])
    expect = R @ sym @ R.T
    np.testing.assert_allclose(np.asarray(mat_from_upper(rot)), expect, atol=1e-4)
    back = apply_inverse_cov_rotations(rot, mats)
    np.testing.assert_allclose(np.asarray(back), np.asarray(packed), atol=1e-4)
