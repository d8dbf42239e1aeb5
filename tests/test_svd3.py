"""Batched 3x3 SVD: reconstruction, ordering, degenerate cases, polar rotation."""

import jax
import jax.numpy as jnp
import numpy as np

from gsmpm_tpu.ops.svd3 import polar_rotation, svd3x3


def _random_batch(n=256, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(n, 3, 3)).astype(np.float32) * scale)


def test_reconstruction():
    A = _random_batch()
    U, s, V = svd3x3(A)
    rec = U @ (s[..., :, None] * jnp.swapaxes(V, -1, -2))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(A), atol=5e-4)


def test_orthogonality_and_order():
    A = _random_batch(seed=1)
    U, s, V = svd3x3(A)
    eye = np.eye(3)
    np.testing.assert_allclose(
        np.asarray(U @ jnp.swapaxes(U, -1, -2)), np.broadcast_to(eye, U.shape), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(V @ jnp.swapaxes(V, -1, -2)), np.broadcast_to(eye, V.shape), atol=1e-5
    )
    s = np.asarray(s)
    assert (s >= -1e-6).all()
    assert (s[:, 0] >= s[:, 1] - 1e-6).all() and (s[:, 1] >= s[:, 2] - 1e-6).all()


def test_singular_values_match_numpy():
    A = _random_batch(seed=2)
    _, s, _ = svd3x3(A)
    s_np = np.linalg.svd(np.asarray(A), compute_uv=False)
    np.testing.assert_allclose(np.asarray(s), s_np, atol=1e-3)


def test_near_identity_deformations():
    # the MPM regime: F = I + small perturbation
    rng = np.random.default_rng(3)
    A = jnp.asarray(
        np.eye(3, dtype=np.float32) + 0.05 * rng.normal(size=(512, 3, 3)).astype(np.float32)
    )
    U, s, V = svd3x3(A)
    rec = U @ (s[..., :, None] * jnp.swapaxes(V, -1, -2))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(A), atol=1e-5)


def test_rank_deficient():
    # rank-1 and rank-2 matrices still reconstruct
    rng = np.random.default_rng(4)
    u = rng.normal(size=(64, 3, 1)).astype(np.float32)
    v = rng.normal(size=(64, 1, 3)).astype(np.float32)
    A = jnp.asarray(u @ v)
    U, s, V = svd3x3(A)
    rec = U @ (s[..., :, None] * jnp.swapaxes(V, -1, -2))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(A), atol=2e-3)
    # f32 A^T A eigenvalue route: residual sv accuracy ~ sqrt(eps)*sigma_1
    assert np.asarray(s)[:, 1:].max() < 5e-3


def test_polar_rotation_is_rotation():
    A = _random_batch(seed=5)
    R = polar_rotation(A)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-4)
    eye = np.eye(3)
    np.testing.assert_allclose(
        np.asarray(R @ jnp.swapaxes(R, -1, -2)), np.broadcast_to(eye, R.shape), atol=1e-5
    )


def test_polar_rotation_recovers_pure_rotation():
    # F = R_true (pure rotation) -> polar rotation == R_true
    rng = np.random.default_rng(6)
    q = rng.normal(size=(32, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    from gsmpm_tpu.models.gaussians import quat_to_rotmat

    R_true = quat_to_rotmat(jnp.asarray(q.astype(np.float32)))
    R = polar_rotation(R_true)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_true), atol=1e-4)


def test_svd_differentiable():
    A = _random_batch(n=8, seed=7)

    def loss(a):
        U, s, V = svd3x3(a)
        return jnp.sum(s)

    g = jax.grad(loss)(A)
    assert bool(jnp.isfinite(g).all())
