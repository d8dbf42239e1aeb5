"""Batched, branch-free 3x3 SVD for TPU.

Replaces the per-thread ti.svd the reference leans on throughout
mpm_solver/constitutive_models.py and mpm_solver/utils.py:376-398.  Instead of
a per-element McAdams-style routine with data-dependent branches, this is a
fully vectorized cyclic-Jacobi eigendecomposition of A^T A over the whole
particle batch — every op is an (N,3,3) elementwise/matmul op XLA maps onto
the VPU/MXU, and the fixed iteration count keeps it jit/scan/grad-compatible.

Convention: returns U, sigma (descending, >= 0), V with A ~= U @ diag(sigma) @ V^T.
U and V are orthogonal; if det(A) < 0, det(U)*det(V) = -1 (standard SVD), which
matches the determinant-fix the reference applies in compute_R_from_F
(/root/reference/mpm_solver/utils.py:387-395).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _jacobi_rotation(A: jnp.ndarray, V: jnp.ndarray, p: int, q: int):
    """One Jacobi rotation zeroing A[p,q], batched and branch-free."""
    apq = A[..., p, q]
    app = A[..., p, p]
    aqq = A[..., q, q]

    small = jnp.abs(apq) < _EPS
    tau = (aqq - app) / (2.0 * jnp.where(small, 1.0, apq))
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(small, 0.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c

    # J = I with [pp,pq;qp,qq] = [c, s; -s, c]
    J = jnp.zeros_like(A).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0).at[..., 2, 2].set(1.0)
    J = J.at[..., p, p].set(c).at[..., q, q].set(c)
    J = J.at[..., p, q].set(s).at[..., q, p].set(-s)

    A = jnp.swapaxes(J, -1, -2) @ A @ J
    V = V @ J
    return A, V


def _eigh3(S: jnp.ndarray, sweeps: int = 5) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eigendecomposition of a batched symmetric 3x3 via cyclic Jacobi."""
    V = jnp.zeros_like(S).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0).at[..., 2, 2].set(1.0)
    A = S
    for _ in range(sweeps):
        for p, q in ((0, 1), (0, 2), (1, 2)):
            A, V = _jacobi_rotation(A, V, p, q)
    eig = jnp.stack([A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]], axis=-1)
    return eig, V


def _sort_desc3(eig: jnp.ndarray, V: jnp.ndarray):
    """Sort 3 eigenpairs descending with a fixed compare-swap network."""

    def cswap(eig, V, i, j):
        swap = eig[..., i] < eig[..., j]
        ei, ej = eig[..., i], eig[..., j]
        eig = eig.at[..., i].set(jnp.where(swap, ej, ei))
        eig = eig.at[..., j].set(jnp.where(swap, ei, ej))
        vi, vj = V[..., :, i], V[..., :, j]
        V = V.at[..., :, i].set(jnp.where(swap[..., None], vj, vi))
        V = V.at[..., :, j].set(jnp.where(swap[..., None], vi, vj))
        return eig, V

    eig, V = cswap(eig, V, 0, 1)
    eig, V = cswap(eig, V, 0, 2)
    eig, V = cswap(eig, V, 1, 2)
    return eig, V


def _safe_normalize(v: jnp.ndarray, fallback: jnp.ndarray):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    ok = n > 1e-8
    return jnp.where(ok, v / jnp.where(ok, n, 1.0), fallback)


@partial(jax.jit, static_argnames=("sweeps",))
def svd3x3(A: jnp.ndarray, sweeps: int = 5):
    """Batched SVD of (..., 3, 3): returns (U, sigma, V), sigma descending >= 0."""
    S = jnp.swapaxes(A, -1, -2) @ A
    eig, V = _eigh3(S, sweeps)
    eig, V = _sort_desc3(eig, V)
    sigma = jnp.sqrt(jnp.maximum(eig, 0.0))

    B = A @ V  # columns ~ sigma_i * u_i
    e0 = jnp.zeros_like(B[..., :, 0]).at[..., 0].set(1.0)
    u0 = _safe_normalize(B[..., :, 0], e0)
    b1 = B[..., :, 1]
    b1 = b1 - jnp.sum(u0 * b1, axis=-1, keepdims=True) * u0
    # fallback for u1: any unit vector orthogonal to u0
    alt = jnp.cross(u0, e0)
    alt2 = jnp.cross(u0, jnp.zeros_like(u0).at[..., 1].set(1.0))
    use_alt = jnp.linalg.norm(alt, axis=-1, keepdims=True) > 0.1
    fallback1 = _safe_normalize(jnp.where(use_alt, alt, alt2), e0)
    u1 = _safe_normalize(b1, fallback1)
    b2 = B[..., :, 2]
    b2 = (
        b2
        - jnp.sum(u0 * b2, axis=-1, keepdims=True) * u0
        - jnp.sum(u1 * b2, axis=-1, keepdims=True) * u1
    )
    u2 = _safe_normalize(b2, jnp.cross(u0, u1))
    U = jnp.stack([u0, u1, u2], axis=-1)
    return U, sigma, V


def polar_rotation(F: jnp.ndarray) -> jnp.ndarray:
    """Rotation factor R of the polar decomposition F = R S (det R = +1).

    Parity: compute_R_from_F (/root/reference/mpm_solver/utils.py:376-398) —
    flips the third columns of U and V when their determinants are negative
    before forming R = U V^T.  (The reference stores R^T in particle_R; callers
    here transpose as needed.)
    """
    U, _, V = svd3x3(F)
    detU = jnp.linalg.det(U)
    detV = jnp.linalg.det(V)
    U = U.at[..., :, 2].multiply(jnp.where(detU < 0, -1.0, 1.0)[..., None])
    V = V.at[..., :, 2].multiply(jnp.where(detV < 0, -1.0, 1.0)[..., None])
    return U @ jnp.swapaxes(V, -1, -2)
