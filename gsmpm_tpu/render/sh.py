"""Real spherical harmonics: evaluation (deg 0-3) and SH rotation.

Parity: the SH->RGB evaluation inside the CUDA rasterizer the reference calls
(diff-gaussian-rasterization computeColorFromSH; consumed via shs=pc.get_features
at /root/reference/main.py:136), standard 3DGS constants.

SH rotation implements SURVEY quirk #6 end-to-end: the reference computes the
polar rotation R per frame (compute_R_from_F, /root/reference/mpm_solver/
utils.py:376-398) but never applies it to the SH coefficients; here
``rotate_sh`` really rotates bands 1..3.  The per-band rotation matrices are
built by the exact projection method (evaluate the band basis at fixed sample
directions, solve the linear system); the inverse basis matrix is a
compile-time constant so per gaussian this is one small matmul per band.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def _band_basis(d, l: int, xp):
    """Band-l real SH basis (matching eval_sh term-for-term, signs included).

    d: (..., 3); returns (..., 2l+1).  Works for numpy and jax arrays via xp.
    """
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    if l == 1:
        return xp.stack([-C1 * y, C1 * z, -C1 * x], axis=-1)
    if l == 2:
        xx, yy, zz = x * x, y * y, z * z
        return xp.stack(
            [
                C2[0] * x * y,
                C2[1] * y * z,
                C2[2] * (2.0 * zz - xx - yy),
                C2[3] * x * z,
                C2[4] * (xx - yy),
            ],
            axis=-1,
        )
    if l == 3:
        xx, yy, zz = x * x, y * y, z * z
        return xp.stack(
            [
                C3[0] * y * (3.0 * xx - yy),
                C3[1] * x * y * z,
                C3[2] * y * (4.0 * zz - xx - yy),
                C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
                C3[4] * x * (4.0 * zz - xx - yy),
                C3[5] * z * (xx - yy),
                C3[6] * x * (xx - 3.0 * yy),
            ],
            axis=-1,
        )
    raise ValueError(l)


def eval_sh(sh: jnp.ndarray, dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Evaluate real SH colors.

    sh: (N, K, 3) coefficients, K = (degree+1)^2; dirs: (N, 3) unit view dirs.
    Returns (N, 3) RGB (before the +0.5 shift).
    """
    result = C0 * sh[:, 0]
    offset = 1
    for l in range(1, degree + 1):
        basis = _band_basis(dirs, l, jnp)  # (N, 2l+1)
        m = 2 * l + 1
        result = result + jnp.einsum("nk,nkc->nc", basis, sh[:, offset : offset + m])
        offset += m
    return result


@lru_cache(maxsize=None)
def _sample_dirs_and_inv(l: int):
    """Fixed sample directions for band l and the inverse basis matrix."""
    m = 2 * l + 1
    rng = np.random.default_rng(12345 + l)
    dirs = rng.normal(size=(m, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    A = _band_basis(dirs, l, np)  # (m, m) rows=samples, cols=basis fns
    return dirs.astype(np.float32), np.linalg.inv(A).astype(np.float32)


def band_rotation(R: jnp.ndarray, l: int) -> jnp.ndarray:
    """(.., 3, 3) rotation -> (.., 2l+1, 2l+1) SH-coefficient rotation M.

    c' = M @ c reproduces color'(d) = color(R^T d).
    """
    dirs_np, A_inv_np = _sample_dirs_and_inv(l)
    dirs = jnp.asarray(dirs_np)
    A_inv = jnp.asarray(A_inv_np)
    # rotated sample dirs: R^T d_k
    d_rot = jnp.einsum("...ji,kj->...ki", R, dirs)
    B = _band_basis(d_rot, l, jnp)  # (..., m, m)
    return jnp.einsum("km,...ml->...kl", A_inv, B)


def rotate_sh(sh: jnp.ndarray, R: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Rotate SH coefficients (N, K, 3) by per-gaussian rotations R (N, 3, 3)."""
    out = [sh[:, 0:1]]
    offset = 1
    for l in range(1, degree + 1):
        m = 2 * l + 1
        M = band_rotation(R, l)
        out.append(jnp.einsum("nij,njc->nic", M, sh[:, offset : offset + m]))
        offset += m
    return jnp.concatenate(out, axis=1)
