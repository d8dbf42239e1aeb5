"""External-truth goldens for the renderer preprocess (VERDICT r3 item 8).

Everything on the expected side is hand-computed here in float64 numpy from
first principles — camera matrices, EWA projection, 2D covariance, conic,
radius, and the degree-2 real-SH color — with the standard constants written
out numerically, using NO repo helpers.  This pins the projection math the
way tests/test_golden.py pins the physics: the repo's own preprocess
(gsmpm_tpu/render/renderer.py:preprocess) must match to f32 tolerance.

Parity target: the CUDA rasterizer's preprocessCUDA (upstream
diff-gaussian-rasterization forward.cu, consumed at
/root/reference/main.py:118-156): view-space transform, J W Sigma W^T J^T
EWA covariance with the +0.3 low-pass, conic from the 2x2 inverse, radius
ceil(3 sqrt(lambda_max)), SH eval with the 3DGS sign convention.
"""

import math

import numpy as np
import jax.numpy as jnp

from gsmpm_tpu.render.camera import Camera
from gsmpm_tpu.render.renderer import RasterConfig, preprocess

# Standard real-SH constants, hard-coded by the book (Sloan, "Stupid SH
# Tricks"; same numerical values the CUDA computeColorFromSH uses)
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396]


import pytest

# quick-tier CI runs `-m "not slow"` (README); the full suite stays
# the release gate
pytestmark = pytest.mark.slow


def _hand_camera():
    """Known camera, matrices built by hand in float64."""
    W, H = 64, 48
    fovx, fovy = 0.7, 0.6
    znear, zfar = 0.01, 100.0
    # camera-to-world rotation: R_y(10 deg) @ R_x(-5 deg)
    a, b = math.radians(10.0), math.radians(-5.0)
    Ry = np.array([[math.cos(a), 0, math.sin(a)],
                   [0, 1, 0],
                   [-math.sin(a), 0, math.cos(a)]], np.float64)
    Rx = np.array([[1, 0, 0],
                   [0, math.cos(b), -math.sin(b)],
                   [0, math.sin(b), math.cos(b)]], np.float64)
    R = Ry @ Rx
    p = np.array([0.2, -0.3, -4.0], np.float64)
    # W2C = [[R^T, -R^T p], [0, 1]]
    view = np.eye(4, dtype=np.float64)
    view[:3, :3] = R.T
    view[:3, 3] = -R.T @ p
    # symmetric perspective: P00 = 1/tan(fovx/2), P11 = 1/tan(fovy/2),
    # P22 = zf/(zf-zn), P23 = -zf*zn/(zf-zn), P32 = 1
    P = np.zeros((4, 4), np.float64)
    P[0, 0] = 1.0 / math.tan(fovx / 2.0)
    P[1, 1] = 1.0 / math.tan(fovy / 2.0)
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -zfar * znear / (zfar - znear)
    P[3, 2] = 1.0
    cam = Camera(
        view=jnp.asarray(view.astype(np.float32)),
        full_proj=jnp.asarray((P @ view).astype(np.float32)),
        campos=jnp.asarray(p.astype(np.float32)),
        width=W, height=H, fovx=fovx, fovy=fovy,
    )
    return cam, view, P, p, W, H, fovx, fovy


def _hand_sh_color(sh, d):
    """Degree-2 real-SH RGB for one gaussian, 3DGS sign convention.

    sh: (9, 3) float64 coefficients; d: (3,) unit direction.
    color = max(C0 sh0 - C1 y sh1 + C1 z sh2 - C1 x sh3
                + C2_0 xy sh4 + C2_1 yz sh5 + C2_2 (2z^2-x^2-y^2) sh6
                + C2_3 xz sh7 + C2_4 (x^2-y^2) sh8 + 0.5, 0)
    """
    x, y, z = d
    c = (_C0 * sh[0]
         - _C1 * y * sh[1] + _C1 * z * sh[2] - _C1 * x * sh[3]
         + _C2[0] * x * y * sh[4] + _C2[1] * y * z * sh[5]
         + _C2[2] * (2 * z * z - x * x - y * y) * sh[6]
         + _C2[3] * x * z * sh[7] + _C2[4] * (x * x - y * y) * sh[8])
    return np.maximum(c + 0.5, 0.0)


def test_preprocess_matches_hand_computed_float64():
    cam, view, P, campos, W, H, fovx, fovy = _hand_camera()
    means = np.array([
        [0.3, 0.1, 0.5],
        [-0.6, 0.4, 1.2],
        [0.1, -0.5, -0.2],
    ], np.float64)
    sigmas = [
        np.diag([0.04, 0.01, 0.02]).astype(np.float64),
        np.array([[0.05, 0.015, -0.01],
                  [0.015, 0.03, 0.005],
                  [-0.01, 0.005, 0.02]], np.float64),
        np.array([[0.02, -0.008, 0.004],
                  [-0.008, 0.05, -0.012],
                  [0.004, -0.012, 0.03]], np.float64),
    ]
    rng = np.random.default_rng(11)
    shs = rng.normal(0.0, 0.3, size=(3, 9, 3)).astype(np.float64)
    opac = np.array([0.8, 0.5, 0.95], np.float64)

    # ---- hand-computed expectations (float64, no repo helpers) ----
    fx = W / (2.0 * math.tan(fovx / 2.0))
    fy = H / (2.0 * math.tan(fovy / 2.0))
    exp = []
    FP = P @ view
    for g in range(3):
        m = means[g]
        t = view[:3, :3] @ m + view[:3, 3]
        depth = t[2]
        ph = FP @ np.array([m[0], m[1], m[2], 1.0])
        inv_w = 1.0 / ph[3]
        pix_x = ((ph[0] * inv_w + 1.0) * W - 1.0) * 0.5
        pix_y = ((ph[1] * inv_w + 1.0) * H - 1.0) * 0.5
        # clamp inactive for these means (|t_x/t_z| < 1.3 tan(fov/2))
        assert abs(t[0] / t[2]) < 1.3 * math.tan(fovx / 2.0)
        assert abs(t[1] / t[2]) < 1.3 * math.tan(fovy / 2.0)
        J = np.array([
            [fx / depth, 0.0, -fx * t[0] / depth ** 2],
            [0.0, fy / depth, -fy * t[1] / depth ** 2],
        ], np.float64)
        T = J @ view[:3, :3]
        cov2d = T @ sigmas[g] @ T.T + 0.3 * np.eye(2)
        a, bb, c = cov2d[0, 0], cov2d[0, 1], cov2d[1, 1]
        det = a * c - bb * bb
        conic = np.array([c, -bb, a]) / det
        mid = 0.5 * (a + c)
        lam1 = mid + math.sqrt(max(0.1, mid * mid - det))
        radius = math.ceil(3.0 * math.sqrt(lam1))
        d = m - campos
        d = d / np.linalg.norm(d)
        color = _hand_sh_color(shs[g], d)
        exp.append((pix_x, pix_y, conic, depth, radius, color))

    # ---- the repo's preprocess ----
    cov6 = np.stack([
        np.array([S[0, 0], S[0, 1], S[0, 2], S[1, 1], S[1, 2], S[2, 2]])
        for S in sigmas
    ]).astype(np.float32)
    pre = preprocess(
        jnp.asarray(means, jnp.float32), jnp.asarray(cov6),
        jnp.asarray(opac, jnp.float32), jnp.asarray(shs, jnp.float32),
        cam, 2, RasterConfig(),
    )

    for g in range(3):
        pix_x, pix_y, conic, depth, radius, color = exp[g]
        assert bool(pre.valid[g])
        np.testing.assert_allclose(float(pre.depth[g]), depth, rtol=1e-5)
        np.testing.assert_allclose(float(pre.pix_x[g]), pix_x, rtol=0,
                                   atol=2e-3)
        np.testing.assert_allclose(float(pre.pix_y[g]), pix_y, rtol=0,
                                   atol=2e-3)
        got_conic = np.array([float(pre.conic_a[g]), float(pre.conic_b[g]),
                              float(pre.conic_c[g])])
        np.testing.assert_allclose(got_conic, conic, rtol=1e-4, atol=1e-6)
        assert float(pre.radius[g]) == radius, (float(pre.radius[g]), radius)
        got_col = np.array([float(pre.color_r[g]), float(pre.color_g[g]),
                            float(pre.color_b[g])])
        np.testing.assert_allclose(got_col, color, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(pre.opacity[g]), opac[g], rtol=1e-6)


def test_preprocess_culls_behind_camera():
    """A gaussian behind the near plane must be invalid (CUDA preprocess
    in_frustum cull)."""
    cam, view, P, campos, W, H, fovx, fovy = _hand_camera()
    # place the point BEHIND the camera along its viewing direction
    behind = campos - 2.0 * (view[:3, :3].T @ np.array([0.0, 0.0, 1.0]))
    means = np.stack([behind]).astype(np.float32)
    cov6 = np.array([[0.01, 0, 0, 0.01, 0, 0.01]], np.float32)
    pre = preprocess(
        jnp.asarray(means), jnp.asarray(cov6), jnp.ones((1,), jnp.float32),
        None, cam, 0, RasterConfig(),
        colors_precomp=jnp.zeros((1, 3), jnp.float32),
    )
    assert not bool(pre.valid[0])
