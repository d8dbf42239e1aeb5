"""Renderer: projection, occlusion, SH, background, differentiability."""

import jax
import jax.numpy as jnp
import numpy as np

from gsmpm_tpu.render.camera import make_camera
from gsmpm_tpu.render.renderer import RasterConfig, preprocess, render
from gsmpm_tpu.render.sh import C0, band_rotation, eval_sh, rotate_sh
from gsmpm_tpu.models.gaussians import quat_to_rotmat

CFG = RasterConfig(block=32, k_block=64, chunk=16, block_batch=4)


def _front_camera(w=64, h=64, dist=3.0):
    return make_camera(
        w, h, fovx=0.8, fovy=0.8, R_c2w=np.eye(3), position=np.array([0.0, 0.0, -dist])
    )


def _iso_cov6(var, n):
    return jnp.tile(jnp.asarray([var, 0, 0, var, 0, var], jnp.float32), (n, 1))


def test_empty_scene_is_background():
    cam = _front_camera()
    img = render(
        jnp.zeros((4, 3)) + 100.0,  # far behind everything / off-screen
        _iso_cov6(1e-4, 4),
        jnp.full((4,), 0.9),
        None,
        cam,
        bg=jnp.asarray([1.0, 0.3, 0.0]),
        cfg=CFG,
        colors_precomp=jnp.zeros((4, 3)),
    )
    np.testing.assert_allclose(np.asarray(img[0, 0]), [1.0, 0.3, 0.0], atol=1e-6)
    assert img.shape == (64, 64, 3)


def test_centered_gaussian_renders_centered():
    cam = _front_camera()
    img = render(
        jnp.asarray([[0.0, 0.0, 0.0]]),
        _iso_cov6(0.05, 1),
        jnp.asarray([0.999]),
        None,
        cam,
        bg=jnp.zeros(3),
        cfg=CFG,
        colors_precomp=jnp.asarray([[0.0, 1.0, 0.0]]),
    )
    img = np.asarray(img)
    cy, cx = np.unravel_index(img[:, :, 1].argmax(), img.shape[:2])
    assert abs(cy - 31.5) < 2 and abs(cx - 31.5) < 2
    assert img[:, :, 1].max() > 0.5
    assert img[0, 0, 1] < 0.05  # falls off at corner
    assert img[:, :, 0].max() < 1e-6  # green only


def test_occlusion_depth_order():
    # red gaussian in front of green one, same line of sight
    means = jnp.asarray([[0.0, 0.0, 0.5], [0.0, 0.0, -0.5]])  # camera at z=-3
    img = render(
        means,
        _iso_cov6(0.05, 2),
        jnp.asarray([0.999, 0.999]),
        None,
        _front_camera(),
        bg=jnp.zeros(3),
        cfg=CFG,
        colors_precomp=jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]),
    )
    img = np.asarray(img)
    center = img[31, 31]
    # the nearer (green, z=-0.5) splat dominates
    assert center[1] > 5 * center[0]


def test_alpha_compositing_against_analytic():
    # one isotropic splat dead-center: alpha(pixel) = opa * exp(-0.5 d^T conic d)
    cam = _front_camera()
    opa = 0.5
    img = render(
        jnp.asarray([[0.0, 0.0, 0.0]]),
        _iso_cov6(0.05, 1),
        jnp.asarray([opa]),
        None,
        cam,
        bg=jnp.asarray([1.0, 1.0, 1.0]),
        cfg=CFG,
        colors_precomp=jnp.asarray([[0.0, 0.0, 0.0]]),
    )
    pre = preprocess(
        jnp.asarray([[0.0, 0.0, 0.0]]),
        _iso_cov6(0.05, 1),
        jnp.asarray([opa]),
        None,
        cam,
        3,
        CFG,
        colors_precomp=jnp.asarray([[0.0, 0.0, 0.0]]),
    )
    px, py = np.asarray(pre.pix)[0]
    conic = np.asarray(pre.conic)[0]
    # check a pixel a few pixels off center
    x, y = int(px) + 3, int(py)
    d = np.array([x - px, y - py])
    alpha = opa * np.exp(
        -0.5 * (conic[0] * d[0] ** 2 + conic[2] * d[1] ** 2) - conic[1] * d[0] * d[1]
    )
    expect = (1 - alpha) * 1.0  # black splat over white bg
    np.testing.assert_allclose(np.asarray(img)[y, x, 0], expect, atol=1e-4)


def test_gradients_flow():
    cam = _front_camera()
    means = jnp.asarray([[0.1, 0.0, 0.0], [0.0, 0.1, 0.2]])
    cov6 = _iso_cov6(0.05, 2)
    opa = jnp.asarray([0.8, 0.8])
    colors = jnp.asarray([[1.0, 0.2, 0.1], [0.3, 0.9, 0.5]])

    def loss(means, cov6, opa, colors):
        img = render(
            means, cov6, opa, None, cam, jnp.zeros(3), cfg=CFG, colors_precomp=colors
        )
        return jnp.sum(img**2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(means, cov6, opa, colors)
    for g in grads:
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).max()) > 0.0


def test_eval_sh_degree0():
    sh = jnp.zeros((4, 16, 3)).at[:, 0, :].set(1.0)
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 1))
    col = eval_sh(sh, dirs, 0)
    np.testing.assert_allclose(np.asarray(col), C0, atol=1e-6)


def test_sh_rotation_matches_rotated_eval():
    rng = np.random.default_rng(0)
    n = 16
    sh = jnp.asarray(rng.normal(size=(n, 16, 3)).astype(np.float32))
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = quat_to_rotmat(jnp.asarray(q.astype(np.float32)))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))

    sh_rot = rotate_sh(sh, R, 3)
    lhs = eval_sh(sh_rot, d, 3)
    d_back = jnp.einsum("nji,nj->ni", R, d)  # R^T d
    rhs = eval_sh(sh, d_back, 3)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=2e-4)


def test_band_rotation_identity():
    R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (4, 3, 3))
    for l in (1, 2, 3):
        M = band_rotation(R, l)
        m = 2 * l + 1
        np.testing.assert_allclose(
            np.asarray(M), np.broadcast_to(np.eye(m, dtype=np.float32), (4, m, m)),
            atol=1e-5,
        )


def test_many_gaussians_beyond_k_block():
    # more gaussians than k_block: renderer keeps the closest in depth order
    rng = np.random.default_rng(1)
    n = 200
    means = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32))
    img = render(
        means,
        _iso_cov6(0.01, n),
        jnp.full((n,), 0.7),
        None,
        _front_camera(),
        bg=jnp.zeros(3),
        cfg=RasterConfig(block=32, k_block=32, chunk=8, block_batch=4),
        colors_precomp=jnp.ones((n, 3)),
    )
    assert bool(jnp.isfinite(img).all())
    assert float(img.max()) > 0.3
