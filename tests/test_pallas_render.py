"""Pallas tile-blend renderer vs the XLA reference path.

Interpret mode on CPU; the compiled comparison runs on real TPU via
scripts/validate_pallas_render.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gsmpm_tpu.render.camera import make_camera
from gsmpm_tpu.render.renderer import RasterConfig, render


def _scene(n=500, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-1.0, 1.0, size=(n, 3)).astype(np.float32)
    means[:, 2] += 4.0
    # random SPD covariances (world scale ~0.05)
    A = 0.05 * rng.normal(size=(n, 3, 3)).astype(np.float32)
    cov = A @ A.transpose(0, 2, 1) + 1e-4 * np.eye(3, dtype=np.float32)
    cov6 = np.stack(
        [cov[:, 0, 0], cov[:, 0, 1], cov[:, 0, 2],
         cov[:, 1, 1], cov[:, 1, 2], cov[:, 2, 2]], axis=-1,
    )
    opacity = rng.uniform(0.2, 0.95, size=(n,)).astype(np.float32)
    colors = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    camera = make_camera(128, 128, 0.9, 0.9, np.eye(3), np.zeros(3))
    return (jnp.asarray(means), jnp.asarray(cov6), jnp.asarray(opacity),
            jnp.asarray(colors), camera)


def _cfg(impl):
    return RasterConfig(block=64, k_block=256, k_row=512, chunk=32,
                        impl=impl)


def test_pallas_blend_matches_xla():
    means, cov6, opacity, colors, camera = _scene()
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    img_x = render(means, cov6, opacity, None, camera, bg,
                   cfg=_cfg("xla"), colors_precomp=colors)
    img_p = render(means, cov6, opacity, None, camera, bg,
                   cfg=_cfg("pallas"), colors_precomp=colors)
    a, b = np.asarray(img_p), np.asarray(img_x)
    # factored rank-6 power + scan reassociation can flip alpha_min/t_min
    # threshold tests on isolated pixels -> tiny local diffs are expected
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-3)
    assert np.mean(np.abs(a - b)) < 5e-6


def test_pallas_render_grads_match_xla():
    """The custom VJP backs the Pallas forward with the XLA-path vjp; with
    a fixed cotangent the two impls must produce identical input grads."""
    means, cov6, opacity, colors, camera = _scene(n=200, seed=3)
    bg = jnp.zeros(3, jnp.float32)
    rng = np.random.default_rng(11)
    ct = jnp.asarray(
        rng.normal(size=(camera.height, camera.width, 3)).astype(np.float32)
    )

    def f(impl):
        def g(m, c6, op):
            return render(m, c6, op, None, camera, bg, cfg=_cfg(impl),
                          colors_precomp=colors)
        return g

    _, vjp_x = jax.vjp(f("xla"), means, cov6, opacity)
    _, vjp_p = jax.vjp(f("pallas"), means, cov6, opacity)
    for a, b in zip(vjp_p(ct), vjp_x(ct)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
