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
    """The Pallas path backward is the reverse-walk kernel
    (pallas_blend._blend_bwd_kernel); its input grads must agree with the
    XLA path's autodiff to f32 reassociation tolerance (the kernel
    reconstructs transmittance by division and factors the quadratic, so
    bitwise equality is not expected)."""
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
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-12
        assert np.abs(a - b).max() / scale < 5e-3, (
            np.abs(a - b).max(), scale
        )


def test_pallas_backward_kernel_matches_finite_differences():
    """Direct correctness of the reverse-walk backward kernel: analytic
    d(loss)/d(opacity) vs central differences through the pallas path."""
    means, cov6, opacity, colors, camera = _scene(n=96, seed=9)
    bg = jnp.asarray([0.2, 0.4, 0.1], jnp.float32)
    rng = np.random.default_rng(5)
    w = jnp.asarray(
        rng.normal(size=(camera.height, camera.width, 3)).astype(np.float32)
    )
    cfg = _cfg("pallas")

    def loss(opv):
        img = render(means, cov6, opv, None, camera, bg, cfg=cfg,
                     colors_precomp=colors)
        return jnp.sum(img * w)

    g = jax.grad(loss)(opacity)
    op_np = np.asarray(opacity)
    h = 1e-3
    idx = rng.choice(op_np.shape[0], 10, replace=False)
    rels = []
    for i in idx:
        opp = op_np.copy(); opp[i] += h
        opm = op_np.copy(); opm[i] -= h
        fd = (float(loss(jnp.asarray(opp))) - float(loss(jnp.asarray(opm)))) / (2 * h)
        an = float(g[i])
        rels.append(abs(an - fd) / max(abs(fd), 1e-2))
    rels = sorted(rels)
    # the loss is only piecewise smooth (alpha_min / t_min / 0.99-clip
    # gates), so individual probes can straddle a kink; require the bulk
    # to agree tightly
    assert rels[len(rels) // 2] < 2e-2, rels  # median within 2%
    assert sum(r < 5e-2 for r in rels) >= 8, rels  # >= 8/10 within 5%


def test_blend_pad_columns_contribute_zero():
    """K % C != 0 regression (ADVICE round 1): the count-bounded chunk walk
    can straddle K, and pad columns without log_opa = -inf would blend as
    opaque splats at the block origin.  chunk=48 with K=64 pads to 96; a
    count of 60 lands the last live chunk across the K boundary."""
    from gsmpm_tpu.render.pallas_blend import blend_blocks_pallas
    from gsmpm_tpu.render.renderer import RasterConfig

    rng = np.random.default_rng(0)
    B, K = 32, 64
    nb = 1
    cand = np.zeros((10, nb, K), np.float32)
    cand[0] = rng.uniform(4.0, B - 4.0, (nb, K))   # pix_x in block
    cand[1] = rng.uniform(4.0, B - 4.0, (nb, K))   # pix_y
    cand[2] = 0.5   # conic_a
    cand[3] = 0.0
    cand[4] = 0.5
    cand[5] = np.log(0.6)  # log opacity
    cand[6:9] = rng.uniform(0.2, 1.0, (3, nb, K))
    cand[9] = 6.0  # radius (passes the in-rect test)
    counts = jnp.asarray([60], jnp.int32)
    origins = jnp.zeros((nb, 2), jnp.int32)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)

    out48 = blend_blocks_pallas(
        jnp.asarray(cand), counts, origins, bg,
        RasterConfig(block=B, chunk=48),
    )
    out32 = blend_blocks_pallas(
        jnp.asarray(cand), counts, origins, bg,
        RasterConfig(block=B, chunk=32),
    )
    a, b = np.asarray(out48), np.asarray(out32)
    assert np.isfinite(a).all()
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_packed_stream_matches_padded():
    """The experimental packed-stream blend (RasterConfig.packed=True) is
    bit-identical to the padded (nblocks, K) layout, forward and backward
    (same selection, same blend math — only the storage layout differs)."""
    import jax

    from gsmpm_tpu.models.synthetic import synthetic_box_scene
    from gsmpm_tpu.render.camera import make_camera
    from gsmpm_tpu.render.renderer import RasterConfig, render_with_aux

    scene = synthetic_box_scene(n=256, lo=(-0.4, -0.4, 0.2),
                                hi=(0.4, 0.4, 1.0))
    cam = make_camera(64, 64, 0.9, 0.9, np.eye(3),
                      np.array([0.0, 0.0, -2.5]))
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    cov6 = scene.get_covariance()
    opac = scene.get_opacity().reshape(-1)
    feats = scene.get_features()

    def cfgp(packed):
        return RasterConfig(block=16, k_tile=128, k_coarse=64, k_global=64,
                            chunk=32, impl="pallas", packed=packed)

    img_p, d_p = render_with_aux(scene.xyz, cov6, opac, feats, cam, bg,
                                 scene.sh_degree, cfgp(True))
    img_u, d_u = render_with_aux(scene.xyz, cov6, opac, feats, cam, bg,
                                 scene.sh_degree, cfgp(False))
    np.testing.assert_array_equal(np.asarray(img_p), np.asarray(img_u))
    assert int(d_p) == int(d_u)

    def loss(xyz, packed):
        img, _ = render_with_aux(xyz, cov6, opac, feats, cam, bg,
                                 scene.sh_degree, cfgp(packed))
        return jnp.sum(img ** 2)

    g_p = jax.grad(loss)(scene.xyz, True)
    g_u = jax.grad(loss)(scene.xyz, False)
    np.testing.assert_array_equal(np.asarray(g_p), np.asarray(g_u))


def test_streamed_blend_matches_xla_forward_and_grads(monkeypatch):
    """Large-K streamed kernels (one (16, C) chunk per grid step; VERDICT r3
    item 1 follow-through: a drop-free dense fitting scene needs K ~ 10^5,
    past the resident-row kernels' VMEM) must match the XLA path exactly
    like the resident-row kernels do.  _STREAM_K is patched down so the
    streamed variants engage at this test's tiny K."""
    from gsmpm_tpu.render import pallas_blend

    monkeypatch.setattr(pallas_blend, "_STREAM_K", 64)
    means, cov6, opacity, colors, camera = _scene(n=300, seed=7)
    bg = jnp.asarray([0.15, 0.1, 0.2], jnp.float32)
    img_x = render(means, cov6, opacity, None, camera, bg,
                   cfg=_cfg("xla"), colors_precomp=colors)
    img_p = render(means, cov6, opacity, None, camera, bg,
                   cfg=_cfg("pallas"), colors_precomp=colors)
    a, b = np.asarray(img_p), np.asarray(img_x)
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-3)
    assert np.mean(np.abs(a - b)) < 5e-6

    g = jnp.asarray(
        np.random.default_rng(5).uniform(0.2, 1.0, (128, 128, 3))
        .astype(np.float32)
    )

    def loss(impl, cov6_, opac_):
        img = render(means, cov6_, opac_, None, camera, bg,
                     cfg=_cfg(impl), colors_precomp=colors)
        return jnp.sum(img * g)

    # streamed backward == resident backward EXACTLY (same math, same
    # chunk size, different fetch schedule); vs XLA both carry the known
    # threshold-pixel reassociation deltas, so the tight check is
    # pallas-vs-pallas
    gp_cov, gp_op = jax.grad(lambda c, o: loss("pallas", c, o),
                             argnums=(0, 1))(cov6, opacity)
    monkeypatch.setattr(pallas_blend, "_STREAM_K", 10 ** 9)  # resident
    gr_cov, gr_op = jax.grad(lambda c, o: loss("pallas", c, o),
                             argnums=(0, 1))(cov6, opacity)
    np.testing.assert_allclose(np.asarray(gp_cov), np.asarray(gr_cov),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gp_op), np.asarray(gr_op),
                               rtol=1e-6, atol=1e-7)
    gx_cov, gx_op = jax.grad(lambda c, o: loss("xla", c, o),
                             argnums=(0, 1))(cov6, opacity)
    np.testing.assert_allclose(np.asarray(gp_cov), np.asarray(gx_cov),
                               rtol=7e-2, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gp_op), np.asarray(gx_op),
                               rtol=7e-2, atol=2e-4)


def test_two_tier_dense_blocks_match_xla_and_are_drop_free():
    """cfg.k_dense re-blends the densest fine tiles at a larger capacity:
    with k_dense sized to the measured per-tile maximum the render is
    drop-free and matches the XLA reference image, while tier 1 keeps a
    deliberately SMALL k_tile (which alone would truncate)."""
    from gsmpm_tpu.render.renderer import (
        render_with_aux, required_raster_caps,
    )

    means, cov6, opacity, colors, camera = _scene(n=600, seed=9)
    bg = jnp.asarray([0.2, 0.1, 0.3], jnp.float32)
    base = RasterConfig(block=64, chunk=32, impl="pallas",
                        k_tile=128, k_coarse=128, k_global=128)
    need = required_raster_caps(means, cov6, opacity, camera, base)
    assert need["n_fine_over"] > 0, "test scene must overflow k_tile=128"

    # starved single-tier: drops
    _, nd0 = render_with_aux(means, cov6, opacity, None, camera, bg, 0,
                             base, colors_precomp=colors)
    assert int(nd0) > 0

    kd = -(-need["k_tile"] // 128) * 128
    two = base._replace(k_dense=kd, n_dense=need["n_fine_over"] + 2)
    img2, nd2 = render_with_aux(means, cov6, opacity, None, camera, bg, 0,
                                two, colors_precomp=colors)
    assert int(nd2) == 0, int(nd2)

    img_x = render(means, cov6, opacity, None, camera, bg,
                   cfg=RasterConfig(block=64, chunk=32, impl="xla",
                                    k_row=600, k_block=600),
                   colors_precomp=colors)
    a, b = np.asarray(img2), np.asarray(img_x)
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-3)
    assert np.mean(np.abs(a - b)) < 5e-6


def test_two_tier_grads_match_xla():
    """The two-tier path stays differentiable (top_k indices are constant,
    the dense-block scatter routes cotangents to the right blend): input
    grads match the XLA reference path like the single-tier pallas path
    does (threshold-pixel reassociation tolerance)."""
    from gsmpm_tpu.render.renderer import required_raster_caps

    means, cov6, opacity, colors, camera = _scene(n=300, seed=9)
    bg = jnp.zeros(3, jnp.float32)
    base = RasterConfig(block=64, chunk=32, impl="pallas",
                        k_tile=128, k_coarse=128, k_global=128)
    need = required_raster_caps(means, cov6, opacity, camera, base)
    kd = -(-need["k_tile"] // 128) * 128
    two = base._replace(k_dense=kd, n_dense=need["n_fine_over"] + 2)
    xla = RasterConfig(block=64, chunk=32, impl="xla",
                       k_row=300, k_block=300)
    rng = np.random.default_rng(13)
    ct = jnp.asarray(
        rng.normal(size=(camera.height, camera.width, 3)).astype(np.float32)
    )

    def f(cfg):
        def g(c6, op):
            return render(means, c6, op, None, camera, bg, cfg=cfg,
                          colors_precomp=colors)
        return g

    _, vjp_t = jax.vjp(f(two), cov6, opacity)
    _, vjp_x = jax.vjp(f(xla), cov6, opacity)
    for a, b in zip(vjp_t(ct), vjp_x(ct)):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-12
        assert np.abs(a - b).max() / scale < 5e-3, (
            np.abs(a - b).max(), scale
        )
