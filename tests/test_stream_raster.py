"""Sorted-segment streaming rasterizer vs the XLA reference path.

Interpret mode on CPU (conftest pins the cpu platform); the compiled
on-chip numbers live in BASELINE.md / scripts/profile_stream.py.  Parity
target: the uncapped CUDA tile pipeline consumed at
/root/reference/main.py:148-156 — drop-free at any density, forward and
backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsmpm_tpu.render.camera import make_camera
from gsmpm_tpu.render.renderer import RasterConfig, render_with_aux
from gsmpm_tpu.render.stream_raster import required_stream_caps


def _scene(n=400, seed=0, big_frac=0.0, giant_frac=0.0, cluster=False,
           w=192, h=128):
    rng = np.random.default_rng(seed)
    if cluster:
        means = (0.08 * rng.normal(size=(n, 3))).astype(np.float32)
    else:
        means = rng.uniform(-1.0, 1.0, size=(n, 3)).astype(np.float32)
    means[:, 2] += 3.5
    r = rng.random(n)
    scale = np.where(
        r < 1.0 - big_frac - giant_frac, 0.05,
        np.where(r < 1.0 - giant_frac, 0.6, 6.0),
    ).astype(np.float32)
    A = scale[:, None, None] * rng.normal(size=(n, 3, 3)).astype(np.float32)
    cov = A @ A.transpose(0, 2, 1) + 1e-4 * np.eye(3, dtype=np.float32)
    cov6 = np.stack(
        [cov[:, 0, 0], cov[:, 0, 1], cov[:, 0, 2],
         cov[:, 1, 1], cov[:, 1, 2], cov[:, 2, 2]], axis=-1,
    )
    opacity = rng.uniform(0.15, 0.95, size=(n,)).astype(np.float32)
    colors = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    camera = make_camera(w, h, 0.9, 0.9, np.eye(3), np.zeros(3))
    return (jnp.asarray(means), jnp.asarray(cov6), jnp.asarray(opacity),
            jnp.asarray(colors), camera)


def _xla_cfg(B):
    return RasterConfig(block=B, k_block=8192, k_row=16384, chunk=32,
                        impl="xla")


def _stream_cfg(B, **kw):
    kw.setdefault("stream_unroll", 2)
    return RasterConfig(block=B, chunk=32, impl="pallas", stream=True, **kw)


@pytest.mark.parametrize("B", [64, 32])
def test_stream_matches_xla_mixed_sizes(B):
    means, cov6, opacity, colors, camera = _scene(
        n=300, seed=5, big_frac=0.1, giant_frac=0.02
    )
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    img_x, nd_x = render_with_aux(means, cov6, opacity, None, camera, bg,
                                  cfg=_xla_cfg(B), colors_precomp=colors)
    img_s, nd_s = render_with_aux(means, cov6, opacity, None, camera, bg,
                                  cfg=_stream_cfg(B),
                                  colors_precomp=colors)
    assert int(nd_x) == 0 and int(nd_s) == 0
    a, b = np.asarray(img_s), np.asarray(img_x)
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-3)
    assert np.mean(np.abs(a - b)) < 5e-6


def test_stream_dense_cluster_dropfree():
    """The motivating case: a concentrated scene whose per-tile candidate
    counts blow every windowed cap — the stream path is drop-free by
    construction (no K caps exist)."""
    means, cov6, opacity, colors, camera = _scene(
        n=800, seed=9, cluster=True, w=128, h=128
    )
    bg = jnp.ones(3, jnp.float32)
    img_x, _ = render_with_aux(means, cov6, opacity, None, camera, bg,
                               cfg=_xla_cfg(32), colors_precomp=colors)
    img_s, nd_s = render_with_aux(means, cov6, opacity, None, camera, bg,
                                  cfg=_stream_cfg(32),
                                  colors_precomp=colors)
    assert int(nd_s) == 0
    np.testing.assert_allclose(
        np.asarray(img_s), np.asarray(img_x), rtol=1e-3, atol=2e-3
    )


def test_stream_tier4_whole_screen_splats():
    """Splats spanning > 64 fine tiles draw from the tier-4 (nf-corner)
    budget; needs an image larger than 8x8 tiles to be reachable."""
    means, cov6, opacity, colors, camera = _scene(
        n=120, seed=11, giant_frac=0.15, w=384, h=384
    )
    cfg = _stream_cfg(32)
    caps = required_stream_caps(means, cov6, opacity, camera, cfg)
    assert caps["stream_g4"] > 0, caps  # tier 4 genuinely exercised
    bg = jnp.asarray([0.3, 0.1, 0.2], jnp.float32)
    img_x, _ = render_with_aux(means, cov6, opacity, None, camera, bg,
                               cfg=_xla_cfg(32), colors_precomp=colors)
    img_s, nd_s = render_with_aux(means, cov6, opacity, None, camera, bg,
                                  cfg=cfg, colors_precomp=colors)
    assert int(nd_s) == 0
    np.testing.assert_allclose(
        np.asarray(img_s), np.asarray(img_x), rtol=1e-3, atol=2e-3
    )


def test_stream_budget_overflow_counted_and_resizable():
    means, cov6, opacity, colors, camera = _scene(
        n=300, seed=5, big_frac=0.2
    )
    bg = jnp.zeros(3, jnp.float32)
    tiny = _stream_cfg(64, stream_g2=1, stream_g3=1, stream_g4=1)
    _, nd = render_with_aux(means, cov6, opacity, None, camera, bg,
                            cfg=tiny, colors_precomp=colors)
    assert int(nd) > 0
    need = required_stream_caps(means, cov6, opacity, camera, tiny)
    sized = tiny._replace(
        stream_g2=max(need["stream_g2"], 1),
        stream_g3=max(need["stream_g3"], 1),
        stream_g4=max(need["stream_g4"], 1),
    )
    _, nd2 = render_with_aux(means, cov6, opacity, None, camera, bg,
                             cfg=sized, colors_precomp=colors)
    assert int(nd2) == 0


def test_stream_grads_match_xla():
    """End-to-end jax.grad through emission + 11-operand sort + the
    reverse-walk kernel agrees with the XLA path's autodiff."""
    means, cov6, opacity, colors, camera = _scene(
        n=200, seed=3, big_frac=0.1, w=128, h=128
    )
    bg = jnp.zeros(3, jnp.float32)
    rng = np.random.default_rng(11)
    tgt = jnp.asarray(rng.random((128, 128, 3)).astype(np.float32))

    def loss(cfg, m, c6, op, col):
        img, _ = render_with_aux(m, c6, op, None, camera, bg, cfg=cfg,
                                 colors_precomp=col)
        return jnp.mean((img - tgt) ** 2)

    gx = jax.grad(lambda *a: loss(_xla_cfg(64), *a), argnums=(0, 1, 2, 3))(
        means, cov6, opacity, colors
    )
    gs = jax.grad(lambda *a: loss(_stream_cfg(64), *a),
                  argnums=(0, 1, 2, 3))(means, cov6, opacity, colors)
    for a_, b_ in zip(gs, gx):
        a_, b_ = np.asarray(a_), np.asarray(b_)
        denom = np.abs(b_).max() + 1e-12
        assert np.abs(a_ - b_).max() / denom < 1e-3


def test_stream_grads_finite_difference():
    """Central finite differences on a handful of parameters pin the
    backward kernel against the forward itself (independent of XLA)."""
    means, cov6, opacity, colors, camera = _scene(
        n=60, seed=21, big_frac=0.15, w=64, h=64
    )
    bg = jnp.asarray([0.2, 0.2, 0.2], jnp.float32)
    cfg = _stream_cfg(32, stream_unroll=1)
    rng = np.random.default_rng(4)
    tgt = jnp.asarray(rng.random((64, 64, 3)).astype(np.float32))

    def loss_np(op):
        img, _ = render_with_aux(means, cov6, jnp.asarray(op), None,
                                 camera, bg, cfg=cfg,
                                 colors_precomp=colors)
        return float(jnp.mean((img - tgt) ** 2))

    g = jax.grad(
        lambda op: jnp.mean(
            (render_with_aux(means, cov6, op, None, camera, bg, cfg=cfg,
                             colors_precomp=colors)[0] - tgt) ** 2
        )
    )(opacity)
    g = np.asarray(g)
    op0 = np.asarray(opacity)
    # f32 forward quantizes the loss at ~1e-8, so per-element FD drowns in
    # noise; directional derivatives along random unit vectors aggregate
    # the whole gradient into one larger, cleaner signal
    eps = 2e-3
    for k in range(3):
        d = rng.normal(size=op0.shape).astype(np.float32)
        d /= np.linalg.norm(d)
        fd = (loss_np(op0 + eps * d) - loss_np(op0 - eps * d)) / (2 * eps)
        an = float(np.dot(g, d))
        assert abs(fd - an) < 3e-2 * max(abs(fd), abs(an)) + 3e-6, (
            k, fd, an
        )


def test_stream_unroll_invariance():
    """The chunk-walk decomposition is semantics-free: U=1 and U=4 agree
    bitwise-ish (same math, same chunk size C)."""
    means, cov6, opacity, colors, camera = _scene(n=250, seed=13)
    bg = jnp.zeros(3, jnp.float32)
    img1, _ = render_with_aux(means, cov6, opacity, None, camera, bg,
                              cfg=_stream_cfg(64, stream_unroll=1),
                              colors_precomp=colors)
    img4, _ = render_with_aux(means, cov6, opacity, None, camera, bg,
                              cfg=_stream_cfg(64, stream_unroll=4),
                              colors_precomp=colors)
    np.testing.assert_allclose(
        np.asarray(img1), np.asarray(img4), rtol=1e-5, atol=1e-6
    )
