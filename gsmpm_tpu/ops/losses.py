"""Image losses: L1 and SSIM.

Parity: the gaussian-splatting submodule's loss_utils consumed by the
system-ID trainer — 0.8*l1_loss + 0.2*ssim (/root/reference/extra.py:200,218).
SSIM uses the standard 11-tap gaussian window (sigma 1.5), C1=0.01^2,
C2=0.03^2, implemented with depthwise convolutions in jax.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - target).mean()


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    xs = np.arange(size) - size // 2
    g = np.exp(-(xs**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _filter2d(img: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable 11x11 gaussian blur on (H, W, C) with same padding."""
    c = img.shape[-1]
    k = win.shape[0]
    x = img[None]  # (1,H,W,C)
    kern_h = jnp.tile(win.reshape(k, 1, 1, 1), (1, 1, 1, c))  # (k,1,1,C)
    kern_w = jnp.tile(win.reshape(1, k, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kern_h.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, kern_h, (1, 1), [(k // 2, k // 2), (0, 0)], dimension_numbers=dn,
        feature_group_count=c,
    )
    x = jax.lax.conv_general_dilated(
        x, kern_w, (1, 1), [(0, 0), (k // 2, k // 2)], dimension_numbers=dn,
        feature_group_count=c,
    )
    return x[0]


@partial(jax.jit, static_argnames=("window_size",))
def ssim(
    img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11
) -> jnp.ndarray:
    """Mean SSIM over an (H, W, C) image pair in [0, 1]."""
    win = jnp.asarray(_gaussian_window(window_size))
    mu1 = _filter2d(img1, win)
    mu2 = _filter2d(img2, win)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    # clamp variance estimates at 0 (filter round-off can push them negative,
    # which lets ssim exceed 1 on near-constant regions)
    sigma1_sq = jnp.maximum(_filter2d(img1 * img1, win) - mu1_sq, 0.0)
    sigma2_sq = jnp.maximum(_filter2d(img2 * img2, win) - mu2_sq, 0.0)
    sigma12 = _filter2d(img1 * img2, win) - mu12
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return ssim_map.mean()


def photometric_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """0.8 L1 + 0.2 SSIM — note the reference *adds* the SSIM term with a
    positive sign (/root/reference/extra.py:200), i.e. it is an as-committed
    similarity-in-the-loss; we keep the standard (1 - ssim) formulation and
    expose the as-committed variant separately."""
    return 0.8 * l1_loss(pred, target) + 0.2 * (1.0 - ssim(pred, target))


def photometric_loss_as_committed(pred, target):
    """Bit-parity with /root/reference/extra.py:200,218."""
    return 0.8 * l1_loss(pred, target) + 0.2 * ssim(pred, target)
