"""Quadratic B-spline interpolation weights for MLS-MPM transfers.

Parity: the weight/derivative construction inside p2g/g2p
(/root/reference/mpm_solver/utils.py:94-110,221-253) — Equation (123) quadratic
spline kernel.  Here computed once, batched over all particles, and shared by
the P2G scatter and G2P gather.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

# the 27 nodes of the 3x3x3 stencil, shape (27, 3)
SPLINE_OFFSETS = np.stack(
    np.meshgrid(np.arange(3), np.arange(3), np.arange(3), indexing="ij"), axis=-1
).reshape(27, 3)


def quadratic_bspline_weights(
    x: jnp.ndarray, inv_dx: float
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-particle stencil data.

    Returns:
      base (N,3) int32 — bottom-left-front grid node of the 3x3x3 stencil
      fx   (N,3)       — fractional offset of the particle from base
      w    (N,3,3)     — per-axis weights for stencil nodes 0,1,2
      dw   (N,3,3)     — per-axis weight derivative factors
    """
    grid_pos = x * inv_dx
    base = jnp.floor(grid_pos - 0.5).astype(jnp.int32)
    fx = grid_pos - base.astype(x.dtype)

    wa = 1.5 - fx
    wb = fx - 1.0
    wc = fx - 0.5
    w = jnp.stack([0.5 * wa * wa, 0.75 - wb * wb, 0.5 * wc * wc], axis=-1)
    dw = jnp.stack([fx - 1.5, -2.0 * (fx - 1.0), fx - 0.5], axis=-1)
    return base, fx, w, dw


def stencil_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(N,3,3) per-axis weights -> (N,27) product weights in SPLINE_OFFSETS order."""
    wx = w[:, 0, :]  # (N,3)
    wy = w[:, 1, :]
    wz = w[:, 2, :]
    return (wx[:, :, None, None] * wy[:, None, :, None] * wz[:, None, None, :]).reshape(
        -1, 27
    )


def stencil_dweights(w: jnp.ndarray, dw: jnp.ndarray, inv_dx: float) -> jnp.ndarray:
    """(N,27,3) gradient of the product weight wrt position (times inv_dx).

    Parity: compute_dweight (/root/reference/mpm_solver/utils.py:79-86).
    """
    wx, wy, wz = w[:, 0, :], w[:, 1, :], w[:, 2, :]
    dwx, dwy, dwz = dw[:, 0, :], dw[:, 1, :], dw[:, 2, :]
    gx = dwx[:, :, None, None] * wy[:, None, :, None] * wz[:, None, None, :]
    gy = wx[:, :, None, None] * dwy[:, None, :, None] * wz[:, None, None, :]
    gz = wx[:, :, None, None] * wy[:, None, :, None] * dwz[:, None, None, :]
    g = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 27, 3)
    return g * inv_dx
