"""Mean 3-nearest-neighbor distance (scale initialization for 3DGS).

TPU-native equivalent of the reference's simple-knn CUDA extension
(consumed transitively via GaussianModel when training gaussians;
SURVEY.md §2.2 N3): blocked brute-force distances + top-k, so memory stays
O(block * N) instead of O(N^2) and every step is MXU/VPU-friendly
(the pairwise distances are one matmul per block).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mean_knn_dist(points: jnp.ndarray, k: int = 3, block: int = 1024):
    """(N,3) points -> (N,) mean distance to the k nearest neighbors.

    Parity: simple_knn.distCUDA2 (mean of the 3 nearest squared... the
    upstream op returns mean SQUARED distance of the 3-NN; this returns the
    same quantity).
    """
    n = points.shape[0]
    n_pad = -(-n // block) * block
    pts = jnp.pad(points, ((0, n_pad - n), (0, 0)), constant_values=1e18)
    sq = jnp.sum(pts * pts, axis=-1)  # (n_pad,)

    def do_block(i):
        rows = jax.lax.dynamic_slice_in_dim(pts, i * block, block, 0)
        rsq = jax.lax.dynamic_slice_in_dim(sq, i * block, block, 0)
        # squared distances via the matmul identity |a-b|^2 = |a|^2+|b|^2-2ab
        d2 = rsq[:, None] + sq[None, :] - 2.0 * (rows @ pts.T)
        d2 = jnp.maximum(d2, 0.0)
        # k+1 smallest includes self (distance 0)
        neg_top, _ = jax.lax.top_k(-d2, k + 1)
        return jnp.mean(-neg_top[:, 1:], axis=-1)

    out = jax.lax.map(do_block, jnp.arange(n_pad // block))
    return out.reshape(-1)[:n]
