"""Per-particle volume initialization from grid occupancy.

Parity: get_particle_volume (/root/reference/internel_filling/filling.py:11-42) —
histogram particles into cells (there: ti.atomic_add; here: one scatter-add),
volume = dx^3 / count(cell), optional uniform mean.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_grid", "uniform"))
def particle_volume(
    x: jnp.ndarray, n_grid: int, grid_extent: float, uniform: bool = False
) -> jnp.ndarray:
    dx = grid_extent / n_grid
    cell = jnp.clip(jnp.floor(x / dx).astype(jnp.int32), 0, n_grid - 1)
    flat = (cell[:, 0] * n_grid + cell[:, 1]) * n_grid + cell[:, 2]
    counts = jnp.zeros((n_grid ** 3,), jnp.float32).at[flat].add(1.0)
    vol = (dx ** 3) / counts[flat]
    if uniform:
        vol = jnp.full_like(vol, vol.mean())
    return vol
