"""Device mesh construction and particle-shard padding helpers.

TPU-native scaling primitives the single-GPU reference has no analogue of
(SURVEY.md §2.3): the mesh axes are

- ``data``  — particles/gaussians sharded along their leading axis; the dense
  MPM grid is reduced across this axis with ``psum`` (rides ICI);
- ``tile``  — pixel blocks of the rasterizer sharded across chips.

Padding particles to a multiple of the mesh size uses physically inert
fillers: mass = vol = 0 contributes nothing to P2G (zero mass, zero momentum,
zero stress impulse) and opacity = 0 contributes nothing to blending, so a
padded run is bit-for-bit the physics of the unpadded one.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(
    axes: Tuple[Tuple[str, int], ...] = (("data", -1),),
    devices=None,
) -> Mesh:
    """Build a Mesh from (name, size) axes; one size may be -1 (inferred).

    Example: make_mesh((("data", 4), ("tile", 2))) on 8 devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    names = [a[0] for a in axes]
    sizes = [a[1] for a in axes]
    known = int(np.prod([s for s in sizes if s != -1])) if sizes else 1
    if -1 in sizes:
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"mesh {dict(zip(names, sizes))} needs {total} devices, "
                         f"have {len(devices)}")
    dev = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(dev, tuple(names))


def _pad_axis0(arr: jnp.ndarray, n_pad: int, fill=0.0) -> jnp.ndarray:
    if n_pad == 0:
        return arr
    pad_shape = (n_pad,) + arr.shape[1:]
    return jnp.concatenate([arr, jnp.full(pad_shape, fill, arr.dtype)], axis=0)


def pad_model(model, multiple: int):
    """Pad only the MPMModel's per-particle fields with inert fillers."""
    n = model.material.shape[0]
    k = -(-n // multiple) * multiple - n
    if k == 0:
        return model
    return dataclasses.replace(
        model,
        material=_pad_axis0(model.material, k, model.active_materials[0]),
        logE=_pad_axis0(model.logE, k, 4.0),
        y=_pad_axis0(model.y, k),
        mu=_pad_axis0(model.mu, k, 1.0),
        lam=_pad_axis0(model.lam, k, 1.0),
        viscosity=_pad_axis0(model.viscosity, k),
    )


def pad_state(state, multiple: int):
    """Pad only the MPMState with inert filler particles (see pad_particles)."""
    n = state.x.shape[0]
    k = -(-n // multiple) * multiple - n
    if k == 0:
        return state
    eye = jnp.broadcast_to(jnp.eye(3, dtype=state.F.dtype), (k, 3, 3))
    iso_cov = jnp.tile(
        jnp.asarray([1e-8, 0, 0, 1e-8, 0, 1e-8], state.init_cov.dtype), (k, 1)
    )
    return dataclasses.replace(
        state,
        x=_pad_axis0(state.x, k, 1e-3),
        v=_pad_axis0(state.v, k),
        F=jnp.concatenate([state.F, eye], axis=0),
        F_trial=jnp.concatenate([state.F_trial, eye], axis=0),
        C=_pad_axis0(state.C, k),
        vol=_pad_axis0(state.vol, k),
        density=_pad_axis0(state.density, k),
        mass=_pad_axis0(state.mass, k),
        init_cov=jnp.concatenate([state.init_cov, iso_cov], axis=0),
        cov=jnp.concatenate([state.cov, iso_cov], axis=0),
        yield_stress=_pad_axis0(state.yield_stress, k, 1.0),
    )


def pad_particles(state, model, multiple: int, extras: Optional[dict] = None):
    """Pad MPMState/MPMModel (and optional per-particle extras) along axis 0.

    Fillers are inert: mass/vol 0, F = F_trial = I (keeps SVD/return-map
    well-conditioned), position at the domain origin cell.  Returns
    (state, model, extras, n_orig).
    """
    n = state.x.shape[0]
    k = -(-n // multiple) * multiple - n
    if k == 0:
        return state, model, extras or {}, n
    out_extras = {}
    for name, arr in (extras or {}).items():
        out_extras[name] = _pad_axis0(arr, k)  # opacity/features pad to 0
    return pad_state(state, multiple), pad_model(model, multiple), out_extras, n


def unpad(tree, n: int):
    """Strip particle padding back off every (n_padded, ...) leaf."""
    return jax.tree.map(
        lambda l: l[:n] if hasattr(l, "ndim") and l.ndim >= 1 else l, tree
    )


def particle_pspec(tree, n_particles: int, axis: str = "data"):
    """PartitionSpec pytree: shard leading particle axis, replicate the rest."""

    def spec(leaf):
        if (
            hasattr(leaf, "ndim")
            and leaf.ndim >= 1
            and leaf.shape[0] == n_particles
        ):
            return P(axis, *([None] * (leaf.ndim - 1)))
        return P()

    return jax.tree.map(spec, tree)
