"""Multi-chip parallelism: mesh construction, sharded sim/render/fit steps.

The reference is single-GPU (SURVEY.md §2.3); the scaling story here is
TPU-native by design: jax.sharding.Mesh + shard_map, grid reduction with
psum over ICI, gaussian all_gather for tile-sharded rendering, per-particle
parameter gradients staying shard-local.
"""

from gsmpm_tpu.parallel.mesh import (
    make_mesh,
    pad_particles,
    particle_pspec,
    unpad,
)
from gsmpm_tpu.parallel.sharded import (
    make_sharded_frame_fn,
    make_sharded_fit_step,
    make_sharded_render_fn,
)

__all__ = [
    "make_mesh",
    "pad_particles",
    "particle_pspec",
    "unpad",
    "make_sharded_frame_fn",
    "make_sharded_fit_step",
    "make_sharded_render_fn",
]
