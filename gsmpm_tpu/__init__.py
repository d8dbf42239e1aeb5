"""gsmpm_tpu — a TPU-native Gaussian-Splatting + MPM (PhysGaussian-style) framework.

Re-implements the capabilities of `ranrandy/gaussian-splatting-mpm` (reference
mounted at /root/reference) as an idiomatic JAX/XLA/Pallas/pjit framework:

- ``gsmpm_tpu.sim``      — functional MLS-MPM solver (P2G / grid / G2P under lax.scan)
- ``gsmpm_tpu.ops``      — batched math kernels (3x3 SVD, B-splines, constitutive models)
- ``gsmpm_tpu.render``   — differentiable tile-based 3D Gaussian splatting renderer
- ``gsmpm_tpu.models``   — 3DGS scene container (pytree) + PLY checkpoint I/O
- ``gsmpm_tpu.parallel`` — multi-chip sharding (shard_map over device meshes)
- ``gsmpm_tpu.apps``     — entry points: simulate (main.py parity), identify (extra.py parity)
- ``gsmpm_tpu.io``       — cameras.json / PLY / video I/O
- ``gsmpm_tpu.config``   — JSON config system compatible with the reference configs/*.json
"""

__version__ = "0.1.0"
