"""shard_map'd sim / render / fit steps over a jax.sharding.Mesh.

Parallel decomposition (SURVEY.md §2.3 — all new; the reference is
single-GPU):

- MPM substeps: particles sharded over the ``data`` axis; each chip scatters
  its partial P2G grid and the dense grid is ``psum``-reduced over ICI
  (solver.substep already takes ``axis_name``).  The grid is small (n_grid^3
  <= 1M nodes) so replicate-and-reduce beats halo bookkeeping until very
  large grids.
- Rendering: gaussians ``all_gather``-ed over ``data``, pixel blocks sharded
  over the ``tile`` axis (each chip blends a contiguous slice of the block
  grid from render_blocks), rows gathered back.
- System-ID: one jax.value_and_grad THROUGH the shard_map — per-particle
  logE/y gradients come out shard-local (no all-reduce needed; the reference
  reduces to scalar E, nu only at readout, /root/reference/extra.py:248-249);
  pixel gradients reverse through the all_gather as psum_scatter, grid
  adjoints reverse through psum automatically.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gsmpm_tpu.ops.losses import photometric_loss
from gsmpm_tpu.render.camera import Camera
from gsmpm_tpu.render.renderer import (
    RasterConfig,
    _xla_dropped_count,
    assemble_blocks,
    block_origins,
    preprocess,
    render_block_rows,
)
from gsmpm_tpu.sim.coupling import grid2world, mat_from_upper, upper_from_mat
from gsmpm_tpu.sim.solver import postprocess, run_substeps
from gsmpm_tpu.sim.state import GridConfig, mu_lam_from_logE_y


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------

def _gather_particles(tree, axis: str):
    """all_gather shard-local per-particle arrays back to full arrays."""
    return jax.tree.map(
        lambda l: jax.lax.all_gather(l, axis, axis=0, tiled=True), tree
    )


def _render_tile_sharded(
    means3d,
    cov6,
    opacity,
    shs,
    camera: Camera,
    bg,
    sh_degree: int,
    rcfg: RasterConfig,
    tile_axis: Optional[str],
):
    """Full-image render with pixel blocks sharded over ``tile_axis``.

    Runs inside shard_map; inputs must already be full (gathered) arrays.
    Returns (image, n_dropped) — preprocess is replicated across tile
    shards, so the cap-overflow count is identical on every device.
    """
    pre = preprocess(means3d, cov6, opacity, shs, camera, sh_degree, rcfg)
    key = jnp.where(pre.valid, pre.depth, jnp.inf)
    order = jnp.argsort(key)
    dropped = _xla_dropped_count(pre, camera, rcfg)
    _, nbx, nby = block_origins(camera, rcfg)
    if tile_axis is None:
        blocks = render_block_rows(pre, order, 0.0, nby, nbx, bg, rcfg)
        return assemble_blocks(blocks, camera, rcfg), dropped

    # shard contiguous block ROWS across the tile axis
    n_tiles = jax.lax.axis_size(tile_axis)
    tid = jax.lax.axis_index(tile_axis)
    rows_local = -(-nby // n_tiles)
    y_start = tid.astype(jnp.float32) * (rows_local * rcfg.block)
    blocks_local = render_block_rows(
        pre, order, y_start, rows_local, nbx, bg, rcfg
    )
    blocks = jax.lax.all_gather(blocks_local, tile_axis, axis=0, tiled=True)
    blocks = blocks[: nby * nbx]  # drop padded rows past the image
    return assemble_blocks(blocks, camera, rcfg), dropped


# ---------------------------------------------------------------------------
# sharded sim frame (entry point #1 scaling path)
# ---------------------------------------------------------------------------

def make_sharded_frame_fn(
    mesh: Mesh,
    example_state,
    example_model,
    bcs,
    grid: GridConfig,
    dt: float,
    n_substeps: int,
    incremental_cov: bool = False,
    rotate_sh: bool = False,
    data_axis: str = "data",
):
    """jit-compiled (state, model, t) -> (state, t, R) with particles sharded.

    Particle count must be divisible by the data-axis size
    (pad with parallel.mesh.pad_particles first).
    """
    from gsmpm_tpu.parallel.mesh import particle_pspec

    n = example_state.x.shape[0]
    axes = mesh.axis_names
    st_spec = particle_pspec(example_state, n, data_axis)
    md_spec = particle_pspec(example_model, n, data_axis)

    def local(state, model, t):
        state, t = run_substeps(
            state, model, bcs, t, n_substeps, grid, dt,
            incremental_cov=incremental_cov, axis_name=data_axis,
            checkpoint_policy=None,
        )
        cov6, R = postprocess(state, rotate_sh=rotate_sh)
        state = dataclasses.replace(state, cov=cov6)
        if R is None:
            R = jnp.zeros((state.x.shape[0], 3, 3), state.x.dtype)
        return state, t, R

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(st_spec, md_spec, P()),
        out_specs=(st_spec, P(), P(data_axis, None, None)),
        check_vma=False,
    )
    return jax.jit(sharded)


# ---------------------------------------------------------------------------
# sharded render (gaussians sharded in, tiles sharded compute)
# ---------------------------------------------------------------------------

def make_sharded_render_fn(
    mesh: Mesh,
    n_gaussians: int,
    camera: Camera,
    bg,
    sh_degree: int,
    rcfg: RasterConfig = RasterConfig(),
    data_axis: str = "data",
    tile_axis: Optional[str] = "tile",
):
    """jit fn(means3d, cov6, opacity, shs) -> (H,W,3), fully sharded.

    Inputs are sharded over ``data_axis`` (leading axis divisible by its
    size); the image is computed tile-sharded and returned replicated.
    """
    tile = tile_axis if (tile_axis in mesh.axis_names) else None

    def local(means3d, cov6, opacity, shs):
        full = _gather_particles((means3d, cov6, opacity, shs), data_axis)
        means3d, cov6, opacity, shs = full
        img, _ = _render_tile_sharded(
            means3d, cov6, opacity, shs, camera, bg, sh_degree, rcfg, tile
        )
        return img

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(data_axis, None),
            P(data_axis, None),
            P(data_axis),
            P(data_axis, None, None),
        ),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


# ---------------------------------------------------------------------------
# sharded system-ID step (entry point #2 scaling path)
# ---------------------------------------------------------------------------

def make_sharded_fit_step(
    mesh: Mesh,
    example_state,
    example_model,
    bcs,
    grid: GridConfig,
    frame_dt: float,
    n_substeps: int,
    camera: Camera,
    bg,
    opacity,
    features,
    sh_degree: int,
    scaling,
    pos_center,
    grid_extent: float,
    lr_logE: float = 0.8,
    lr_y: float = 1.6,
    grad_clip: float = 1.0,
    data_axis: str = "data",
    tile_axis: Optional[str] = "tile",
    tie_params: bool = False,
    rcfg: RasterConfig = RasterConfig(),
    sim_engine: str = "auto",
):
    """One full sharded training step of system identification.

    jit fn(logE, y, state, t, gt_image[, camera]) ->
        (loss, new_logE, new_y, new_state, new_t, image, n_dropped)

    The optional per-call ``camera`` (same static fields as the build-time
    ``camera``) lets one compiled step serve a camera ring without
    recompiles — its array fields are traced arguments.

    n_dropped counts rasterizer-cap overflow during the fitting render
    (drops bias gradients — the CUDA reference has no caps); callers
    should warn / raise k_row, k_block when it is nonzero.

    tie_params=True applies the scalar-pair update of
    sim/fitting.py:sgd_learn: the gradient is summed over ALL particles
    (psum across the data axis), clipped as a scalar, and the shared delta
    keeps every particle's logE/y identical — exactly equivalent to the
    single-device tied mode.

    Differentiable sim (fitting semantics: StVK Green-strain stress, no
    return map — parity /root/reference/mpm_solver/solver.py:54-69) through
    the tile-sharded renderer, followed by the reference's clipped
    per-particle SGD (solver.learn, solver.py:92-108) — all inside one
    compiled program. logE/y and their gradients stay shard-local.

    sim_engine: "auto" (tiled Pallas-VJP engine on TPU, XLA planes
    elsewhere), "tiled_vjp", or "xla".  Each device buckets its OWN
    particle shard into tiles and the folded blocked grid psum-reduces
    across the data axis inside every differentiable substep
    (tiles.substep_tiled_fitting axis_name hook) — the fused-kernel
    adjoint of the single-chip 1.0 s fit step, sharded (VERDICT r4 item
    2).  The step returns sim_ok (last output): False means the tiled
    engine overflowed (occupied-tile cap / drift) on some device and the
    caller must rebuild with sim_engine="xla" and re-run the frame.
    """
    from gsmpm_tpu.parallel.mesh import particle_pspec

    n = example_state.x.shape[0]
    dt = frame_dt / n_substeps
    tile = tile_axis if (tile_axis in mesh.axis_names) else None
    base_model = example_model
    st_spec = particle_pspec(example_state, n, data_axis)
    vec_spec = P(data_axis)
    ec = camera
    if sim_engine == "auto":
        sim_engine = (
            "tiled_vjp" if jax.default_backend() == "tpu" else "xla"
        )

    def local(logE, y, state, t, opac_l, feat_l, gt, view, proj, campos,
              scaling, pos_center):
        camera = Camera(
            view=view, full_proj=proj, campos=campos,
            width=ec.width, height=ec.height, fovx=ec.fovx, fovy=ec.fovy,
        )

        # the tiled engine's bootstrap reads the PER-PARTICLE model fields
        # (material/viscosity) the XLA fitting path ignores — slice them to
        # this device's particle shard
        didx = jax.lax.axis_index(data_axis)
        n_local = logE.shape[0]

        def _shard_field(f):
            return jax.lax.dynamic_slice_in_dim(
                f, didx * n_local, n_local, 0
            )

        local_base = (
            dataclasses.replace(
                base_model,
                material=_shard_field(base_model.material),
                viscosity=_shard_field(base_model.viscosity),
            )
            if sim_engine == "tiled_vjp" else base_model
        )

        def frame_loss(logE, y, state, t):
            mu, lam = mu_lam_from_logE_y(logE, y)
            model = dataclasses.replace(
                local_base, logE=logE, y=y, mu=mu, lam=lam
            )
            if sim_engine == "tiled_vjp":
                from gsmpm_tpu.sim.kernels import (
                    soa_from_state, state_from_soa,
                )
                from gsmpm_tpu.sim.tiles import run_substeps_tiled_fitting

                soa, t, ok = run_substeps_tiled_fitting(
                    soa_from_state(state), model, bcs, t, n_substeps,
                    grid, dt, chunk_impl="vjp", axis_name=data_axis,
                )
                state = state_from_soa(soa)
                # a shard's overflow invalidates the whole step
                ok = jax.lax.psum(
                    1 - ok.astype(jnp.int32), data_axis
                ) == 0
            else:
                state, t = run_substeps(
                    state, model, bcs, t, n_substeps, grid, dt,
                    fitting=True, axis_name=data_axis,
                    checkpoint_policy="substep",
                )
                ok = jnp.asarray(True)
            F = state.F
            cov6 = upper_from_mat(
                F @ mat_from_upper(state.init_cov) @ jnp.swapaxes(F, -1, -2)
            )
            xyz_w, cov_w = grid2world(
                state.x, cov6, scaling, pos_center, grid_extent
            )
            xyz_w, cov_w, opac, feat = _gather_particles(
                (xyz_w, cov_w, opac_l, feat_l), data_axis
            )
            img, n_dropped = _render_tile_sharded(
                xyz_w, cov_w, opac, feat, camera, bg, sh_degree,
                rcfg, tile,
            )
            loss = photometric_loss(img, gt)
            return loss, (state, t, img, n_dropped, ok)

        (loss, (state, t, img, n_dropped, sim_ok)), (g_logE, g_y) = (
            jax.value_and_grad(frame_loss, argnums=(0, 1), has_aux=True)(
                logE, y, state, t
            )
        )

        if tile is not None:
            # each tile-shard backward only carries its own pixels'
            # contribution; reduce over the tile axis so the SGD update is
            # identical on every replica of the logE/y shard
            g_logE = jax.lax.psum(g_logE, tile)
            g_y = jax.lax.psum(g_y, tile)

        c = grad_clip
        if tie_params:
            # scalar-pair chain rule: sum over ALL particles (local sum +
            # psum over the particle shards), clip as a scalar, shared delta
            gs_E = jax.lax.psum(
                jnp.where(jnp.isfinite(g_logE), g_logE, 0.0).sum(), data_axis
            )
            gs_y = jax.lax.psum(
                jnp.where(jnp.isfinite(g_y), g_y, 0.0).sum(), data_axis
            )
            g_logE = jnp.broadcast_to(jnp.clip(gs_E, -c, c), g_logE.shape)
            g_y = jnp.broadcast_to(jnp.clip(gs_y, -c, c), g_y.shape)
        else:
            g_logE = jnp.where(
                jnp.isfinite(g_logE), jnp.clip(g_logE, -c, c), 0.0
            )
            g_y = jnp.where(jnp.isfinite(g_y), jnp.clip(g_y, -c, c), 0.0)
        return (loss, logE - lr_logE * g_logE, y - lr_y * g_y, state, t, img,
                n_dropped, sim_ok)

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            vec_spec, vec_spec, st_spec, P(),
            vec_spec, P(data_axis, None, None), P(), P(), P(), P(),
            P(), P(),
        ),
        out_specs=(P(), vec_spec, vec_spec, st_spec, P(), P(), P(), P()),
        check_vma=False,
    )

    def step(logE, y, state, t, gt, cam: Optional[Camera] = None,
             opac=None, feats=None, scal=None, pc=None):
        cam = camera if cam is None else cam
        return sharded(
            logE, y, state, t,
            opacity if opac is None else opac,
            features if feats is None else feats, gt,
            cam.view, cam.full_proj, cam.campos,
            scaling if scal is None else scal,
            pos_center if pc is None else pc,
        )

    return jax.jit(step)


# ---------------------------------------------------------------------------
# camera-batch data parallelism (SURVEY §2.3 "DP over cameras/frames")
# ---------------------------------------------------------------------------

def stack_cameras(cameras):
    """Stack same-resolution Cameras into one pytree with a leading batch
    axis on the array fields (static fields must agree)."""
    c0 = cameras[0]
    for c in cameras[1:]:
        assert (c.width, c.height, c.fovx, c.fovy) == (
            c0.width, c0.height, c0.fovx, c0.fovy
        ), "stack_cameras needs identical static camera fields"
    return Camera(
        view=jnp.stack([c.view for c in cameras]),
        full_proj=jnp.stack([c.full_proj for c in cameras]),
        campos=jnp.stack([c.campos for c in cameras]),
        width=c0.width, height=c0.height, fovx=c0.fovx, fovy=c0.fovy,
    )


def make_camera_dp_fit_step(
    mesh: Mesh,
    example_model,
    bcs,
    grid: GridConfig,
    frame_dt: float,
    n_substeps: int,
    bg,
    opacity,
    features,
    sh_degree: int,
    scaling,
    pos_center,
    grid_extent: float,
    raster_cfg: RasterConfig = RasterConfig(),
    lr_logE: float = 0.8,
    lr_y: float = 1.6,
    grad_clip: float = 1.0,
    cam_axis: str = "cam",
    example_camera: Optional[Camera] = None,
    tie_params: bool = False,
    sim_engine: str = "auto",
):
    """Data-parallel system-ID step over a batch of cameras/observations.

    The reference trains one random camera per frame (extra.py:194); with
    multi-camera observations (io/dataset.py) every frame can instead use
    ALL cameras at once — one camera per device over the ``cam`` mesh axis,
    physics replicated, loss = mean over cameras, per-particle logE/y
    gradients psum-reduced over ICI before the clipped SGD update.

    jit fn(logE, y, state, t, view_b (B,4,4), proj_b (B,4,4),
           campos_b (B,3), gts (B,H,W,3)) ->
        (loss, new_logE, new_y, new_state, new_t, n_dropped)

    n_dropped is the total rasterizer-cap overflow across the camera batch
    (psum over devices) — nonzero means the gradients were computed against
    truncated images (the CUDA reference is uncapped); callers resize the
    caps and re-run like sim/fitting.py does.

    tie_params=True applies the scalar-pair update of sim/fitting.py's
    sgd_learn: gradients summed over particles AND cameras, clipped as a
    scalar, shared delta.

    (Camera static fields come from example_camera; pass the batch's array
    fields separately so the shard_map specs need no Camera treedef.)

    sim_engine: "auto" (tiled Pallas-VJP engine on TPU, XLA planes
    elsewhere), "tiled_vjp", or "xla".  Physics is REPLICATED in
    camera-DP, so the hand-written transfer-VJP engine
    (sim/transfer_vjp.py; fwd+bwd 679 ms vs 2078 ms XLA at 245k/50^3)
    drops in per-device with no new sharding — VERDICT r4 item 2.  The
    step returns sim_ok: False means the tiled engine's occupied-tile cap
    overflowed and the caller must rebuild with sim_engine="xla" and
    re-run the frame (apps/identify.py does).
    """
    base_model = example_model
    dt = frame_dt / n_substeps
    nb = mesh.shape[cam_axis]
    ec = example_camera
    if sim_engine == "auto":
        sim_engine = (
            "tiled_vjp" if jax.default_backend() == "tpu" else "xla"
        )

    def local(logE, y, state, t, view_b, proj_b, campos_b, gt_b,
              opacity, features, scaling, pos_center):
        camera = Camera(
            view=view_b[0], full_proj=proj_b[0], campos=campos_b[0],
            width=ec.width, height=ec.height, fovx=ec.fovx, fovy=ec.fovy,
        )
        gt = gt_b[0]

        def frame_loss(logE, y, state, t):
            mu, lam = mu_lam_from_logE_y(logE, y)
            model = dataclasses.replace(
                base_model, logE=logE, y=y, mu=mu, lam=lam
            )
            if sim_engine == "tiled_vjp":
                # hand-written Pallas transfer VJPs (sim/transfer_vjp.py):
                # the single-chip production fit engine, usable here
                # directly because camera-DP replicates the physics
                from gsmpm_tpu.sim.kernels import (
                    soa_from_state, state_from_soa,
                )
                from gsmpm_tpu.sim.tiles import run_substeps_tiled_fitting

                soa, t, ok = run_substeps_tiled_fitting(
                    soa_from_state(state), model, bcs, t, n_substeps,
                    grid, dt, chunk_impl="vjp",
                )
                state = state_from_soa(soa)
            else:
                state, t = run_substeps(
                    state, model, bcs, t, n_substeps, grid, dt,
                    fitting=True, checkpoint_policy="substep",
                )
                ok = jnp.asarray(True)
            F = state.F
            cov6 = upper_from_mat(
                F @ mat_from_upper(state.init_cov) @ jnp.swapaxes(F, -1, -2)
            )
            xyz_w, cov_w = grid2world(
                state.x, cov6, scaling, pos_center, grid_extent
            )
            from gsmpm_tpu.render.renderer import render_with_aux

            img, n_dropped = render_with_aux(
                xyz_w, cov_w, opacity, features, camera, bg, sh_degree,
                raster_cfg,
            )
            # mean over the camera batch: psum of per-device means / B
            loss = jax.lax.psum(photometric_loss(img, gt), cam_axis) / nb
            return loss, (state, t, n_dropped, ok)

        (loss, (state, t, n_dropped, sim_ok)), (g_logE, g_y) = (
            jax.value_and_grad(frame_loss, argnums=(0, 1), has_aux=True)(
                logE, y, state, t
            )
        )
        n_dropped = jax.lax.psum(n_dropped, cam_axis)
        # each device's backward only carries its own camera's term of the
        # psum'd loss: reduce so the SGD update is identical on every
        # replica of logE/y
        g_logE = jax.lax.psum(g_logE, cam_axis)
        g_y = jax.lax.psum(g_y, cam_axis)
        c = grad_clip
        if tie_params:
            # particles are replicated in camera-DP, so the scalar-pair sum
            # is a plain local sum after the cam-axis psum
            g_logE = jnp.broadcast_to(
                jnp.clip(jnp.where(jnp.isfinite(g_logE), g_logE, 0.0).sum(),
                         -c, c),
                g_logE.shape,
            )
            g_y = jnp.broadcast_to(
                jnp.clip(jnp.where(jnp.isfinite(g_y), g_y, 0.0).sum(), -c, c),
                g_y.shape,
            )
        else:
            g_logE = jnp.where(
                jnp.isfinite(g_logE), jnp.clip(g_logE, -c, c), 0.0
            )
            g_y = jnp.where(jnp.isfinite(g_y), jnp.clip(g_y, -c, c), 0.0)
        return (loss, logE - lr_logE * g_logE, y - lr_y * g_y, state, t,
                n_dropped, sim_ok)

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(cam_axis), P(cam_axis),
                  P(cam_axis), P(cam_axis), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P(), P(), P(), P()),
        check_vma=False,
    )

    def step(logE, y, state, t, cameras_stacked: Camera, gts,
             opac=None, feats=None, scal=None, pc=None):
        return sharded(
            logE, y, state, t, cameras_stacked.view,
            cameras_stacked.full_proj, cameras_stacked.campos, gts,
            opacity if opac is None else opac,
            features if feats is None else feats,
            scaling if scal is None else scal,
            pos_center if pc is None else pc,
        )

    return jax.jit(step)
