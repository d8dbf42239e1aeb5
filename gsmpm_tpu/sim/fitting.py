"""System identification: learn E, nu by gradient descent through sim+render.

Parity target: SystemIndentifier (/root/reference/extra.py:69-348).  The
reference glues Taichi autodiff (30 hand-driven adjoint substeps,
solver.py:71-90) to torch autograd via a grad copy (extra.py:226-228); here the
whole thing is one jax.value_and_grad through a lax.scan of substeps and the
differentiable rasterizer, with jax.checkpoint giving the reference's own
memory policy (store particles, rematerialize the grid — solver.py:74-78).

The physical parameterization matches the reference exactly: per-particle
logE, y with E = 10^logE, nu = 0.49*sigmoid(y)
(/root/reference/mpm_solver/utils.py:349-362), updated by per-particle clipped
SGD with lr 0.8 / 1.6 (solver.learn, /root/reference/mpm_solver/solver.py:92-108).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gsmpm_tpu.config import MPMConfig
from gsmpm_tpu.models.gaussians import GaussianScene
from gsmpm_tpu.ops.losses import photometric_loss
from gsmpm_tpu.render.camera import Camera
from gsmpm_tpu.render.renderer import RasterConfig, render, render_with_aux
from gsmpm_tpu.sim.boundary import BCSet, StickyGroundBC
from gsmpm_tpu.sim.coupling import grid2world, mat_from_upper, upper_from_mat, world2grid
from gsmpm_tpu.sim.solver import run_substeps
from gsmpm_tpu.sim.state import (
    GridConfig,
    MPMModel,
    MPMState,
    init_model,
    init_state,
    mu_lam_from_logE_y,
)
from gsmpm_tpu.sim.volume import particle_volume


class FitConfig(NamedTuple):
    substeps_per_frame: int = 30  # parity extra.py:206
    frame_dt: float = 0.03
    lr_logE: float = 0.8  # parity solver.py:107
    lr_y: float = 1.6  # parity solver.py:108
    grad_clip: float = 1.0  # parity solver.py:96-105
    world_pad: float = 0.3  # parity extra.py:320
    # tie_params=True treats (logE, y) as a single scalar pair shared by all
    # particles: the gradient is the SUM over particles (the chain rule for a
    # broadcast scalar), clipped as a scalar.  The reference keeps per-particle
    # parameters and reads out their mean (extra.py:248-249), but its mean-loss
    # per-particle gradients are O(1/n_pixels) each, so the mean E moves by
    # ~1e-5 decades per SGD step — the scalar mode is the practical way to
    # recover E, nu for a single-material scene in O(100) steps.
    tie_params: bool = False


def cfl_dt_limit(E: float, nu: float, density: float, dx: float) -> float:
    """Explicit-MPM stability bound: dt < dx / c_p with the p-wave speed
    c_p = sqrt((lambda + 2 mu) / rho).

    The reference has no such check and silently NaNs when E_init is too
    stiff for the fitting dt (extra.py's 2e6 default at dt = 0.03/30
    diverges for typical densities); the fitting entry point warns via
    this helper so a frozen-E run is diagnosable.
    """
    lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    mu = E / (2.0 * (1.0 + nu))
    c_p = float(np.sqrt((lam + 2.0 * mu) / density))
    return dx / c_p


def sgd_learn(logE, y, g_logE, g_y, cfg: FitConfig):
    """Per-particle clipped SGD (parity: MPM_Simulator.learn).

    Non-finite gradients (e.g. from a CFL-unstable forward) are dropped rather
    than propagated — the NaN-guard the reference lacks (SURVEY §5).
    """
    c = cfg.grad_clip
    if cfg.tie_params:
        # scalar-parameter chain rule: d loss / d logE_scalar = sum_p grads
        g_logE = jnp.clip(jnp.where(jnp.isfinite(g_logE), g_logE, 0.0).sum(), -c, c)
        g_y = jnp.clip(jnp.where(jnp.isfinite(g_y), g_y, 0.0).sum(), -c, c)
        return logE - cfg.lr_logE * g_logE, y - cfg.lr_y * g_y
    g_logE = jnp.where(jnp.isfinite(g_logE), jnp.clip(g_logE, -c, c), 0.0)
    g_y = jnp.where(jnp.isfinite(g_y), jnp.clip(g_y, -c, c), 0.0)
    return logE - cfg.lr_logE * g_logE, y - cfg.lr_y * g_y


class SystemIdentifier:
    """Fit per-particle logE, y to observed frames by differentiable sim+render."""

    def __init__(
        self,
        scene: GaussianScene,
        mpm_cfg: MPMConfig,
        init_velocity: Optional[jnp.ndarray] = None,
        fit_cfg: FitConfig = FitConfig(),
        raster_cfg: RasterConfig = RasterConfig(),
        bg: Optional[jnp.ndarray] = None,
        mesh=None,
        data_axis: str = "data",
        tile_axis: str = "tile",
    ):
        """mesh: optional jax.sharding.Mesh — when given, fit_frame runs the
        fully sharded training step (particles over ``data_axis``, pixel
        rows over ``tile_axis`` if present; parallel/sharded.py) instead of
        the single-device jit.  Particles are padded with inert fillers to
        the data-axis size; results match the single-device path
        (tests/test_parallel.py)."""
        self.scene = scene
        self.mpm_cfg = dataclasses.replace(mpm_cfg, fitting=True)
        self.fit_cfg = fit_cfg
        self.raster_cfg = raster_cfg
        self.bg = jnp.ones(3) if bg is None else bg
        self.grid = GridConfig(mpm_cfg.n_grid, mpm_cfg.grid_extent)
        self.mesh = mesh
        self.data_axis = data_axis
        self.tile_axis = tile_axis
        self._pad_mult = 1 if mesh is None else int(mesh.shape[data_axis])

        n = scene.num_gaussians
        self.n_orig = n
        self.init_velocity = (
            jnp.zeros((n, 3), jnp.float32) if init_velocity is None else init_velocity
        )
        self.model = init_model(self.mpm_cfg, n)
        if fit_cfg.tie_params:
            # tied mode promises ONE scalar (logE, y) pair shared by all
            # particles; a heterogeneous init (per-particle physical.json
            # data) would otherwise silently keep untied offsets under the
            # shared scalar delta — collapse to the mean up front
            self.model = dataclasses.replace(
                self.model,
                logE=jnp.full_like(self.model.logE, self.model.logE.mean()),
                y=jnp.full_like(self.model.y, self.model.y.mean()),
            )
            mu, lam = mu_lam_from_logE_y(self.model.logE, self.model.y)
            self.model = dataclasses.replace(self.model, mu=mu, lam=lam)
        if self._pad_mult > 1:
            from gsmpm_tpu.parallel.mesh import pad_model

            self.model = pad_model(self.model, self._pad_mult)
        self._frame_fn = None
        # rasterizer-cap overflow accounting (the CUDA reference has no caps,
        # /root/reference/main.py:148-156, so any drop during FITTING biases
        # gradients): fit_frame measures the required per-stream caps at the
        # dropped frame's geometry, rebuilds, and RE-RUNS the same frame so
        # no biased gradient is ever applied (VERDICT r3 item 1)
        self.n_dropped_last = 0
        self._drop_warned = False
        self._k_bumps = 0  # CONSECUTIVE failed rebuilds (resets on success)
        self._total_rebuilds = 0  # monotonic (bench recompile detection)
        self._max_cap_rebuilds = 6

    # --- setup per optimization iteration (parity extra.py:177-190) ---

    def reset_state(self) -> MPMState:
        xyz_w = self.scene.xyz
        cov_w = self.scene.get_covariance()
        g_xyz, self.pos_center, self.scaling = world2grid(
            xyz_w, self.mpm_cfg.grid_extent, pad=self.fit_cfg.world_pad
        )
        g_cov = cov_w * (self.scaling * self.scaling)
        vol = particle_volume(g_xyz, self.mpm_cfg.n_grid, self.mpm_cfg.grid_extent)
        state = init_state(g_xyz, g_cov, vol, self.mpm_cfg, self.init_velocity)
        if self._pad_mult > 1:
            from gsmpm_tpu.parallel.mesh import pad_state

            state = pad_state(state, self._pad_mult)
        self.bcs = BCSet(grid_ops=(StickyGroundBC(),))  # parity extra.py:190
        return state

    def _padded_appearance(self):
        """(opacity, features) padded to the (possibly padded) model size —
        opacity 0 fillers contribute nothing to blending."""
        opacity = self.scene.get_opacity().reshape(-1)
        features = self.scene.get_features()
        k = self.model.logE.shape[0] - opacity.shape[0]
        if k > 0:
            opacity = jnp.concatenate([opacity, jnp.zeros((k,), opacity.dtype)])
            features = jnp.concatenate(
                [features, jnp.zeros((k,) + features.shape[1:], features.dtype)]
            )
        return opacity, features

    # --- the differentiable frame ---

    def _build_sharded_frame_fn(self, camera: Camera):
        """Mesh mode: the fully sharded fit step (parallel/sharded.py) —
        particles over the data axis, pixel rows over the tile axis,
        gradients psum'd, SGD applied inside the compiled step."""
        from gsmpm_tpu.parallel.sharded import make_sharded_fit_step

        fcfg = self.fit_cfg
        opacity, features = self._padded_appearance()
        state_ex = self.reset_state()
        self._sharded_fn = make_sharded_fit_step(
            self.mesh, state_ex, self.model, self.bcs, self.grid,
            fcfg.frame_dt, fcfg.substeps_per_frame, camera, self.bg,
            opacity, features, self.scene.sh_degree,
            jnp.asarray(self.scaling), jnp.asarray(self.pos_center),
            self.mpm_cfg.grid_extent,
            lr_logE=fcfg.lr_logE, lr_y=fcfg.lr_y, grad_clip=fcfg.grad_clip,
            data_axis=self.data_axis, tile_axis=self.tile_axis,
            tie_params=fcfg.tie_params, rcfg=self.raster_cfg,
            sim_engine=getattr(self, "_sharded_sim_engine", "auto"),
        )

    def _world_geometry(self, state):
        """(xyz_w, cov_w) of a post-substep state — the render geometry."""
        F = state.F
        cov6 = upper_from_mat(
            F @ mat_from_upper(state.init_cov) @ jnp.swapaxes(F, -1, -2)
        )
        return grid2world(
            state.x, cov6, self.scaling, self.pos_center,
            self.mpm_cfg.grid_extent,
        )

    def _measure_and_bump(self, state, camera: Camera) -> None:
        """Resize the rasterizer caps from the measured maxima at the
        dropped frame's end-of-frame geometry (the geometry the render
        that overflowed actually saw), +25-50% headroom.  Stream configs
        bump the tier gaussian budgets; windowed configs bump the two-tier
        K caps (pallas) and k_row/k_block (XLA on CPU) — the shared
        renderer.bump_caps_for_dropfree policy (ADVICE r4 sized n_dense
        from the measured over-cap tile count).  The measurement is exact
        for that frame, so the re-run is drop-free; the headroom absorbs
        growth over later frames."""
        from gsmpm_tpu.render.renderer import bump_caps_for_dropfree

        xyz_w, cov_w = self._world_geometry(state)
        opacity, _ = self._padded_appearance()
        cfg = self.raster_cfg
        new = bump_caps_for_dropfree(cfg, xyz_w, cov_w, opacity, camera)
        if cfg.stream:
            print(
                "fitting: resizing rasterizer tier budgets for a drop-free "
                f"render (g2/g3/g4 {cfg.stream_g2}/{cfg.stream_g3}/"
                f"{cfg.stream_g4} -> {new.stream_g2}/{new.stream_g3}/"
                f"{new.stream_g4}); re-running the frame"
            )
        else:
            print(
                "fitting: resizing rasterizer caps for a drop-free render "
                f"(k_dense {cfg.k_dense}->{new.k_dense}, n_dense "
                f"{cfg.n_dense}->{new.n_dense}, k_row {cfg.k_row}->"
                f"{new.k_row}, k_block {cfg.k_block}->{new.k_block}); "
                "re-running the frame"
            )
        self.raster_cfg = new
        self._k_bumps += 1
        self._total_rebuilds += 1

    def _fit_frame_sharded(self, state, t, camera: Camera, gt_image):
        opacity, features = self._padded_appearance()
        while True:
            if getattr(self, "_sharded_fn", None) is None:
                self._build_sharded_frame_fn(camera)
            with self.mesh:
                (loss, logE, y, state2, t2, img, n_dropped, sim_ok) = (
                    self._sharded_fn(
                        self.model.logE, self.model.y, state, t, gt_image,
                        camera, opacity, features,
                        jnp.asarray(self.scaling),
                        jnp.asarray(self.pos_center),
                    )
                )
            if not bool(sim_ok):
                # tiled-VJP engine overflow on some shard: permanently fall
                # back to the XLA planes engine and re-run this frame
                print(
                    "fitting: sharded tiled-VJP sim engine overflow — "
                    "falling back to the XLA planes engine"
                )
                self._sharded_sim_engine = "xla"
                self._sharded_fn = None
                continue
            self.n_dropped_last = int(n_dropped)
            if self.n_dropped_last == 0:
                # the budget bounds CONSECUTIVE failed rebuilds, not total
                # rebuilds per run: a drop-free frame restores it so later
                # overflowing frames still get their resize (ADVICE r4)
                self._k_bumps = 0
                break
            if self._k_bumps >= self._max_cap_rebuilds:
                break
            # discard the biased update entirely; resize caps and re-run the
            # SAME frame from the original (logE, y, state, t)
            self._measure_and_bump(state2, camera)
            self._sharded_fn = None
        if self.n_dropped_last and not self._drop_warned:
            print(
                f"WARNING: fitting render still dropped {self.n_dropped_last} "
                f"candidates after {self._k_bumps} cap rebuilds — gradients "
                "are biased against a truncated image"
            )
            self._drop_warned = True
        mu, lam = mu_lam_from_logE_y(logE, y)
        self.model = dataclasses.replace(
            self.model, logE=logE, y=y, mu=mu, lam=lam
        )
        return loss, state2, t2, img

    def _build_frame_fn(self):
        mpm, grid, fcfg = self.mpm_cfg, self.grid, self.fit_cfg
        dt = fcfg.frame_dt / fcfg.substeps_per_frame
        n_sub = fcfg.substeps_per_frame
        bcs = self.bcs
        bg, rcfg = self.bg, self.raster_cfg
        sh_degree = self.scene.sh_degree
        base_model = self.model
        use_vjp = getattr(self, "_sim_engine", None) or (
            "tiled_vjp" if jax.default_backend() == "tpu" else "xla"
        )
        self._sim_engine = use_vjp

        # opacity/features are traced args, not closure constants: the
        # frame-0 appearance Adam (extra.py:198-203) updates them between
        # physics frames and must be visible here without a recompile
        def frame_loss(logE, y, state, t, camera, gt, scaling, pos_center,
                       opacity, features):
            mu, lam = mu_lam_from_logE_y(logE, y)
            model = dataclasses.replace(base_model, logE=logE, y=y, mu=mu, lam=lam)
            if use_vjp == "tiled_vjp":
                # the hand-written transfer VJPs (sim/transfer_vjp.py):
                # forward AND adjoint run the fused Pallas kernels — 3.1x
                # the XLA planes adjoint at reference scale (BASELINE.md).
                # ok=False (tile-cap overflow / drift past the fixed
                # bucketing's safe window) falls back to the XLA engine
                # for the run (fit_frame re-runs the frame).
                from gsmpm_tpu.sim.kernels import (
                    soa_from_state, state_from_soa,
                )
                from gsmpm_tpu.sim.tiles import run_substeps_tiled_fitting

                soa, t, ok = run_substeps_tiled_fitting(
                    soa_from_state(state), model, bcs, t, n_sub, grid, dt,
                    chunk_impl="vjp",
                )
                state = state_from_soa(soa)
            else:
                state, t = run_substeps(
                    state, model, bcs, t, n_sub, grid, dt,
                    fitting=True, checkpoint_policy="substep",
                )
                ok = jnp.asarray(True)
            # postprocess_forward parity: cov from F at the final substep
            # (/root/reference/mpm_solver/utils.py:435-467)
            F = state.F
            cov6 = upper_from_mat(
                F @ mat_from_upper(state.init_cov) @ jnp.swapaxes(F, -1, -2)
            )
            xyz_w, cov_w = grid2world(
                state.x, cov6, scaling, pos_center, mpm.grid_extent
            )
            img, n_dropped = render_with_aux(
                xyz_w, cov_w, opacity, features, camera, bg, sh_degree, rcfg
            )
            loss = photometric_loss(img, gt)
            return loss, (state, t, img, n_dropped, ok)

        self._frame_fn = jax.jit(
            jax.value_and_grad(frame_loss, argnums=(0, 1), has_aux=True)
        )

    def fit_frame(self, state, t, camera: Camera, gt_image):
        """One observed frame: forward 30 substeps + render, backward, SGD.

        Returns (loss, new_state, new_t, rendered_image); updates self.model's
        logE/y in place (functional replace).
        """
        if self.mesh is not None:
            return self._fit_frame_sharded(state, t, camera, gt_image)
        while True:
            if self._frame_fn is None:
                self._build_frame_fn()
            (loss, (state2, t2, img, n_dropped, sim_ok)), (g_logE, g_y) = \
                self._frame_fn(
                    self.model.logE, self.model.y, state, t, camera, gt_image,
                    self.scaling, self.pos_center,
                    self.scene.get_opacity().reshape(-1),
                    self.scene.get_features(),
                )
            if not bool(sim_ok):
                # tiled-VJP engine overflowed its caps (dense scene or long
                # drift): permanently fall back to the XLA fitting engine
                # and re-run this frame
                print(
                    "fitting: tiled-VJP sim engine overflow — falling back "
                    "to the XLA planes engine"
                )
                self._sim_engine = "xla"
                self._frame_fn = None
                continue
            self.n_dropped_last = int(n_dropped)
            if self.n_dropped_last == 0:
                self._k_bumps = 0  # see _fit_frame_sharded: consecutive budget
                break
            if self._k_bumps >= self._max_cap_rebuilds:
                break
            # drop-free or nothing: size the caps from the measured maxima at
            # the overflowing geometry, rebuild, and re-run the SAME frame —
            # the truncated gradient is never applied
            self._measure_and_bump(state2, camera)
            self._frame_fn = None
        if self.n_dropped_last and not self._drop_warned:
            print(
                f"WARNING: fitting render still dropped {self.n_dropped_last} "
                f"candidates after {self._k_bumps} cap rebuilds — gradients "
                "are biased against a truncated image"
            )
            self._drop_warned = True
        logE, y = sgd_learn(self.model.logE, self.model.y, g_logE, g_y, self.fit_cfg)
        mu, lam = mu_lam_from_logE_y(logE, y)
        self.model = dataclasses.replace(self.model, logE=logE, y=y, mu=mu, lam=lam)
        return loss, state2, t2, img

    # --- readout (parity extra.py:248-249) ---

    @property
    def optimized_E(self) -> float:
        # slice off mesh padding (inert fillers carry logE=4.0)
        return float(10.0 ** self.model.logE[: self.n_orig].mean())

    @property
    def optimized_nu(self) -> float:
        y_mean = float(self.model.y[: self.n_orig].mean())
        return float(0.49 / (1.0 + np.exp(-y_mean)))

    # --- ground-truth generation (the repo ships no data_extra assets;
    #     GT comes from simulating with known E*, nu* and rendering) ---

    def generate_ground_truth(
        self, E_true: float, nu_true: float, cameras: Sequence[Camera], n_frames: int
    ):
        from gsmpm_tpu.sim.state import logE_y_from_E_nu

        logE0, y0 = logE_y_from_E_nu(E_true, nu_true)
        n = self.model.logE.shape[0]  # includes mesh padding if any
        logE = jnp.full((n,), logE0, jnp.float32)
        y = jnp.full((n,), y0, jnp.float32)
        state = self.reset_state()
        if self._frame_fn is None:
            self._build_frame_fn()
        mu, lam = mu_lam_from_logE_y(logE, y)
        model = dataclasses.replace(self.model, logE=logE, y=y, mu=mu, lam=lam)
        mpm, grid, fcfg = self.mpm_cfg, self.grid, self.fit_cfg
        dt = fcfg.frame_dt / fcfg.substeps_per_frame

        def make_fns(rcfg):
            @jax.jit
            def gt_frame(state, t, camera):
                state, t = run_substeps(
                    state, model, self.bcs, t, fcfg.substeps_per_frame, grid,
                    dt, fitting=True, checkpoint_policy=None,
                )
                F = state.F
                cov6 = upper_from_mat(
                    F @ mat_from_upper(state.init_cov) @ jnp.swapaxes(F, -1, -2)
                )
                xyz_w, cov_w = grid2world(
                    state.x, cov6, self.scaling, self.pos_center,
                    mpm.grid_extent
                )
                opac, feats = self._padded_appearance()
                img, nd = render_with_aux(
                    xyz_w, cov_w, opac, feats,
                    camera, self.bg, self.scene.sh_degree, rcfg,
                )
                return state, t, img, nd

            @jax.jit
            def render_now(state, camera):
                F = state.F
                cov6 = upper_from_mat(
                    F @ mat_from_upper(state.init_cov) @ jnp.swapaxes(F, -1, -2)
                )
                xyz_w, cov_w = grid2world(
                    state.x, cov6, self.scaling, self.pos_center,
                    mpm.grid_extent
                )
                opac, feats = self._padded_appearance()
                img, nd = render_with_aux(
                    xyz_w, cov_w, opac, feats,
                    camera, self.bg, self.scene.sh_degree, rcfg,
                )
                return img, nd

            return gt_frame, render_now

        # frame 0 observes the initial configuration; frame f observes the
        # state after f*substeps_per_frame substeps.  GT must be drop-free
        # too (the observations the fit targets are uncapped in the
        # reference): on any overflow, resize caps and regenerate.
        for _ in range(3):
            gt_frame, render_now = make_fns(self.raster_cfg)
            img0, nd = render_now(state, cameras[0])
            frames = [img0]
            total_dropped = int(nd)
            st, t = state, jnp.float32(0.0)
            for fid in range(1, n_frames):
                cam = cameras[fid % len(cameras)]
                st, t, img, nd = gt_frame(st, t, cam)
                frames.append(img)
                total_dropped += int(nd)
            if total_dropped == 0:
                self._k_bumps = 0  # consecutive-failure budget (ADVICE r4)
                break
            if self._k_bumps >= self._max_cap_rebuilds:
                break
            self._measure_and_bump(st, cameras[(n_frames - 1) % len(cameras)])
            self._frame_fn = None
        if total_dropped:
            print(
                f"WARNING: ground-truth render dropped {total_dropped} "
                "candidates over the rasterizer caps"
            )
        return frames

    # --- frame-0 appearance refinement (parity extra.py:198-203,308-316) ---

    def make_appearance_optimizer(self, spatial_lr_scale: float = 1.0):
        """Adam over raw gaussian params with the reference's per-group lrs."""
        import optax

        lrs = {
            "xyz": 0.0000016 * spatial_lr_scale,
            "features_dc": 0.0025,
            "features_rest": 0.0025 / 20.0,
            "opacity": 0.05,
            "scaling": 0.005,
        }

        def label_fn(params):
            return {k: k for k in params}

        tx = optax.multi_transform(
            {k: optax.adam(lr, eps=1e-15) for k, lr in lrs.items()}, label_fn
        )
        params = {
            "xyz": self.scene.xyz,
            "features_dc": self.scene.features_dc,
            "features_rest": self.scene.features_rest,
            "opacity": self.scene.opacity,
            "scaling": self.scene.scaling,
        }
        return tx, params, tx.init(params)

    def appearance_step(self, tx, params, opt_state, camera: Camera, gt_image):
        """One Adam step on appearance from the frame-0 observation."""
        if getattr(self, "_appearance_fn", None) is None:
            import optax

            rotation = self.scene.rotation
            sh_degree = self.scene.sh_degree
            bg, rcfg = self.bg, self.raster_cfg

            def loss_fn(p, camera, gt_image):
                sc = GaussianScene(
                    xyz=p["xyz"],
                    features_dc=p["features_dc"],
                    features_rest=p["features_rest"],
                    opacity=p["opacity"],
                    scaling=p["scaling"],
                    rotation=rotation,
                    sh_degree=sh_degree,
                )
                img = render(
                    sc.xyz, sc.get_covariance(), sc.get_opacity().reshape(-1),
                    sc.get_features(), camera, bg, sh_degree, rcfg,
                )
                return photometric_loss(img, gt_image)

            def step(params, opt_state, camera, gt_image):
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, camera, gt_image
                )
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return loss, params, opt_state

            self._appearance_fn = jax.jit(step)

        loss, params, opt_state = self._appearance_fn(
            params, opt_state, camera, gt_image
        )
        self.scene = dataclasses.replace(
            self.scene,
            xyz=params["xyz"],
            features_dc=params["features_dc"],
            features_rest=params["features_rest"],
            opacity=params["opacity"],
            scaling=params["scaling"],
        )
        return loss, params, opt_state
