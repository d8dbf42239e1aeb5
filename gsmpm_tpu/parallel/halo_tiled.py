"""x-slab halo decomposition COMPOSED with the tiled MXU transfer.

VERDICT r3 item 3 of the "missing" list / item 4 of the do-list: the repo had
a comm-optimal engine (parallel/halo.py — x-slab ownership, ppermute strips,
neighbor migration, but XLA-planes local compute) and a compute-optimal
engine (parallel/tiled_sharded.py — Pallas separable-matmul transfer, but a
full blocked-grid psum).  This module joins the two halves: each device owns
a slab of whole 8-cell x-TILES, runs the tiled transfer
(sim/tiles.py:substep_tiled, impl="pallas" on TPU) on its own particles, and
exchanges only boundary x-tile slabs of the blocked grid with its two slab
neighbors over ICI.

Decomposition (tile granularity, vs halo.py's cell granularity):

- Slab boundaries are equal-particle-count x-quantiles SNAPPED TO TILES
  (quantile_tile_starts); every slab is >= 2 tiles wide, so the scheme needs
  nt >= 2*ndev tiles along x (n_grid >= 16*ndev).  Narrower grids keep using
  halo.py (cell slabs, XLA compute) or the psum engines.
- Particle slots, capacity padding, and migration REUSE halo.py wholesale
  (partition_slots / migrate_neighbor_slots / migrate_gathered_slots) with
  starts expressed in cells (= 8 * tile starts).
- Per substep, in substep_tiled's grid_reduce hook: after the local fold,
  device i's blocked accumulation (T,T,T,32,64) is nonzero only on padded
  x-tiles [t0-1, t1+1) (its particles' windows + <= 1 tile of drift).  It
  sends the W=2-tile slabs beyond each boundary to the owning neighbor
  (ppermute) which adds them in.  After the grid update + BCs, in the
  grid_exchange hook, non-owned x-tiles are zeroed and the owner-computed
  boundary velocity tile-slabs are fetched the same way.
- Per-substep comm (MEASURED from the compiled HLO's collective ops,
  scripts/comm_audit.py, matching the analytic count): at n_grid=128
  (nt=16, T=17), W=2:
      accum  2 dirs x (2,T,T,32,64) slabs = 2*2*17^2*2048*4 B =  9.5 MB
      edges  2 dirs x (3,2,T,T,8,64)      = 2*3*2*17^2*512*4 B =  7.1 MB
      migration buffers (every migrate_every substeps)         ~  0.3 MB
      total ~ 16.9 MB/substep
  vs the tiled_sharded full-grid psum at the same shape: 77 MB/substep of
  ring traffic at 8 devices (audited) — and the halo volume is INDEPENDENT
  of device count while psum traffic grows with it.  (halo.py's cell-width
  strips are ~3.5x smaller still (4.9 MB at G=128), but its local compute
  is the scatter/gather XLA path; this engine trades comm granularity for
  the MXU transfer.)

Degenerate scenes (x-extent < 2 tiles/device) return None from
quantile_tile_starts; MeshSimEngine falls back (tiled -> psum), mirroring
halo.py.

Equivalence vs the single-device dense path is pinned on the 8-virtual-
device CPU mesh in tests/test_halo_tiled.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.32 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from gsmpm_tpu.parallel.halo import (
    HaloConfig,
    _soa_spec,
    bootstrap_slots,
    migrate_gathered_slots,
    migrate_neighbor_slots,
    partition_slots,
)
from gsmpm_tpu.sim.kernels import SoAState
from gsmpm_tpu.sim.state import GridConfig, MPMModel
from gsmpm_tpu.sim.tiles import (
    T_TILE,
    TileConfig,
    bootstrap,
    substep_tiled,
    to_original_order,
    unpack_q,
)

_W = 2  # exchanged x-tile slab width per direction (covers window + drift)


def quantile_tile_starts(
    x: np.ndarray, n_grid: int, grid_extent: float, ndev: int,
    cap_slack: float = 1.5,
) -> Optional[Tuple[Tuple[int, ...], HaloConfig, TileConfig]]:
    """Equal-count x-quantile slab boundaries snapped to 8-cell TILES.

    Returns (tile_starts, halo_cfg, tile_cfg) or None when the grid/scene
    cannot give every device >= 2 tiles.  halo_cfg.margin is a full tile
    (8 cells): migration cadence tolerates up to one tile of drift, matching
    the W=2 exchange width.
    """
    nt = -(-n_grid // T_TILE)
    if nt < 2 * ndev:
        return None
    x = np.asarray(x)
    n = x.shape[0]
    inv_dx = n_grid / grid_extent
    tiles = np.clip(
        (x * inv_dx).astype(np.int64) // T_TILE, 0, nt - 1
    )
    qs = np.quantile(tiles, np.linspace(0.0, 1.0, ndev + 1))
    starts = np.round(qs).astype(np.int64)
    starts[0], starts[-1] = 0, nt
    # redistribute to >= 2 tiles/slab: forward push up, then backward push
    # down — a scene concentrated in a sub-range of x (common after the
    # world2grid AABB fit) still yields valid slabs, just with lighter
    # edge devices
    for d in range(1, ndev):
        starts[d] = max(starts[d], starts[d - 1] + 2)
    for d in range(ndev - 1, 0, -1):
        starts[d] = min(starts[d], starts[d + 1] - 2)
    if (np.diff(starts) < 2).any():
        return None
    cap = int(-(-int(n * cap_slack) // (128 * ndev)) * 128)
    hc = HaloConfig(ndev=ndev, n_grid=n_grid, cap=cap, margin=T_TILE)
    # per-device OCCUPIED-tile budget: geometric bound (slab + one
    # drift/window tile each side) intersected with a particle-derived
    # bound a la default_tile_config — runtime overflow trips ts.ok and the
    # caller falls back, so a tight cap costs correctness nothing
    max_w = int(np.diff(starts).max())
    occ_cap = min(
        nt ** 3, (max_w + 2) * nt * nt,
        max(256, 4 * (-(-hc.cap // 256))),
    )
    tc = TileConfig(n_grid, hc.cap, S=256, n_occ_cap=occ_cap)
    return tuple(int(s) for s in starts), hc, tc


def _exchange_accum_tiles(acc, t0, t1, axis_name: str, ndev: int,
                          adim: int = 0):
    """P2G phase: route boundary tile-slab CONTRIBUTIONS to their owner.

    acc (T,T,T,32,64), axis ``adim`` = padded tile axis being decomposed
    (0 = x, 1 = y).  Device i's particles (own slab +- 1 tile of drift)
    contribute to padded tiles [t0-1, t1+1) along that axis; the W-wide
    slabs outside the owned range [t0, t1) go to the neighbors, who add
    them in place (same protocol as halo.py:_exchange_accum, in tile units
    on the blocked layout — no relayout, pure dynamic slices).  The 2-D
    decomposition (halo_tiled2d) runs this once per mesh axis: the x-pass
    moves diagonal (corner) contributions into the correct x-range, the
    y-pass finishes the job — exact because the accumulation is linear.
    """
    T = acc.shape[adim]
    i = jax.lax.axis_index(axis_name)
    left_out = jax.lax.dynamic_slice_in_dim(
        acc, jnp.maximum(t0 - _W, 0), _W, axis=adim
    )
    right_out = jax.lax.dynamic_slice_in_dim(
        acc, jnp.minimum(t1, T - _W), _W, axis=adim
    )
    from_right = jax.lax.ppermute(
        left_out, axis_name, [(d, d - 1) for d in range(1, ndev)]
    )
    from_left = jax.lax.ppermute(
        right_out, axis_name, [(d, d + 1) for d in range(ndev - 1)]
    )
    recv_l = jnp.where(i > 0, 1.0, 0.0)
    recv_r = jnp.where(i < ndev - 1, 1.0, 0.0)

    def dyn_add(arr, strip, start):
        cur = jax.lax.dynamic_slice_in_dim(arr, start, _W, adim)
        return jax.lax.dynamic_update_slice_in_dim(
            arr, cur + strip, start, adim
        )

    acc = dyn_add(acc, from_left * recv_l, jnp.minimum(t0, T - _W))
    acc = dyn_add(acc, from_right * recv_r, jnp.maximum(t1 - _W, 0))
    return acc


def _fetch_edges_stacked(gv, t0, t1, axis_name: str, ndev: int,
                         adim: int = 0):
    """Send owned edge tile-slabs along one axis; neighbors add them in
    (adding into zeroed non-owned tiles is a copy).  gv (3,T,T,T,8,64);
    adim 0 = x tiles (array axis 1), 1 = y tiles (array axis 2).  In the
    2-D decomposition the y-pass slab spans the full x-range, so velocity
    tiles fetched during the x-pass ride through to diagonal neighbors."""
    ax = 1 + adim
    T = gv.shape[ax]
    i = jax.lax.axis_index(axis_name)

    left_edge = jax.lax.dynamic_slice_in_dim(
        gv, jnp.minimum(t0, T - _W), _W, axis=ax
    )
    right_edge = jax.lax.dynamic_slice_in_dim(
        gv, jnp.maximum(t1 - _W, 0), _W, axis=ax
    )
    from_right = jax.lax.ppermute(
        left_edge, axis_name, [(d, d - 1) for d in range(1, ndev)]
    )
    from_left = jax.lax.ppermute(
        right_edge, axis_name, [(d, d + 1) for d in range(ndev - 1)]
    )
    recv_l = jnp.where(i > 0, 1.0, 0.0)
    recv_r = jnp.where(i < ndev - 1, 1.0, 0.0)

    def dyn_add(arr, strip, start):
        cur = jax.lax.dynamic_slice_in_dim(arr, start, _W, ax)
        return jax.lax.dynamic_update_slice_in_dim(
            arr, cur + strip, start, ax
        )

    gv = dyn_add(gv, from_left * recv_l, jnp.maximum(t0 - _W, 0))
    gv = dyn_add(gv, from_right * recv_r, jnp.minimum(t1, T - _W))
    return gv


def _own_mask_stacked(gv, t0, t1, axis_name: str, ndev: int, adim: int = 0):
    """Ownership predicate along one tile axis on the stacked (3,T,...)
    velocity planes.  The LAST padded tile (index nt) still holds real
    cells [g-4, g) (padded coord = cell + PAD_LO), so the last device's
    ownership extends one tile past its slab end."""
    ax = 1 + adim
    T = gv.shape[ax]
    shape = [1] * gv.ndim
    shape[ax] = T
    xt = jax.lax.broadcasted_iota(jnp.int32, tuple(shape), ax)
    i = jax.lax.axis_index(axis_name)
    t1_own = jnp.where(i == ndev - 1, t1 + 1, t1)
    return (xt >= t0) & (xt < t1_own)


def _exchange_edges_tiles(grid_v, t0, t1, axis_name: str, ndev: int):
    """G2P phase: mask non-owned x-tiles, fetch owner boundary velocities.

    grid_v: 3 planes (T,T,T,8,64).  Each device zeroes x-tiles outside its
    owned [t0, t1), then sends its owned edge slabs to the neighbors.
    """
    gv = jnp.stack(grid_v)  # (3,T,T,T,8,64)
    own = _own_mask_stacked(gv, t0, t1, axis_name, ndev, 0)
    gv = jnp.where(own, gv, 0.0)
    gv = _fetch_edges_stacked(gv, t0, t1, axis_name, ndev, 0)
    return tuple(gv[r] for r in range(3))


def bootstrap_slots_tiled(state, model: MPMModel, tile_starts, grid, hc):
    """halo.py bootstrap with starts given in tiles (cells = 8 * tiles)."""
    cell_starts = tuple(min(t * T_TILE, hc.n_grid) for t in tile_starts)
    return bootstrap_slots(state, model, cell_starts, grid, hc), cell_starts


def make_halo_tiled_frame(
    mesh: Mesh,
    axis: str,
    bcs,
    grid: GridConfig,
    hc: HaloConfig,
    tc: TileConfig,
    dt: float,
    n_substeps: int,
    migrate_every: int = 10,
    migration: str = "neighbor",
    impl: str = "ref",
):
    """Sharded frame: tiled MXU local substeps + x-tile-slab halo exchange.

    (soa, aux, material, orig, tile_starts, model, time) ->
    (soa', aux', material', orig', full_soa_original_order, time', ok)

    Same slot-array protocol as halo.py:make_halo_frame (sharded leading
    axis, replicated full view out), with the per-segment local compute
    re-bucketed into the tiled layout and run by substep_tiled — Pallas
    kernels on TPU (impl="pallas"), the einsum reference elsewhere.
    ok goes False on slab-capacity overflow, tile-cap overflow, or drift
    beyond one tile; the caller redoes the frame on the psum engine.
    """
    nd = hc.ndev
    assert migration in ("neighbor", "gathered"), migration

    def frame_local(soa, aux, material, orig, tstarts, model_g, time):
        i = jax.lax.axis_index(axis)
        t0 = tstarts[i]
        t1 = tstarts[i + 1]
        cell_starts = tstarts * T_TILE
        cell_starts = jnp.minimum(cell_starts, hc.n_grid)

        def migrate(soa, aux, material, orig):
            fn = (
                migrate_gathered_slots if migration == "gathered"
                else migrate_neighbor_slots
            )
            return fn(soa, aux, material, orig, cell_starts, grid, hc, axis)

        def drift_ok(soa, orig):
            tile = jnp.floor(
                soa.x[0] * grid.inv_dx
            ).astype(jnp.int32) // T_TILE
            bad = (orig >= 0) & ((tile < t0 - 1) | (tile >= t1 + 1))
            return jax.lax.psum(jnp.sum(bad.astype(jnp.int32)), axis) == 0

        n_seg = -(-n_substeps // migrate_every)
        seg_len = min(migrate_every, n_substeps)
        assert n_seg * seg_len == n_substeps, (
            "n_substeps must be a multiple of migrate_every")

        grid_reduce = lambda acc: _exchange_accum_tiles(acc, t0, t1, axis, nd)
        grid_exchange = lambda gv: _exchange_edges_tiles(gv, t0, t1, axis, nd)

        def seg_body(carry, _):
            soa, aux_l, mat_l, orig_l, time, ok = carry
            # local model view: per-slot material params ride in aux
            model_l = dataclasses.replace(
                model_g, mu=aux_l[0], lam=aux_l[1], viscosity=aux_l[2],
                material=mat_l,
            )
            ts = bootstrap(soa, model_l, grid, tc)
            ok = ok & ts.ok

            def substep(carry, _):
                ts, t = carry
                ts = substep_tiled(
                    ts, model_l, bcs, t, grid, tc, dt, impl=impl,
                    rebucket_on_drift=True,
                    grid_reduce=grid_reduce, grid_exchange=grid_exchange,
                )
                return (ts, t + dt), None

            (ts, time), _ = jax.lax.scan(
                substep, (ts, time), None, length=seg_len
            )
            ok = ok & ts.ok
            # back to slot order (orig_l unchanged by the tiled scan: the
            # tiled state's own `orig` maps its slots to SLOT indices here)
            q = to_original_order(ts, soa.mass.shape[0])
            soa = unpack_q(q, soa)
            ok = ok & drift_ok(soa, orig_l)
            soa, aux_l, mat_l, orig_l, ok2 = migrate(soa, aux_l, mat_l, orig_l)
            return (soa, aux_l, mat_l, orig_l, time, ok & ok2), None

        (soa, aux, material, orig, time, ok), _ = jax.lax.scan(
            seg_body, (soa, aux, material, orig, time, jnp.asarray(True)),
            None, length=n_seg,
        )

        # replicated original-order view (protocol of halo.py)
        n_slots = nd * hc.cap
        idx = jnp.where(orig >= 0, orig, n_slots)

        def back(plane):
            return jax.lax.psum(
                jnp.zeros((n_slots + 1,), plane.dtype).at[idx].set(plane),
                axis,
            )

        full = jax.tree_util.tree_map(back, soa)
        return soa, aux, material, orig, full, time, ok

    sspec = _soa_spec(axis)
    return shard_map(
        frame_local,
        mesh=mesh,
        in_specs=(sspec, P(None, axis), P(axis), P(axis), P(), P(), P()),
        out_specs=(sspec, P(None, axis), P(axis), P(axis),
                   _soa_spec(None), P(), P()),
        check_vma=False,
    )
