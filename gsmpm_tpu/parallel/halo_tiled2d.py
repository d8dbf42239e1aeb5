"""2-D (x, y) tile-slab halo decomposition with the tiled MXU transfer.

VERDICT r4 item 6: the 1-D x-slab engine (parallel/halo_tiled.py) needs
>= 2 x-tiles per device, capping an n_grid=128 run at 8 devices and
punting pancake/narrow scenes to psum.  This module decomposes over a
2-D device mesh ("hx", "hy"): device (ix, iy) owns the tile RECTANGLE
[txs[ix], txs[ix+1]) x [tys[iy], tys[iy+1]), so a 128^3 grid scales to
64 devices (8 x 8) and each axis only needs 2 tiles per mesh dimension.
Matches SURVEY §2.3 "shard grid into blocks across mesh axes".

Everything is the 1-D machinery applied dimension-by-dimension:

- P2G accumulation: _exchange_accum_tiles along "hx" (array axis 0), then
  along "hy" (axis 1).  Corner (diagonal) contributions ride two hops —
  exact, because the x-pass moves them into the correct x-range and the
  accumulation is linear.
- Grid velocities: mask to the owned rectangle (both axes' ownership
  predicates, with the last device on each axis owning the extra padded
  tile), then _fetch_edges_stacked along "hx" and "hy"; the y-pass slabs
  span the full x-range, so corner velocity tiles fetched in the x-pass
  ride through to diagonal neighbors.
- Migration: halo.py's neighbor exchange run twice — along "hx" keyed on
  the x coordinate, then along "hy" keyed on y (the generalized ``coord``
  parameter).  A diagonal emigrant reaches its owner in two hops; the
  margin (one tile per segment) bounds drift exactly as in 1-D.

Per-substep comm: 2 axes x (accum 2*W*T*T*2048 + edges 3*2*W*T*T*512) f32
— ~2x the 1-D volume at the same T, but the engine exists for shapes the
1-D scheme cannot serve at all, and the volume stays independent of the
device count (vs the psum engines' O(G^3) growth).

Equivalence vs the single-device dense path is pinned on a 4x2 8-virtual-
device CPU mesh in tests/test_halo_tiled2d.py, including through the
apps/simulate door (--mesh engine=halo_tiled2d).
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
    _DEAD_F,
    HaloConfig,
    _device_of,
    _soa_spec,
    migrate_neighbor_slots,
)
from gsmpm_tpu.parallel.halo_tiled import (
    _W,
    _exchange_accum_tiles,
    _fetch_edges_stacked,
    _own_mask_stacked,
)
from gsmpm_tpu.sim.kernels import SoAState, soa_from_state
from gsmpm_tpu.sim.state import GridConfig, MPMModel
from gsmpm_tpu.sim.tiles import (
    T_TILE,
    TileConfig,
    bootstrap,
    substep_tiled,
    to_original_order,
    unpack_q,
)


def _axis_quantile_starts(coord: np.ndarray, nt: int, inv_dx: float,
                          ndev: int) -> Optional[np.ndarray]:
    """Equal-count quantile tile starts along one coordinate (the 1-D
    quantile_tile_starts core, reusable per axis)."""
    tiles = np.clip(
        (coord * inv_dx).astype(np.int64) // T_TILE, 0, nt - 1
    )
    qs = np.quantile(tiles, np.linspace(0.0, 1.0, ndev + 1))
    starts = np.round(qs).astype(np.int64)
    starts[0], starts[-1] = 0, nt
    for d in range(1, ndev):
        starts[d] = max(starts[d], starts[d - 1] + 2)
    for d in range(ndev - 1, 0, -1):
        starts[d] = min(starts[d], starts[d + 1] - 2)
    if (np.diff(starts) < 2).any():
        return None
    return starts


def quantile_tile_starts_2d(
    xy: np.ndarray, n_grid: int, grid_extent: float, dx: int, dy: int,
    cap_slack: float = 1.5,
):
    """(x, y) quantile tile rectangles for a dx x dy device mesh.

    Returns (txs, tys, hc2, tc) or None when either axis cannot give every
    mesh row/column >= 2 tiles.  hc2.cap is the per-DEVICE slot count
    (dx*dy devices)."""
    nt = -(-n_grid // T_TILE)
    if nt < 2 * dx or nt < 2 * dy:
        return None
    xy = np.asarray(xy)
    n = xy.shape[0]
    inv_dx = n_grid / grid_extent
    txs = _axis_quantile_starts(xy[:, 0], nt, inv_dx, dx)
    tys = _axis_quantile_starts(xy[:, 1], nt, inv_dx, dy)
    if txs is None or tys is None:
        return None
    ndev = dx * dy
    # cap from the ACTUAL rectangle occupancy, not n/ndev: tile-snapped
    # quantiles on a coarse tile grid are structurally imbalanced for
    # concentrated scenes (a centered box occupies ~2 of 8 tiles, so the
    # middle rectangles hold most particles)
    tilex = np.clip((xy[:, 0] * inv_dx).astype(np.int64) // T_TILE,
                    0, nt - 1)
    tiley = np.clip((xy[:, 1] * inv_dx).astype(np.int64) // T_TILE,
                    0, nt - 1)
    devx = np.searchsorted(txs[1:-1], tilex, side="right")
    devy = np.searchsorted(tys[1:-1], tiley, side="right")
    counts = np.bincount(devx * dy + devy, minlength=ndev)
    cap = int(max(128, -(-int(counts.max() * cap_slack) // 128) * 128))
    hc2 = HaloConfig(ndev=ndev, n_grid=n_grid, cap=cap, margin=T_TILE)
    max_wx = int(np.diff(txs).max())
    max_wy = int(np.diff(tys).max())
    occ_cap = min(
        nt ** 3, (max_wx + 2) * (max_wy + 2) * nt,
        max(256, 4 * (-(-cap // 256))),
    )
    tc = TileConfig(n_grid, cap, S=256, n_occ_cap=occ_cap)
    return (tuple(int(s) for s in txs), tuple(int(s) for s in tys),
            hc2, tc)


def partition_slots_2d(
    soa: SoAState, aux, material, orig, cell_xs, cell_ys,
    grid: GridConfig, hc2: HaloConfig, dx: int, dy: int,
):
    """Repartition slots into per-RECTANGLE segments (device (ix, iy) owns
    segment ix*dy + iy — the row-major order a ("hx", "hy") mesh shards a
    leading axis in).  Same protocol as halo.partition_slots; dead slots
    park at the rectangle center."""
    n_slots = soa.mass.shape[0]
    live_in = orig >= 0
    hx = HaloConfig(ndev=dx, n_grid=hc2.n_grid, cap=hc2.cap,
                    margin=hc2.margin)
    hy = HaloConfig(ndev=dy, n_grid=hc2.n_grid, cap=hc2.cap,
                    margin=hc2.margin)
    devx = _device_of(soa.x[0], cell_xs, grid, hx)
    devy = _device_of(soa.x[1], cell_ys, grid, hy)
    ndev = dx * dy
    dev = jnp.where(live_in, devx * dy + devy, ndev)

    order = jnp.argsort(dev, stable=True)
    counts = jnp.sum(
        dev[:, None] == jnp.arange(ndev, dtype=jnp.int32)[None, :], axis=0
    )
    seg_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )
    ok = jnp.all(counts <= hc2.cap)

    d_ids = jnp.repeat(jnp.arange(ndev, dtype=jnp.int32), hc2.cap)
    s_ids = jnp.tile(jnp.arange(hc2.cap, dtype=jnp.int32), ndev)
    live = s_ids < counts[d_ids]
    src = order[jnp.clip(seg_start[d_ids] + s_ids, 0, n_slots - 1)]

    ix = d_ids // dy
    iy = d_ids % dy
    x_mid = (cell_xs[ix] + cell_xs[ix + 1]).astype(jnp.float32) * 0.5 * grid.dx
    y_mid = (cell_ys[iy] + cell_ys[iy + 1]).astype(jnp.float32) * 0.5 * grid.dx
    z_mid = jnp.float32(0.5 * hc2.n_grid * grid.dx)

    def take(plane, dead):
        return jnp.where(live, plane[src], dead)

    out = SoAState(
        x=(
            jnp.where(live, soa.x[0][src], x_mid),
            jnp.where(live, soa.x[1][src], y_mid),
            take(soa.x[2], z_mid),
        ),
        v=tuple(take(p, 0.0) for p in soa.v),
        F=tuple(take(p, d) for p, d in zip(soa.F, _DEAD_F)),
        F_trial=tuple(take(p, d) for p, d in zip(soa.F_trial, _DEAD_F)),
        C=tuple(take(p, 0.0) for p in soa.C),
        vol=take(soa.vol, 0.0),
        density=take(soa.density, 0.0),
        mass=take(soa.mass, 0.0),
        init_cov=tuple(take(p, 0.0) for p in soa.init_cov),
        cov=tuple(take(p, 0.0) for p in soa.cov),
        yield_stress=take(soa.yield_stress, 0.0),
    )
    aux_out = jnp.stack([take(aux[r], 0.0) for r in range(aux.shape[0])])
    material_out = jnp.where(live, material[src], 0)
    orig_out = jnp.where(live, orig[src], -1)
    return out, aux_out, material_out, orig_out, ok


def bootstrap_slots_2d(state, model: MPMModel, txs, tys, grid, hc2,
                       dx: int, dy: int):
    """Original-order state -> initial 2-D partitioned slot arrays."""
    soa = state if isinstance(state, SoAState) else soa_from_state(state)
    n = soa.mass.shape[0]
    aux = jnp.stack([model.mu, model.lam, model.viscosity])
    orig = jnp.arange(n, dtype=jnp.int32)
    cell_xs = jnp.minimum(
        jnp.asarray(txs, jnp.int32) * T_TILE, hc2.n_grid
    )
    cell_ys = jnp.minimum(
        jnp.asarray(tys, jnp.int32) * T_TILE, hc2.n_grid
    )
    return partition_slots_2d(
        soa, aux, model.material.astype(jnp.int32), orig,
        cell_xs, cell_ys, grid, hc2, dx, dy,
    )


def make_halo_tiled2d_frame(
    mesh: Mesh,
    ax_x: str,
    ax_y: str,
    bcs,
    grid: GridConfig,
    hc2: HaloConfig,
    tc: TileConfig,
    dt: float,
    n_substeps: int,
    migrate_every: int = 10,
    impl: str = "ref",
):
    """Sharded frame over the ("hx", "hy") rectangle decomposition.

    (soa, aux, material, orig, txs, tys, model, time) ->
    (soa', aux', material', orig', full_soa_original_order, time', ok)

    Same slot protocol as halo_tiled.make_halo_tiled_frame, with every
    exchange and migration run once per mesh axis.
    """
    dx = mesh.shape[ax_x]
    dy = mesh.shape[ax_y]
    hx = HaloConfig(ndev=dx, n_grid=hc2.n_grid, cap=hc2.cap,
                    margin=hc2.margin)
    hy = HaloConfig(ndev=dy, n_grid=hc2.n_grid, cap=hc2.cap,
                    margin=hc2.margin)

    def frame_local(soa, aux, material, orig, txs, tys, model_g, time):
        ix = jax.lax.axis_index(ax_x)
        iy = jax.lax.axis_index(ax_y)
        tx0, tx1 = txs[ix], txs[ix + 1]
        ty0, ty1 = tys[iy], tys[iy + 1]
        cell_xs = jnp.minimum(txs * T_TILE, hc2.n_grid)
        cell_ys = jnp.minimum(tys * T_TILE, hc2.n_grid)

        def migrate(soa, aux, material, orig):
            soa, aux, material, orig, ok1 = migrate_neighbor_slots(
                soa, aux, material, orig, cell_xs, grid, hx, ax_x, coord=0
            )
            soa, aux, material, orig, ok2 = migrate_neighbor_slots(
                soa, aux, material, orig, cell_ys, grid, hy, ax_y, coord=1
            )
            return soa, aux, material, orig, ok1 & ok2

        def drift_ok(soa, orig):
            tx = jnp.floor(
                soa.x[0] * grid.inv_dx
            ).astype(jnp.int32) // T_TILE
            ty = jnp.floor(
                soa.x[1] * grid.inv_dx
            ).astype(jnp.int32) // T_TILE
            bad = (orig >= 0) & (
                (tx < tx0 - 1) | (tx >= tx1 + 1)
                | (ty < ty0 - 1) | (ty >= ty1 + 1)
            )
            return jax.lax.psum(
                jnp.sum(bad.astype(jnp.int32)), (ax_x, ax_y)
            ) == 0

        n_seg = -(-n_substeps // migrate_every)
        seg_len = min(migrate_every, n_substeps)
        assert n_seg * seg_len == n_substeps, (
            "n_substeps must be a multiple of migrate_every")

        def grid_reduce(acc):
            acc = _exchange_accum_tiles(acc, tx0, tx1, ax_x, dx, adim=0)
            acc = _exchange_accum_tiles(acc, ty0, ty1, ax_y, dy, adim=1)
            return acc

        def grid_exchange(grid_v):
            gv = jnp.stack(grid_v)
            own = (
                _own_mask_stacked(gv, tx0, tx1, ax_x, dx, adim=0)
                & _own_mask_stacked(gv, ty0, ty1, ax_y, dy, adim=1)
            )
            gv = jnp.where(own, gv, 0.0)
            gv = _fetch_edges_stacked(gv, tx0, tx1, ax_x, dx, adim=0)
            gv = _fetch_edges_stacked(gv, ty0, ty1, ax_y, dy, adim=1)
            return tuple(gv[r] for r in range(3))

        def seg_body(carry, _):
            soa, aux_l, mat_l, orig_l, time, ok = carry
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
            q = to_original_order(ts, soa.mass.shape[0])
            soa = unpack_q(q, soa)
            ok = ok & drift_ok(soa, orig_l)
            soa, aux_l, mat_l, orig_l, ok2 = migrate(
                soa, aux_l, mat_l, orig_l
            )
            return (soa, aux_l, mat_l, orig_l, time, ok & ok2), None

        (soa, aux, material, orig, time, ok), _ = jax.lax.scan(
            seg_body, (soa, aux, material, orig, time, jnp.asarray(True)),
            None, length=n_seg,
        )

        n_slots = dx * dy * hc2.cap
        idx = jnp.where(orig >= 0, orig, n_slots)

        def back(plane):
            return jax.lax.psum(
                jnp.zeros((n_slots + 1,), plane.dtype).at[idx].set(plane),
                (ax_x, ax_y),
            )

        full = jax.tree_util.tree_map(back, soa)
        return soa, aux, material, orig, full, time, ok

    both = (ax_x, ax_y)
    sspec = _soa_spec(both)
    return shard_map(
        frame_local,
        mesh=mesh,
        in_specs=(sspec, P(None, both), P(both), P(both), P(), P(), P(),
                  P()),
        out_specs=(sspec, P(None, both), P(both), P(both),
                   _soa_spec(None), P(), P()),
        check_vma=False,
    )
