"""Spatially-decomposed multi-chip MPM: x-slab grid ownership + halo exchange.

The SURVEY §2.3 scaling design (VERDICT round-1 item #5): instead of
psum-ing the whole dense grid every substep (parallel/sharded.py — O(G^3)
bytes over ICI, ~32 MB/substep at the reference's 100^3 scenes,
/root/reference/configs/mic.json:14), the grid is decomposed into x-slabs
owned per device and only **halo strips** move:

- Slab boundaries are equal-particle-count x-quantiles of the initial
  particle distribution, snapped to grid cells (host-side,
  `quantile_slab_starts`) — load balance without the empty-edge-slab
  problem of uniform decomposition (scenes like lego concentrate all
  particles in the middle of the domain).
- Each device owns the particles inside its slab (plus a drift margin)
  and runs stress + P2G + grid update + G2P on them only.  The quadratic
  B-spline stencil writes cells base..base+2 with base within one cell of
  the particle, so with up to `margin` cells of drift between migrations
  every P2G write / G2P read stays within HX = margin + 3 cells of the
  slab.
- After local P2G, each device sends the HX-wide strip of (mass,
  momentum) contributions it produced inside each neighbor's territory
  with `jax.lax.ppermute` and the owner adds them in (`_exchange_accum`).
  After the grid update + BCs, each device zeroes the cells it does not
  own and receives the owner-computed boundary **velocities** the same
  way (`_exchange_edges`).  Per-substep communication is
      2 exchanges x 2 directions x HX * G^2 * {4,3} planes * 4 B
  = O(G^2 * HX)  (~4.5 MB/substep at G=100, HX=5), versus the psum
  engines' O(G^3) (~32 MB/substep at G=100) — the ratio grows with G.
- Particles migrate to their new owner via a gathered repartition every
  `migrate_every` substeps (same cadence pattern as the tiled engine's
  rebucket); a drift beyond `margin` cells inside a segment trips the
  `ok` flag so the caller can fall back / re-run with a shorter cadence.
  (Neighbor-only emigrant exchange — O(boundary) instead of the gathered
  O(N) — is the planned refinement; the grid halo exchange above is the
  per-substep win.)

Degenerate scenes (particles spanning fewer than ~(HX+1)*ndev x-cells)
cannot be sliced into valid slabs; `quantile_slab_starts` returns None and
callers fall back to the chunk-sharded psum engines
(parallel/sharded.py / parallel/tiled_sharded.py).

Tested for equivalence against the single-device dense path on an
8-device CPU mesh, including n_grid=100 (tests/test_halo.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gsmpm_tpu.ops import m33
from gsmpm_tpu.ops.constitutive import compute_stress_soa
from gsmpm_tpu.sim.kernels import (
    SoAState,
    g2p_soa,
    grid_update_soa,
    p2g_soa,
    soa_from_state,
)
from gsmpm_tpu.sim.state import GridConfig, MPMModel

try:  # jax >= 0.4.32 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


class HaloConfig(NamedTuple):
    """Static decomposition geometry (host-computed, baked into the jit)."""

    ndev: int
    n_grid: int
    cap: int        # particle slots per device (static)
    margin: int = 2  # drift cells tolerated between migrations

    @property
    def HX(self) -> int:
        return self.margin + 3

    @property
    def mcap(self) -> int:
        """Emigrant-buffer capacity per direction for neighbor migration
        (static; lane-aligned).  cap/8 slots covers any boundary layer the
        margin admits; overflow falls back to the gathered repartition."""
        return max(128, -(-self.cap // 8 // 128) * 128)


def quantile_slab_starts(
    x: np.ndarray, n_grid: int, grid_extent: float, ndev: int,
    margin: int = 2, cap_slack: float = 1.5,
) -> Optional[Tuple[Tuple[int, ...], HaloConfig]]:
    """Equal-count x-quantile slab boundaries snapped to cells.

    Returns (starts, cfg) with starts an (ndev+1,)-tuple of cell indices
    (starts[0] == 0, starts[-1] == n_grid, every width > HX), or None when
    the particle x-extent is too narrow for valid slabs (fall back to the
    psum engines then).
    """
    x = np.asarray(x)
    n = x.shape[0]
    inv_dx = n_grid / grid_extent
    cells = np.clip((np.asarray(x) * inv_dx).astype(np.int64), 0, n_grid - 1)
    qs = np.quantile(cells, np.linspace(0.0, 1.0, ndev + 1))
    starts = np.round(qs).astype(np.int64)
    starts[0], starts[-1] = 0, n_grid
    HX = margin + 3
    for d in range(1, ndev):
        starts[d] = max(starts[d], starts[d - 1] + HX + 1)
    if starts[ndev - 1] + HX + 1 > n_grid:
        return None
    widths = np.diff(starts)
    if (widths <= HX).any():
        return None
    cap = int(-(-int(n * cap_slack) // (128 * ndev)) * 128)
    cfg = HaloConfig(ndev=ndev, n_grid=n_grid, cap=cap, margin=margin)
    return tuple(int(s) for s in starts), cfg


# ---------------------------------------------------------------------------
# slot repartitioning (replicated computation; each device slices its range)
# ---------------------------------------------------------------------------

_DEAD_F = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


def _device_of(xp, starts, grid: GridConfig, hc: HaloConfig):
    cell = jnp.clip(
        jnp.floor(xp * grid.inv_dx).astype(jnp.int32), 0, hc.n_grid - 1
    )
    b = starts[1:-1]  # interior boundaries (ndev-1,)
    return jnp.sum(cell[:, None] >= b[None, :], axis=1).astype(jnp.int32)


def partition_slots(
    soa: SoAState, aux: jnp.ndarray, material: jnp.ndarray,
    orig: jnp.ndarray, starts: jnp.ndarray, grid: GridConfig, hc: HaloConfig,
    coord: int = 0,
):
    """Repartition arbitrary particle slots into per-device slab segments.

    Inputs are slot arrays of any length n_slots (dead slots: orig == -1).
    Returns (soa', aux', material', orig', ok) of length ndev*cap where
    slot d*cap+s holds the s-th live particle owned by device d, dead
    slots are parked at the slab center with zero mass, and ok is False
    when any device's live count exceeds cap.
    """
    n_slots = soa.mass.shape[0]
    live_in = orig >= 0
    dev = jnp.where(
        live_in, _device_of(soa.x[coord], starts, grid, hc), hc.ndev
    )
    order = jnp.argsort(dev, stable=True)
    counts = jnp.sum(
        dev[:, None] == jnp.arange(hc.ndev, dtype=jnp.int32)[None, :], axis=0
    )
    seg_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )
    ok = jnp.all(counts <= hc.cap)

    d_ids = jnp.repeat(jnp.arange(hc.ndev, dtype=jnp.int32), hc.cap)
    s_ids = jnp.tile(jnp.arange(hc.cap, dtype=jnp.int32), hc.ndev)
    live = s_ids < counts[d_ids]
    src = order[jnp.clip(seg_start[d_ids] + s_ids, 0, n_slots - 1)]

    slab_mid = (
        (starts[d_ids] + starts[d_ids + 1]).astype(jnp.float32)
        * 0.5 * grid.dx
    )
    mid_yz = jnp.float32(0.5 * hc.n_grid * grid.dx)

    def take(plane, dead):
        return jnp.where(live, plane[src], dead)

    # park dead slots at the slab center along the partition coordinate
    x = tuple(
        jnp.where(live, soa.x[c][src], slab_mid) if c == coord
        else take(soa.x[c], mid_yz)
        for c in range(3)
    )
    out = SoAState(
        x=x,
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


# ---------------------------------------------------------------------------
# packed particle rows (for neighbor-migration ppermute buffers)
# ---------------------------------------------------------------------------

# 49 SoA planes + 3 aux rows + material + orig = 54 rows / particle
_N_ROWS = 54


def _pack_rows(soa: SoAState, aux, material, orig) -> jnp.ndarray:
    """All per-particle state as one (54, n) float32 array.  material/orig
    ride as floats (exact for |v| < 2^24; orig < n_slots << 2^24)."""
    planes = (
        list(soa.x) + list(soa.v) + list(soa.F) + list(soa.F_trial)
        + list(soa.C) + [soa.vol, soa.density, soa.mass]
        + list(soa.init_cov) + list(soa.cov) + [soa.yield_stress]
        + [aux[r] for r in range(3)]
        + [material.astype(jnp.float32), orig.astype(jnp.float32)]
    )
    return jnp.stack(planes)


def _unpack_rows(rows: jnp.ndarray):
    r = iter(range(_N_ROWS))

    def take(k):
        return tuple(rows[next(r)] for _ in range(k))

    soa = SoAState(
        x=take(3), v=take(3), F=take(9), F_trial=take(9), C=take(9),
        vol=rows[next(r)], density=rows[next(r)], mass=rows[next(r)],
        init_cov=take(6), cov=take(6), yield_stress=rows[next(r)],
    )
    aux = jnp.stack([rows[next(r)] for _ in range(3)])
    material = jnp.round(rows[next(r)]).astype(jnp.int32)
    orig = jnp.round(rows[next(r)]).astype(jnp.int32)
    return soa, aux, material, orig


def bootstrap_slots(state, model: MPMModel, starts, grid: GridConfig,
                    hc: HaloConfig):
    """Original-order MPMState/SoAState -> initial partitioned slot arrays."""
    soa = state if isinstance(state, SoAState) else soa_from_state(state)
    n = soa.mass.shape[0]
    aux = jnp.stack([model.mu, model.lam, model.viscosity])
    orig = jnp.arange(n, dtype=jnp.int32)
    return partition_slots(
        soa, aux, model.material.astype(jnp.int32), orig,
        jnp.asarray(starts, jnp.int32), grid, hc,
    )


def to_original_soa(soa_sh: SoAState, orig: jnp.ndarray, n: int) -> SoAState:
    """Slot arrays -> original particle order (dead slots dropped)."""
    idx = jnp.where(orig >= 0, orig, n)

    def back(plane):
        return jnp.zeros((n + 1,), plane.dtype).at[idx].set(plane)[:n]

    return jax.tree_util.tree_map(back, soa_sh)


# ---------------------------------------------------------------------------
# halo exchanges
# ---------------------------------------------------------------------------

def _dyn_add(arr, strip, start, axis):
    cur = jax.lax.dynamic_slice_in_dim(arr, start, strip.shape[axis], axis)
    return jax.lax.dynamic_update_slice_in_dim(arr, cur + strip, start, axis)


def _exchange_accum(arr, x0, x1, axis_name, hc: HaloConfig, ax=1):
    """P2G phase: route boundary-strip CONTRIBUTIONS to their owner.

    arr (C, G, G, G): this device's raw P2G accumulation.  Sends the
    HX-wide strip left of x0 to the left neighbor and the strip right of
    x1 to the right neighbor; the owner adds them in place.  Slab widths
    > HX guarantee the strips of distinct devices do not overlap-skip a
    device, so left/right neighbors are the only recipients.
    """
    HX, nd = hc.HX, hc.ndev
    i = jax.lax.axis_index(axis_name)
    left_out = jax.lax.dynamic_slice_in_dim(
        arr, jnp.maximum(x0 - HX, 0), HX, axis=ax
    )
    right_out = jax.lax.dynamic_slice_in_dim(
        arr, jnp.minimum(x1, hc.n_grid - HX), HX, axis=ax
    )
    from_right = jax.lax.ppermute(
        left_out, axis_name, [(d, d - 1) for d in range(1, nd)]
    )
    from_left = jax.lax.ppermute(
        right_out, axis_name, [(d, d + 1) for d in range(nd - 1)]
    )
    # my left edge [x0, x0+HX) gets the left neighbor's right_out (it was
    # anchored at ITS x1 == my x0); my right-edge strip [x1-HX, x1) is NOT
    # where from_right goes — from_right holds the right neighbor's
    # left_out, anchored at (my x1) - HX
    recv_l = jnp.where(i > 0, 1.0, 0.0)
    recv_r = jnp.where(i < nd - 1, 1.0, 0.0)
    arr = _dyn_add(arr, from_left * recv_l, jnp.minimum(x0, hc.n_grid - HX), ax)
    arr = _dyn_add(arr, from_right * recv_r, jnp.maximum(x1 - HX, 0), ax)
    return arr


def _exchange_edges(arr, x0, x1, axis_name, hc: HaloConfig, ax=1):
    """G2P phase: fetch owner-computed boundary VALUES from neighbors.

    arr (C, G, G, G) must already be zeroed outside this device's owned
    range [x0, x1).  Each device sends its owned edge cells: the left
    edge [x0, x0+HX) to the left neighbor (who places it at its
    [x1, x1+HX)) and the right edge [x1-HX, x1) to the right neighbor
    (who places it at its [x0-HX, x0)); adding into zeroed cells is a
    copy.
    """
    HX, nd = hc.HX, hc.ndev
    i = jax.lax.axis_index(axis_name)
    left_edge = jax.lax.dynamic_slice_in_dim(
        arr, jnp.minimum(x0, hc.n_grid - HX), HX, axis=ax
    )
    right_edge = jax.lax.dynamic_slice_in_dim(
        arr, jnp.maximum(x1 - HX, 0), HX, axis=ax
    )
    from_right = jax.lax.ppermute(
        left_edge, axis_name, [(d, d - 1) for d in range(1, nd)]
    )
    from_left = jax.lax.ppermute(
        right_edge, axis_name, [(d, d + 1) for d in range(nd - 1)]
    )
    recv_l = jnp.where(i > 0, 1.0, 0.0)
    recv_r = jnp.where(i < nd - 1, 1.0, 0.0)
    arr = _dyn_add(arr, from_left * recv_l,
                   jnp.maximum(x0 - HX, 0), ax)
    arr = _dyn_add(arr, from_right * recv_r,
                   jnp.minimum(x1, hc.n_grid - HX), ax)
    return arr


# ---------------------------------------------------------------------------
# the sharded frame
# ---------------------------------------------------------------------------

def _soa_spec(axis):
    dummy = SoAState(
        x=(0,) * 3, v=(0,) * 3, F=(0,) * 9, F_trial=(0,) * 9, C=(0,) * 9,
        vol=0, density=0, mass=0, init_cov=(0,) * 6, cov=(0,) * 6,
        yield_stress=0,
    )
    return jax.tree_util.tree_map(lambda _: P(axis), dummy)


# ---------------------------------------------------------------------------
# migration (module-level so the tiled-compute halo engine reuses it)
# ---------------------------------------------------------------------------

def migrate_gathered_slots(soa, aux, material, orig, starts, grid, hc, axis,
                           coord: int = 0):
    """Gathered repartition: all_gather every slot, re-partition, slice my
    segment.  O(N * ndev) bytes — the always-correct fallback."""
    i = jax.lax.axis_index(axis)
    full = jax.tree_util.tree_map(
        lambda p: jax.lax.all_gather(p, axis, tiled=True), soa
    )
    aux_f = jax.lax.all_gather(aux, axis, axis=1, tiled=True)
    mat_f = jax.lax.all_gather(material, axis, tiled=True)
    orig_f = jax.lax.all_gather(orig, axis, tiled=True)
    soa2, aux2, mat2, orig2, ok = partition_slots(
        full, aux_f, mat_f, orig_f, starts, grid, hc, coord=coord
    )
    lo = i * hc.cap

    def cut(p, ax=0):
        return jax.lax.dynamic_slice_in_dim(p, lo, hc.cap, ax)

    soa2 = jax.tree_util.tree_map(cut, soa2)
    return (soa2, jax.lax.dynamic_slice_in_dim(aux2, lo, hc.cap, 1),
            cut(mat2), cut(orig2), ok)


def migrate_neighbor_slots(soa, aux, material, orig, starts, grid, hc, axis,
                           coord: int = 0):
    """Neighbor-only emigrant exchange: ppermute bounded buffers left/right
    (O(mcap) bytes per boundary); margin-bounded drift means an emigrant's
    new owner is always a direct neighbor.  Overflow of a buffer or the
    free-slot pool — detected collectively BEFORE the exchange — falls back
    to the gathered repartition."""
    nd = hc.ndev
    i = jax.lax.axis_index(axis)
    x0 = starts[i]
    x1 = starts[i + 1]
    mcap = hc.mcap
    n_slots = hc.cap
    live = orig >= 0
    dev_new = jnp.where(
        live, _device_of(soa.x[coord], starts, grid, hc), i
    )
    go_l = live & (dev_new == i - 1)
    go_r = live & (dev_new == i + 1)
    stray = live & (jnp.abs(dev_new - i) > 1)  # margin violated
    n_l = jnp.sum(go_l.astype(jnp.int32))
    n_r = jnp.sum(go_r.astype(jnp.int32))
    stay = live & ~go_l & ~go_r
    n_free = n_slots - jnp.sum(stay.astype(jnp.int32))

    perm_left = [(d, d - 1) for d in range(1, nd)]
    perm_right = [(d, d + 1) for d in range(nd - 1)]
    # counts first: agree collectively on feasibility BEFORE moving payload
    recv_r_cnt = jax.lax.ppermute(n_l[None], axis, perm_left)[0]
    recv_l_cnt = jax.lax.ppermute(n_r[None], axis, perm_right)[0]
    bad_local = (
        (n_l > mcap) | (n_r > mcap) | jnp.any(stray)
        | (recv_l_cnt + recv_r_cnt > n_free)
    )
    any_bad = jax.lax.psum(bad_local.astype(jnp.int32), axis) > 0

    def do_gathered(args):
        soa, aux, material, orig = args
        return migrate_gathered_slots(
            soa, aux, material, orig, starts, grid, hc, axis, coord=coord
        )

    def do_neighbor(args):
        soa, aux, material, orig = args
        rows = _pack_rows(soa, aux, material, orig)
        jj = jnp.arange(mcap, dtype=jnp.int32)

        def build(mask, cnt):
            order = jnp.argsort(jnp.logical_not(mask), stable=True)
            src = order[:mcap]
            valid = jj < cnt
            return jnp.where(valid[None, :], rows[:, src], 0.0)

        buf_l = build(go_l, n_l)
        buf_r = build(go_r, n_r)
        recv_from_right = jax.lax.ppermute(buf_l, axis, perm_left)
        recv_from_left = jax.lax.ppermute(buf_r, axis, perm_right)

        # kill emigrants: park dead at the slab center (along the
        # partition coordinate), mass 0
        slab_mid = (x0 + x1).astype(jnp.float32) * 0.5 * grid.dx
        mid_yz = jnp.float32(0.5 * hc.n_grid * grid.dx)
        park = tuple(
            slab_mid if c == coord else mid_yz for c in range(3)
        )
        dead = SoAState(
            x=park,
            v=(0.0,) * 3, F=_DEAD_F, F_trial=_DEAD_F, C=(0.0,) * 9,
            vol=0.0, density=0.0, mass=0.0,
            init_cov=(0.0,) * 6, cov=(0.0,) * 6, yield_stress=0.0,
        )
        soa_k = jax.tree_util.tree_map(
            lambda p, d: jnp.where(stay, p, d), soa, dead
        )
        aux_k = jnp.where(stay[None, :], aux, 0.0)
        mat_k = jnp.where(stay, material, 0)
        orig_k = jnp.where(stay, orig, -1)
        rows_k = _pack_rows(soa_k, aux_k, mat_k, orig_k)

        # insert immigrants into free slots (dead-first order)
        free_order = jnp.argsort(stay, stable=True).astype(jnp.int32)
        dst_l = jnp.where(
            jj < recv_l_cnt, free_order[jnp.minimum(jj, n_slots - 1)],
            n_slots,  # OOB -> scatter drops
        )
        dst_r = jnp.where(
            jj < recv_r_cnt,
            free_order[jnp.minimum(recv_l_cnt + jj, n_slots - 1)],
            n_slots,
        )
        rows_k = rows_k.at[:, dst_l].set(recv_from_left, mode="drop")
        rows_k = rows_k.at[:, dst_r].set(recv_from_right, mode="drop")
        soa2, aux2, mat2, orig2 = _unpack_rows(rows_k)
        return soa2, aux2, mat2, orig2, jnp.asarray(True)

    return jax.lax.cond(
        any_bad, do_gathered, do_neighbor, (soa, aux, material, orig)
    )


def make_halo_frame(
    mesh: Mesh, axis: str, bcs, grid: GridConfig, hc: HaloConfig, dt: float,
    n_substeps: int, migrate_every: int = 10, migration: str = "neighbor",
):
    """Build the jittable sharded frame step.

    (soa, aux, material, orig, starts, model, time) ->
    (soa', aux', material', orig', full_soa_original_order, time', ok)

    Slot arrays are sharded on the leading axis ((ndev*cap,) global); the
    returned full_soa is replicated in original particle order.

    migration: "neighbor" (default) exchanges fixed-capacity emigrant
    buffers with the two slab neighbors via ppermute — O(mcap) bytes per
    boundary instead of the O(N*ndev) gathered repartition (VERDICT r2
    item 5); drift bounded by `margin` cells means an emigrant's new owner
    is always a direct neighbor.  When a buffer (hc.mcap rows/direction)
    or the free-slot pool would overflow — detected collectively BEFORE
    the exchange — the segment falls back to the "gathered" repartition,
    which is also selectable outright.
    Measured comm volume at G=100, 8 devices, 245k particles:
    neighbor = 2 x mcap(=512) x 54 rows x 4 B ~= 0.22 MB per migration
    (every `migrate_every` substeps) vs gathered ~= N/dev x 54 x 4 x ndev
    ~= 53 MB — plus the per-substep halo strips either way.
    """
    nd = hc.ndev
    assert migration in ("neighbor", "gathered"), migration

    def frame_local(soa, aux, material, orig, starts, model_g, time):
        i = jax.lax.axis_index(axis)
        x0 = starts[i]
        x1 = starts[i + 1]
        g = grid.n_grid

        def migrate(soa, aux, material, orig):
            fn = (
                migrate_gathered_slots if migration == "gathered"
                else migrate_neighbor_slots
            )
            return fn(soa, aux, material, orig, starts, grid, hc, axis)

        def drift_ok(soa, orig):
            cell = jnp.floor(soa.x[0] * grid.inv_dx).astype(jnp.int32)
            bad = (orig >= 0) & (
                (cell < x0 - hc.margin) | (cell >= x1 + hc.margin)
            )
            return jax.lax.psum(jnp.sum(bad.astype(jnp.int32)), axis) == 0

        n_seg = -(-n_substeps // migrate_every)
        seg_len = min(migrate_every, n_substeps)
        assert n_seg * seg_len == n_substeps, (
            "n_substeps must be a multiple of migrate_every")

        def seg_body(carry, _):
            soa, aux_l, mat_l, orig_l, time, ok = carry
            def substep(carry, _):
                soa, time = carry
                if bcs.particle_ops:
                    v_aos = m33.vec_to_aos(soa.v)
                    x_aos = m33.vec_to_aos(soa.x)
                    for op in bcs.particle_ops:
                        v_aos = op.apply_particles(
                            x_aos, v_aos, soa.mass, time, dt
                        )
                    soa = soa._replace(v=m33.vec_from_aos(v_aos))

                new_F, stress, new_yield = compute_stress_soa(
                    soa.F_trial, mat_l, aux_l[0], aux_l[1], soa.yield_stress,
                    model_g.alpha, model_g.hardening, model_g.xi,
                    model_g.plastic_viscosity, model_g.softening, dt,
                    active_materials=model_g.active_materials,
                )
                soa = soa._replace(F=new_F, yield_stress=new_yield)

                grid_mass, grid_mom = p2g_soa(soa, stress, grid, dt)
                acc = jnp.stack(
                    [grid_mass, grid_mom[0], grid_mom[1], grid_mom[2]]
                ).reshape(4, g, g, g)
                acc = _exchange_accum(acc, x0, x1, axis, hc)
                acc = acc.reshape(4, g * g * g)
                grid_v = grid_update_soa(
                    acc[0], (acc[1], acc[2], acc[3]), model_g.gravity, dt
                )

                if bcs.grid_ops:
                    coords = jnp.stack(
                        [
                            jax.lax.broadcasted_iota(jnp.float32, (g, g, g), d)
                            for d in range(3)
                        ],
                        axis=-1,
                    ).reshape(-1, 3)
                    gv_aos = jnp.stack(grid_v, axis=-1)
                    for op in bcs.grid_ops:
                        gv_aos = op.apply_grid(gv_aos, coords, time, dt, grid.dx)
                    grid_v = tuple(gv_aos[:, r] for r in range(3))

                # owned-region mask, then owner-to-neighbor velocity halos
                gv = jnp.stack(grid_v).reshape(3, g, g, g)
                xc = jax.lax.broadcasted_iota(jnp.int32, (1, g, 1, 1), 1)
                own = (xc >= x0) & (xc < x1)
                gv = jnp.where(own, gv, 0.0)
                gv = _exchange_edges(gv, x0, x1, axis, hc)
                grid_v = tuple(gv.reshape(3, g * g * g))

                soa = g2p_soa(soa, grid_v, grid, dt)
                return (soa, time + dt), None

            (soa, time), _ = jax.lax.scan(
                substep, (soa, time), None, length=seg_len
            )
            ok = ok & drift_ok(soa, orig_l)
            soa, aux_l, mat_l, orig_l, ok2 = migrate(soa, aux_l, mat_l, orig_l)
            return (soa, aux_l, mat_l, orig_l, time, ok & ok2), None

        (soa, aux, material, orig, time, ok), _ = jax.lax.scan(
            seg_body, (soa, aux, material, orig, time, jnp.asarray(True)),
            None, length=n_seg,
        )

        # replicated original-order view
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


def original_view(full_padded: SoAState, n: int) -> SoAState:
    """Trim the psum'd (n_slots+1,) original-order planes back to (n,)."""
    return jax.tree_util.tree_map(lambda p: p[:n], full_padded)
