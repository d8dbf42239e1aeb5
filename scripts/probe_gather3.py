"""Decompose _select_candidates_dupsort cost stage by stage on the TPU."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gsmpm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from gsmpm_tpu.render.renderer import (
    _COARSE, _RANK_M, _SENT_RANK, Preprocessed, RasterConfig, _tile_interval,
    block_origins,
)
from gsmpm_tpu.render.camera import make_camera


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tpu_timing import timeit as _timeit


def timeit(fn, *args, n=16, label=""):
    _, out = _timeit(fn, *args, n=n, label=label)
    return out


def main():
    N = 245760
    rng = np.random.default_rng(0)
    pre = Preprocessed(
        pix_x=jnp.asarray(rng.uniform(-50, 850, N), jnp.float32),
        pix_y=jnp.asarray(rng.uniform(-50, 850, N), jnp.float32),
        conic_a=jnp.asarray(rng.uniform(0.01, 1, N), jnp.float32),
        conic_b=jnp.asarray(rng.uniform(-0.1, 0.1, N), jnp.float32),
        conic_c=jnp.asarray(rng.uniform(0.01, 1, N), jnp.float32),
        depth=jnp.asarray(rng.uniform(0.5, 10, N), jnp.float32),
        radius=jnp.asarray(rng.uniform(1, 30, N), jnp.float32),
        color_r=jnp.asarray(rng.uniform(0, 1, N), jnp.float32),
        color_g=jnp.asarray(rng.uniform(0, 1, N), jnp.float32),
        color_b=jnp.asarray(rng.uniform(0, 1, N), jnp.float32),
        opacity=jnp.asarray(rng.uniform(0, 1, N), jnp.float32),
        valid=jnp.asarray(rng.uniform(0, 1, N) > 0.05),
    )
    camera = make_camera(800, 800, 0.7, 0.7, np.eye(3), np.zeros(3))
    cfg = RasterConfig()
    order = jax.jit(lambda p: jnp.argsort(jnp.where(p.valid, p.depth, jnp.inf)))(pre)
    order = jax.block_until_ready(order)

    B = cfg.block
    origins, nbx, nby = block_origins(camera, cfg)
    n = N
    n4 = 4 * n
    ncx, ncy = -(-nbx // _COARSE), -(-nby // _COARSE)
    nf, nc = nbx * nby, ncx * ncy
    gid = nf + nc

    def stage_sortgather(p, o):
        return p.pix_x[o], p.pix_y[o], p.radius[o], p.valid[o]

    def stage_keys(p, o):
        sx, sy, sr, sv = stage_sortgather(p, o)
        fx0, fx1, offx = _tile_interval(sx, sr, B, nbx)
        fy0, fy1, offy = _tile_interval(sy, sr, B, nby)
        valid = sv & ~(offx | offy)
        spx, spy = fx1 - fx0, fy1 - fy0
        lvl0 = valid & (spx <= 1) & (spy <= 1)
        cx0, cx1 = fx0 // _COARSE, fx1 // _COARSE
        cy0, cy1 = fy0 // _COARSE, fy1 // _COARSE
        cspx, cspy = cx1 - cx0, cy1 - cy0
        lvl1 = valid & ~lvl0 & (cspx <= 1) & (cspy <= 1)
        lvl2 = valid & ~lvl0 & ~lvl1
        rank = jnp.arange(n, dtype=jnp.int32)
        sent_key = jnp.int32(2 ** 31 - 1)
        keys = []
        for dy in (0, 1):
            for dx in (0, 1):
                ft = (fy0 + dy) * nbx + (fx0 + dx)
                fok = lvl0 & (dx <= spx) & (dy <= spy)
                ct = nf + (cy0 + dy) * ncx + (cx0 + dx)
                cok = lvl1 & (dx <= cspx) & (dy <= cspy)
                gok = lvl2 & (dx == 0) & (dy == 0)
                tile = jnp.where(fok, ft, jnp.where(cok, ct, gid))
                ok = fok | cok | gok
                keys.append(jnp.where(ok, tile * _RANK_M + rank, sent_key))
        return jnp.concatenate(keys)

    def stage_sorted(p, o):
        return jnp.sort(stage_keys(p, o))

    def stage_bounds(p, o):
        skeys = stage_sorted(p, o)
        ntt = nf + nc + 1
        bounds = jnp.searchsorted(
            skeys, jnp.arange(ntt + 1, dtype=jnp.int32) * _RANK_M
        ).astype(jnp.int32)
        return skeys, bounds

    def windows(skeys, bounds, tile_ids, k):
        s = bounds[tile_ids]
        e = bounds[tile_ids + 1]
        w = s[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
        kk = skeys[jnp.minimum(w, n4 - 1)]
        return jnp.where(w < e[:, None], kk & (_RANK_M - 1), _SENT_RANK)

    bx = jnp.arange(nbx, dtype=jnp.int32)
    by = jnp.arange(nby, dtype=jnp.int32)
    t_f = (by[:, None] * nbx + bx[None, :]).reshape(-1)
    k0 = min(cfg.k_tile, n)
    k1 = min(cfg.k_coarse, n)
    k2 = min(cfg.k_global, n)
    parent = ((by[:, None] // _COARSE) * ncx + (bx[None, :] // _COARSE)).reshape(-1)

    def stage_windows(p, o):
        skeys, bounds = stage_bounds(p, o)
        ranks_f = windows(skeys, bounds, t_f, k0)
        ranks_c_all = windows(skeys, bounds, nf + jnp.arange(nc, dtype=jnp.int32), k1)
        ranks_c = ranks_c_all[parent]
        ranks_g = jnp.broadcast_to(
            windows(skeys, bounds, jnp.full((1,), gid, jnp.int32), k2), (nf, k2)
        )
        return ranks_f, ranks_c, ranks_g

    def stage_merge(p, o):
        ranks_f, ranks_c, ranks_g = stage_windows(p, o)
        return jnp.sort(jnp.concatenate([ranks_f, ranks_c, ranks_g], axis=1), axis=1)

    def stage_full(p, o):
        merged = stage_merge(p, o)
        counts = jnp.sum(merged < _SENT_RANK, axis=1).astype(jnp.int32)
        gidx = jnp.where(merged < _SENT_RANK, o[jnp.minimum(merged, n - 1)], n)
        return gidx, counts

    timeit(jax.jit(stage_sortgather), pre, order, label="A: planes sort-gather (4 arrays)")
    timeit(jax.jit(stage_keys), pre, order, label="B: + intervals + keys build")
    timeit(jax.jit(stage_sorted), pre, order, label="C: + sort 4N")
    timeit(jax.jit(stage_bounds), pre, order, label="D: + searchsorted")
    timeit(jax.jit(stage_windows), pre, order, label="E: + windows")
    timeit(jax.jit(stage_merge), pre, order, label="F: + merge sort rows")
    timeit(jax.jit(stage_full), pre, order, label="G: full (gidx gather)")


if __name__ == "__main__":
    main()
