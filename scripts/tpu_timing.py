"""Trustworthy TPU timing under the axon tunnel.

The axon backend deduplicates identical dispatches (same executable + same
input buffers return a cached result without re-execution), so the usual
"call fn(*args) n times and block_until_ready" loop measures dispatch
overhead, not compute (scripts/probe_calib.py: a 4096^3 bf16 matmul "ran"
in 0.049 ms).  Real numbers need distinct input buffers per call and a
host-side sync on a tiny slice of the final output.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def _tiny_sync(out):
    """Force completion by reading ~1 element of the first output leaf.

    One leaf is enough: all outputs of one executable complete together,
    and every host read is a full RPC roundtrip on the axon tunnel (reading
    every leaf was adding ~leaves x RTT / n of phantom time per call).
    """
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[:1])
            return


def make_variants(args, k=8, seed=0):
    """k copies of args with float leaves perturbed (distinct buffers)."""
    rng = np.random.default_rng(seed)
    variants = []
    for _ in range(k):
        def leafmap(x):
            if hasattr(x, "dtype") and np.issubdtype(x.dtype, np.floating):
                eps = np.float32(rng.uniform(1e-7, 1e-6))
                return x * (1.0 + eps)
            return x
        variants.append(jax.tree_util.tree_map(leafmap, args))
    return variants


def timeit(fn, *args, n=16, label="", warmup=2):
    """Time fn over n dispatches with distinct inputs; returns seconds/call."""
    variants = make_variants(args, k=n)  # all-distinct: dedup-proof
    for i in range(warmup):
        out = fn(*variants[i % len(variants)])
    _tiny_sync(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*variants[i % len(variants)])
    _tiny_sync(out)
    dt = (time.perf_counter() - t0) / n
    if label:
        print(f"{label:52s} {dt*1e3:8.3f} ms", flush=True)
    return dt, out
