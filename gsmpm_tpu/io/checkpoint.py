"""Full-state checkpoint / resume for simulation and system identification.

The reference has no mid-sim resume: it only exports displaced gaussians as
PLY for viewing (/root/reference/main.py:315-331) and never saves F, velocity,
covariance or optimizer state (SURVEY.md §5 "Checkpoint / resume").  This
module supplies the real thing, TPU-native: any pytree of jnp/np arrays
(MPMState, MPMModel, optimizer state, logE/y, frame counter) round-trips
through a single compressed .npz with a JSON treedef manifest — no host
framework dependency, safe across process restarts and device counts
(arrays are restored as numpy and re-placed by jit on next use).

Layout:  <dir>/step_<k>.ckpt.npz  (+ latest alias in manifest.json)
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten_with_paths(tree) -> Tuple[Dict[str, np.ndarray], Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    return arrays, treedef


def save_checkpoint(directory: str, step: int, tree, extra: Optional[Dict] = None) -> str:
    """Write pytree `tree` (+ JSON-serializable `extra`) as step checkpoint."""
    os.makedirs(directory, exist_ok=True)
    arrays, treedef = _flatten_with_paths(tree)
    path = os.path.join(directory, f"step_{step:08d}.ckpt.npz")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **arrays)
    os.replace(tmp, path)

    manifest = {
        "latest_step": step,
        "treedef": str(treedef),
        "n_leaves": len(arrays),
        "extra": extra or {},
    }
    man_tmp = os.path.join(directory, "manifest.json.tmp")
    with open(man_tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(man_tmp, os.path.join(directory, "manifest.json"))
    return path


def latest_step(directory: str) -> Optional[int]:
    """Highest step with a checkpoint file present, or None."""
    if not os.path.isdir(directory):
        return None
    steps = [
        int(m.group(1))
        for fn in os.listdir(directory)
        if (m := re.match(r"step_(\d+)\.ckpt\.npz$", fn))
    ]
    return max(steps) if steps else None


def restore_checkpoint(
    directory: str, template, step: Optional[int] = None
) -> Tuple[Any, int, Dict]:
    """Restore (tree, step, extra); `template` supplies the pytree structure.

    Raises FileNotFoundError if no checkpoint exists.
    """
    step = latest_step(directory) if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.join(directory, f"step_{step:08d}.ckpt.npz")
    with np.load(path) as data:
        leaves_t, treedef = jax.tree_util.tree_flatten(template)
        if len(leaves_t) != len(data.files):
            raise ValueError(
                f"checkpoint has {len(data.files)} leaves, template has "
                f"{len(leaves_t)} — structure mismatch"
            )
        leaves = [data[f"leaf_{i}"] for i in range(len(leaves_t))]
    extra = {}
    man_path = os.path.join(directory, "manifest.json")
    if os.path.exists(man_path):
        with open(man_path) as f:
            extra = json.load(f).get("extra", {})
    return jax.tree_util.tree_unflatten(treedef, leaves), step, extra
