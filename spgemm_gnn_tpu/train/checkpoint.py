"""Checkpoint / resume — orbax-backed.

The reference's checkpointing is vestigial (`save_checkpoint` defined but never
called; `--evaluate PATH` parsed but never read — SURVEY.md §5.4). Here it is a
real subsystem: full train state (params, batch_stats, optimizer state, step)
saved atomically, restored for resume or eval-only runs.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except ImportError:  # pragma: no cover
    _HAVE_ORBAX = False


def _ckpt_dir(path: str) -> str:
    return os.path.abspath(os.path.join(path, "checkpoints"))


def save_checkpoint(path: str, state: dict[str, Any], step: int,
                    is_best: bool = False) -> str:
    """Save `state` under <path>/checkpoints/<step> (and /best if is_best)."""
    base = _ckpt_dir(path)
    os.makedirs(base, exist_ok=True)
    state = jax.device_get(state)
    targets = [os.path.join(base, str(step))]
    if is_best:
        targets.append(os.path.join(base, "best"))
    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        for t in targets:
            ckptr.save(t, state, force=True)
    else:  # minimal fallback: npz of flattened leaves
        flat, treedef = jax.tree_util.tree_flatten(state)
        for t in targets:
            os.makedirs(t, exist_ok=True)
            np.savez(os.path.join(t, "state.npz"),
                     *[np.asarray(l) for l in flat])
    return targets[0]


def restore_checkpoint(path_or_dir: str, target: dict[str, Any]
                       ) -> dict[str, Any]:
    """Restore a state pytree. Accepts a checkpoint dir, a run dir (uses the
    latest step), or the literal 'best' under a run dir."""
    p = path_or_dir
    base = _ckpt_dir(p)
    if os.path.isdir(base):  # run dir given → pick latest numeric step
        steps = [d for d in os.listdir(base) if d.isdigit()]
        if steps:
            p = os.path.join(base, max(steps, key=int))
        elif os.path.isdir(os.path.join(base, "best")):
            p = os.path.join(base, "best")
        else:
            raise FileNotFoundError(f"no checkpoints under {base}")
    def _like(t, r):
        """Restore value r with the dtype AND sharding of the target leaf —
        otherwise a mesh run resumes with unsharded arrays and the next
        donated jit call recompiles/double-buffers (ADVICE r1)."""
        arr = jax.numpy.asarray(r, dtype=getattr(t, "dtype", None))
        sh = getattr(t, "sharding", None)
        if isinstance(t, jax.Array) and sh is not None:
            arr = jax.device_put(arr, sh)
        return arr

    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(p, item=jax.device_get(target))
        return jax.tree_util.tree_map(_like, target, restored)
    flat, treedef = jax.tree_util.tree_flatten(target)
    z = np.load(os.path.join(p, "state.npz"))
    leaves = [_like(t, z[f"arr_{i}"]) for i, t in enumerate(flat)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def latest_step(path: str) -> int | None:
    base = _ckpt_dir(path)
    if not os.path.isdir(base):
        return None
    steps = [int(d) for d in os.listdir(base) if d.isdigit()]
    return max(steps) if steps else None
