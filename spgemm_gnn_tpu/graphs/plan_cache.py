"""Plan disk cache — build tile plans once per graph, reuse across runs.

The reference amortises its warp-partition preprocessing by writing
`64_warp_4/<graph>.warp4` metadata files to disk once per graph
(`kernels/generate_meta.py`, SURVEY.md §2.1). This is the same amortisation
for TilePlan/StreamPlan: plans are keyed by a fingerprint of the CSR structure
plus the plan parameters, so a second `train.py`/`bench.py` run skips the
host-side plan build entirely (at ogbn-products scale that is ~13 s × 2 plans
per run — VERDICT r1 weak #7).
"""
from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import jax.numpy as jnp


def graph_fingerprint(indptr, indices) -> str:
    """Stable fingerprint of a CSR structure (content hash, not identity)."""
    h = hashlib.blake2b(digest_size=16)
    a = np.ascontiguousarray(np.asarray(indptr, np.int64))
    b = np.ascontiguousarray(np.asarray(indices, np.int32))
    h.update(np.int64(a.shape[0]).tobytes())
    h.update(np.int64(b.shape[0]).tobytes())
    h.update(a.tobytes())
    h.update(b.tobytes())
    return h.hexdigest()


_ARRAY_FIELDS = {
    "windowed": ("ws_dst_block", "ws_src_block", "e_src_local", "e_dst_local"),
    "stream": ("ws_local", "row0", "e_src", "e_dst"),
}


def _plan_kind(plan) -> str:
    from spgemm_gnn_tpu.graphs.stream_tiles import StreamPlan
    from spgemm_gnn_tpu.graphs.tiles import MultiTilePlan
    if isinstance(plan, MultiTilePlan):
        return "windowed_classes"
    return "stream" if isinstance(plan, StreamPlan) else "windowed"


def save_plan(path: str, plan) -> None:
    """Serialise a TilePlan/StreamPlan/MultiTilePlan to one .npz."""
    kind = _plan_kind(plan)
    if kind == "windowed_classes":
        arrays, statics = {}, []
        for i, p in enumerate(plan.plans):
            for f in _ARRAY_FIELDS["windowed"]:
                arrays[f"c{i}_{f}"] = np.asarray(getattr(p, f))
            statics.append({k: v for k, v in p.__dict__.items()
                            if not hasattr(v, "shape")})
    else:
        arrays = {f: np.asarray(getattr(plan, f)) for f in _ARRAY_FIELDS[kind]}
        statics = {k: v for k, v in plan.__dict__.items()
                   if not hasattr(v, "shape")}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"   # np.savez appends .npz unless already present
    np.savez(tmp, __kind__=kind, __statics__=json.dumps(statics), **arrays)
    os.replace(tmp, path)


def load_plan(path: str):
    z = np.load(path, allow_pickle=False)
    kind = str(z["__kind__"])
    statics = json.loads(str(z["__statics__"]))
    from spgemm_gnn_tpu.graphs.tiles import MultiTilePlan, TilePlan
    if kind == "windowed_classes":
        plans = []
        for i, st in enumerate(statics):
            arrays = {f: jnp.asarray(z[f"c{i}_{f}"])
                      for f in _ARRAY_FIELDS["windowed"]}
            plans.append(TilePlan(**arrays, **st))
        return MultiTilePlan(plans=tuple(plans))
    arrays = {f: jnp.asarray(z[f]) for f in _ARRAY_FIELDS[kind]}
    if kind == "stream":
        from spgemm_gnn_tpu.graphs.stream_tiles import StreamPlan
        return StreamPlan(**arrays, **statics)
    return TilePlan(**arrays, **statics)


def cached_plan(cache_dir: str | None, key: str, builder):
    """Load the plan for `key` from cache_dir, or build + store it.

    key: caller-provided identity (graph fingerprint + direction + params).
    builder: zero-arg callable producing the plan on a miss.
    Cache failures (corrupt/partial files) fall back to a fresh build.
    """
    if not cache_dir:
        return builder()
    path = os.path.join(cache_dir, f"plan_{key}.npz")
    if os.path.exists(path):
        try:
            return load_plan(path)
        except Exception:
            try:
                os.remove(path)
            except OSError:
                pass
    plan = builder()
    try:
        save_plan(path, plan)
    except OSError:
        pass
    return plan


def save_shard_host(path: str, host: dict) -> None:
    """Serialise a mesh-free sharded host build (parallel/planned_sharded.py
    `_shard_host` output: stacked per-shard role arrays + send schedule +
    statics) to a DIRECTORY of .npy files + meta.json.

    A directory (not one .npz) so `load_shard_host` can memory-map each
    array: at products scale the stacked plans are GBs, and this host
    page-faults fresh memory at ~250 MB/s — mmap hands the pages straight
    from the page cache to device_put with no host copy (VERDICT r4 #4)."""
    tmp = path + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    meta = {"statics": host["statics"], "roles": {},
            "n_send": len(host["send_idx"])}
    for name, role in host["roles"].items():
        if role is None or isinstance(role, str):   # absent or alias marker
            meta["roles"][name] = role
            continue
        meta["roles"][name] = {"kind": role["kind"],
                               "statics": role["statics"],
                               "arrays": sorted(role["arrays"])}
        for f, a in role["arrays"].items():
            np.save(os.path.join(tmp, f"{name}__{f}.npy"), a)
    for i, a in enumerate(host["send_idx"]):
        np.save(os.path.join(tmp, f"send{i}.npy"), a)
    with open(os.path.join(tmp, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    if os.path.isdir(path):
        import shutil
        shutil.rmtree(path, ignore_errors=True)
    os.replace(tmp, path)


def load_shard_host(path: str) -> dict:
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)

    def mm(name):
        return np.load(os.path.join(path, name + ".npy"), mmap_mode="r")

    roles = {}
    for name, r in meta["roles"].items():
        if r is None or isinstance(r, str):
            roles[name] = r
            continue
        roles[name] = {"kind": r["kind"], "statics": r["statics"],
                       "arrays": {f: mm(f"{name}__{f}")
                                  for f in r["arrays"]}}
    return {"roles": roles,
            "send_idx": [mm(f"send{i}") for i in range(meta["n_send"])],
            "statics": meta["statics"]}


def cached_shard_host(cache_dir: str | None, key: str, builder) -> dict:
    """cached_plan for sharded host builds (corrupt entries rebuild)."""
    if not cache_dir:
        return builder()
    path = os.path.join(cache_dir, f"shard_{key}")
    if os.path.isdir(path):
        try:
            return load_shard_host(path)
        except Exception:
            import shutil
            shutil.rmtree(path, ignore_errors=True)
    host = builder()
    try:
        save_shard_host(path, host)
    except OSError:
        pass
    return host


# bump when an AUTO-geometry heuristic changes: cache keys carry the given
# parameters (often None = auto), so a heuristic change would otherwise keep
# serving plans built under the old rules. v2: stream start-slack windows +
# block-straddling groups (round 3).
PLANNER_VERSION = 2


def plan_key(fingerprint: str, direction: str, kind: str, **params) -> str:
    """Deterministic cache key from fingerprint + direction + parameters."""
    tail = "_".join(f"{k}{params[k]}" for k in sorted(params)
                    if params[k] is not None)
    head = f"{fingerprint}_v{PLANNER_VERSION}_{direction}_{kind}"
    return f"{head}_{tail}" if tail else head
