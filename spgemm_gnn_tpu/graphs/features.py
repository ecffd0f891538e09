"""Feature stores — the TPU re-design of the reference's host-RAM feature-cache
strategies (`maxk_gnn_dgl_new.py:41-389`: CacheBase / DirectCache /
StaticOutDegreeCache / FIFOCache / LRUCache — experimental & broken there,
SURVEY.md §2.2).

For graphs whose raw features exceed device HBM, features live in host memory
and are fetched by node id through a device-resident cache:

- `DeviceFeatureStore` — everything on device (the default; no cache needed).
- `HostFeatureStore(policy=...)` — host-resident features; a fixed-budget
  device cache holds hot rows. Policies:
    * "direct"      — no cache; every fetch transfers from host (DirectCache).
    * "static-outd" — cache the top out-degree nodes, never evicted
                      (StaticOutDegreeCache — high out-degree = most referenced
                      as message sources).
    * "fifo" / "lru" — dynamic eviction by insertion order / recency.

All stores expose hit/miss statistics (CacheBase parity). Fetches are batched:
one host gather + one device_put per call, then a device-side merge with cached
rows — never a per-node Python loop.
"""
from __future__ import annotations

import collections
from typing import Iterable

import numpy as np
import jax
import jax.numpy as jnp

POLICIES = ("direct", "static-outd", "fifo", "lru")


class FeatureStore:
    """Common interface: full() for full-graph paths, fetch(ids) for subsets."""

    num_nodes: int
    dim: int

    def full(self) -> jax.Array:
        raise NotImplementedError

    def fetch(self, node_ids: np.ndarray) -> jax.Array:
        raise NotImplementedError

    @property
    def stats(self) -> dict:
        return {"hits": 0, "misses": 0, "hit_rate": 0.0}

    def reset_stats(self) -> None:
        pass


class DeviceFeatureStore(FeatureStore):
    def __init__(self, features, dtype=jnp.float32):
        self._x = jnp.asarray(features, dtype)
        self.num_nodes, self.dim = self._x.shape

    def full(self) -> jax.Array:
        return self._x

    def fetch(self, node_ids) -> jax.Array:
        return jnp.take(self._x, jnp.asarray(node_ids), axis=0)


class HostFeatureStore(FeatureStore):
    def __init__(self, features: np.ndarray, *, policy: str = "static-outd",
                 cache_ratio: float = 0.05, out_degrees: np.ndarray | None = None,
                 dtype=jnp.float32):
        if policy not in POLICIES:
            raise ValueError(f"policy must be one of {POLICIES}")
        self._host = np.asarray(features, np.float32)
        self.num_nodes, self.dim = self._host.shape
        self._dtype = dtype
        self.policy = policy
        self.capacity = int(self.num_nodes * cache_ratio)
        self._hits = 0
        self._misses = 0

        # cache bookkeeping: node id -> slot in the device cache buffer;
        # hits are served FROM the device buffer (only cache misses cross the
        # host→device boundary — the reference subsystem's purpose,
        # maxk_gnn_dgl_new.py:97-135)
        self._slot_of: dict[int, int] = {}
        self._order: collections.OrderedDict[int, None] = collections.OrderedDict()
        self._cache_dev: jax.Array | None = None
        self.bytes_from_host = 0
        if policy == "static-outd":
            if out_degrees is None:
                raise ValueError("static-outd policy needs out_degrees")
            top = np.argsort(-np.asarray(out_degrees), kind="stable")
            top = top[: self.capacity]
            self._slot_of = {int(n): i for i, n in enumerate(top)}
            if self.capacity > 0:
                # one startup transfer of the pinned hot rows
                self._cache_dev = jnp.asarray(self._host[top], self._dtype)
        elif policy in ("fifo", "lru") and self.capacity > 0:
            self._cache_dev = jnp.zeros((self.capacity, self.dim),
                                        self._dtype)
            self._free = list(range(self.capacity))

    # -- stats ---------------------------------------------------------------
    @property
    def stats(self) -> dict:
        total = self._hits + self._misses
        return {"hits": self._hits, "misses": self._misses,
                "hit_rate": self._hits / total if total else 0.0,
                "bytes_from_host": self.bytes_from_host}

    def reset_stats(self) -> None:
        self._hits = 0
        self._misses = 0
        self.bytes_from_host = 0

    # -- fetch ---------------------------------------------------------------
    def full(self) -> jax.Array:
        """Full feature matrix, transferred host→device (no caching benefit —
        use fetch for subsets)."""
        return jnp.asarray(self._host, self._dtype)

    def fetch(self, node_ids) -> jax.Array:
        ids = np.asarray(node_ids).ravel()
        if ids.size == 0:
            return jnp.zeros((0, self.dim), self._dtype)
        if self.policy == "direct" or self.capacity == 0:
            self._misses += len(ids)
            rows = self._host[ids]
            self.bytes_from_host += rows.nbytes
            return jnp.asarray(rows, self._dtype)

        # hits served from the device-resident cache buffer; only misses
        # gather from host memory and cross the host→device boundary
        slots = np.array([self._slot_of.get(int(i), -1) for i in ids],
                         dtype=np.int64)
        hit = slots >= 0
        self._hits += int(hit.sum())
        self._misses += int((~hit).sum())
        out = jnp.take(self._cache_dev, jnp.asarray(slots.clip(0)), axis=0)
        if not hit.all():
            miss_rows = self._host[ids[~hit]]
            self.bytes_from_host += miss_rows.nbytes
            out = out.at[jnp.asarray(np.flatnonzero(~hit))].set(
                jnp.asarray(miss_rows, self._dtype))
        if self.policy in ("fifo", "lru"):
            self._admit(ids[~hit])
            if self.policy == "lru":
                for i in ids.tolist():
                    if i in self._order:
                        self._order.move_to_end(i)
        return out

    def _admit(self, miss_ids: Iterable[int]) -> None:
        """Batch-admit missed rows: one host gather + one device buffer update."""
        new_ids, new_slots = [], []
        for i in np.unique(np.asarray(list(miss_ids), np.int64)).tolist():
            if i in self._slot_of:
                continue
            if self._free:
                slot = self._free.pop()
            else:
                old, _ = self._order.popitem(last=False)  # FIFO/LRU head
                slot = self._slot_of.pop(old)
            self._slot_of[i] = slot
            self._order[i] = None
            new_ids.append(i)
            new_slots.append(slot)
        if new_ids:
            rows = self._host[new_ids]
            self.bytes_from_host += rows.nbytes   # admission transfer is real
            self._cache_dev = self._cache_dev.at[jnp.asarray(new_slots)].set(
                jnp.asarray(rows, self._dtype))


def make_feature_store(features, *, policy: str = "none",
                       cache_ratio: float = 0.05, out_degrees=None,
                       dtype=jnp.float32) -> FeatureStore:
    """Factory mirroring the reference's --cache-strategy flag
    (utils/config.py:59-63)."""
    if policy in ("none", None):
        return DeviceFeatureStore(features, dtype)
    return HostFeatureStore(np.asarray(features), policy=policy,
                            cache_ratio=cache_ratio, out_degrees=out_degrees,
                            dtype=dtype)
