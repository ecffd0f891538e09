"""Locality-restoring node relabeling — plan-quality preprocessing.

At full Reddit/products scale the windowed kernel's source-block reuse
λ = deg·B/N collapses (RESULTS.md: 0.830 → 0.542 Ge/s from 29K to 233K
nodes) because a random node order spreads each destination window's sources
over all N/B source blocks. A locality-restoring permutation concentrates
each window's sources into few blocks, raising chunk fill and λ without
touching the kernels: the graph is relabeled ONCE at load time (features,
labels and masks ride the same permutation), so the per-step cost is zero.

This is the role the reference's `.warp4` metadata files play — its
generate_meta.py warp partitioning is itself a locality schedule
(/root/reference/README.md:84-87) — re-done as a host-side preprocessing
pass over the CSR.

Orders:
- "degree": descending in-degree. Hubs (the rows every window touches)
  collapse into the first few source blocks, which then stay VMEM-resident
  for most tiles.
- "bfs": breadth-first order from a pseudo-peripheral start; neighbors get
  nearby ids, so a destination window's sources cluster in few blocks.
- "rcm": reverse Cuthill–McKee (BFS with ascending-degree tie-order within
  each level, order reversed) — the classic bandwidth-minimising order.
- "degree-bfs": BFS whose frontier expansion is seeded and tie-ordered by
  descending degree — hub locality AND neighborhood locality.
- "labelprop": community recovery by synchronous label propagation, nodes
  ordered by (community, descending degree). BFS/RCM are bandwidth
  orderings whose level sets leak across communities when a meaningful
  fraction of edges is inter-community (measured on the SBM stand-ins:
  degree-BFS recovers only ~3× of the random intra-block fraction where
  label propagation recovers the construction-level locality) — this is
  the order for latently-clustered graphs (VERDICT r4 #2).
"""
from __future__ import annotations

import numpy as np

from spgemm_gnn_tpu.graphs.csr import Graph, from_edges

ORDERS = ("degree", "bfs", "rcm", "degree-bfs", "labelprop")


def _labelprop_labels(indptr: np.ndarray, indices: np.ndarray,
                      num_nodes: int, iters: int = 8,
                      use_native: bool = True) -> np.ndarray:
    """Synchronous label propagation: each sweep every node adopts the most
    frequent label among its neighbors. Ties break by a per-sweep keyed hash
    of the label — NOT min-label: on a dense graph every neighbor label is
    distinct in sweep 1 (all counts 1), so a min tie-break turns the sweep
    into epidemic minimum propagation and one label floods half the graph
    (measured on the full-scale SBM: a 120K/233K-node label after 2 sweeps).
    Randomised ties coalesce labels locally instead, the standard LPA fix.

    Native fast path (graphcore.cpp gc_labelprop, bit-identical — the
    production path: the numpy sweeps cost ~300 s at 100M edges); numpy
    fallback: one lexsort over (dst, label) per sweep + run-length mode."""
    if use_native:
        from spgemm_gnn_tpu.graphs import native
        if native.available():
            res = native.labelprop(indptr, indices, num_nodes, iters)
            if res is not None:
                return res
    dst = np.repeat(np.arange(num_nodes, dtype=np.int64), np.diff(indptr))
    src = np.asarray(indices, np.int64)
    labels = np.arange(num_nodes, dtype=np.int64)
    for it in range(iters):
        lab = labels[src]
        order = np.lexsort((lab, dst))
        d_o, l_o = dst[order], lab[order]
        # run starts of equal (dst, label) pairs
        new_run = np.r_[True, (d_o[1:] != d_o[:-1]) | (l_o[1:] != l_o[:-1])]
        run_id = np.cumsum(new_run) - 1
        counts = np.bincount(run_id)
        run_dst = d_o[new_run]
        run_lab = l_o[new_run]
        # per dst: max count, then min keyed hash among the max-count runs
        best_cnt = np.zeros(num_nodes, np.int64)
        np.maximum.at(best_cnt, run_dst, counts)
        is_best = counts == best_cnt[run_dst]
        key = (run_lab[is_best] * np.int64(2654435761)
               + np.int64(it) * np.int64(0x9E3779B9)) & np.int64(0x7FFFFFFF)
        best_key = np.full(num_nodes, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(best_key, run_dst[is_best], key)
        win = key == best_key[run_dst[is_best]]
        best = np.full(num_nodes, -1, np.int64)
        best[run_dst[is_best][win]] = run_lab[is_best][win]
        new_labels = np.where(best >= 0, best, labels)
        if np.array_equal(new_labels, labels):
            break
        labels = new_labels
    return labels


def _bfs_order(indptr: np.ndarray, indices: np.ndarray, num_nodes: int,
               seed_order: np.ndarray, *, level_sort: str = "none"
               ) -> np.ndarray:
    """Whole-graph BFS visit order. Disconnected components are entered in
    `seed_order`. Within a level, nodes come out in ascending OLD-id order
    (np.flatnonzero of the level mask — the vectorised expansion does not
    track per-edge discovery order); level_sort "asc"/"desc" re-sorts each
    level by (in-)degree with old-id tiebreak."""
    deg = np.diff(indptr)
    visited = np.zeros(num_nodes, bool)
    out = np.empty(num_nodes, np.int64)
    pos = 0
    seed_ptr = 0
    while pos < num_nodes:
        while seed_ptr < num_nodes and visited[seed_order[seed_ptr]]:
            seed_ptr += 1
        frontier = seed_order[seed_ptr:seed_ptr + 1]
        visited[frontier] = True
        while len(frontier):
            out[pos:pos + len(frontier)] = frontier
            pos += len(frontier)
            # expand all frontier rows at once (vectorised multi-slice)
            lens = (indptr[frontier + 1] - indptr[frontier]).astype(np.int64)
            total = int(lens.sum())
            if not total:
                break
            first = np.r_[0, np.cumsum(lens)[:-1]]
            idx = np.arange(total, dtype=np.int64) + np.repeat(
                indptr[frontier].astype(np.int64) - first, lens)
            neigh = indices[idx]
            fresh = neigh[~visited[neigh]]
            if not len(fresh):
                break
            prev = visited.copy()
            visited[fresh] = True
            nxt = np.flatnonzero(visited & ~prev)
            if level_sort == "asc":
                nxt = nxt[np.argsort(deg[nxt], kind="stable")]
            elif level_sort == "desc":
                nxt = nxt[np.argsort(-deg[nxt], kind="stable")]
            frontier = nxt
    return out


def relabel_order(g: Graph, order: str = "degree-bfs") -> np.ndarray:
    """Permutation `perm` with perm[new_id] = old_id (a visit order)."""
    indptr = np.asarray(g.indptr, np.int64)
    indices = np.asarray(g.indices, np.int64)
    deg = np.diff(indptr)
    by_deg_desc = np.argsort(-deg, kind="stable")
    if order == "degree":
        return by_deg_desc
    if order == "bfs":
        return _bfs_order(indptr, indices, g.num_nodes, by_deg_desc)
    if order == "rcm":
        by_deg_asc = np.argsort(deg, kind="stable")
        return _bfs_order(indptr, indices, g.num_nodes, by_deg_asc,
                          level_sort="asc")[::-1].copy()
    if order == "degree-bfs":
        return _bfs_order(indptr, indices, g.num_nodes, by_deg_desc,
                          level_sort="desc")
    if order == "labelprop":
        labels = _labelprop_labels(indptr, indices, g.num_nodes)
        # communities ordered by size (largest first — hub communities
        # front-load the resident source blocks), nodes by degree within
        sizes = np.bincount(labels, minlength=g.num_nodes)
        # lexsort: the LAST key is primary — (-community size, label,
        # -degree, old id)
        return np.lexsort((np.arange(g.num_nodes), -deg,
                           labels, -sizes[labels]))
    raise ValueError(f"unknown relabel order {order!r}; expected {ORDERS}")


def relabel_graph(g: Graph, order: str = "degree-bfs"
                  ) -> tuple[Graph, np.ndarray]:
    """Relabeled copy of `g` plus the permutation (perm[new] = old).

    Node-row payloads must ride the same permutation: x_new = x_old[perm].
    Results in relabeled space map back via y_old = y_new[inv] with
    inv[perm] = arange(N) — or equivalently y_old[perm[i]] = y_new[i].
    """
    perm = relabel_order(g, order)
    inv = np.empty(g.num_nodes, np.int64)
    inv[perm] = np.arange(g.num_nodes, dtype=np.int64)
    src = inv[np.asarray(g.indices, np.int64)]
    dst = inv[np.asarray(g.edge_dst, np.int64)]
    rg = from_edges(src, dst, g.num_nodes, symmetric=g.symmetric)
    return rg, perm
