"""Minibatch inference — L-hop neighborhood extraction + feature-store fetch.

The reference's cache subsystem exists to serve feature rows for computations
that touch a subset of nodes (CachedSAGEConv, maxk_gnn_dgl_new.py:97-135).
This is the TPU-side consumer: predict logits for a node batch by

1. extracting the L-hop in-neighborhood closure on host (CSR traversal),
2. fetching exactly the needed feature rows through a FeatureStore (device
   cache hits never cross the host→device boundary — graphs/features.py),
3. running the model on the induced subgraph with GLOBAL degree norms.

Exactness: layer l only consumes aggregations of nodes in the (L-l)-hop
closure, whose full in-neighborhoods are present by construction; degree
normalisation uses the global degrees carried over from the full graph, so
the returned logits equal the full-graph forward at the seed rows.
"""
from __future__ import annotations

import numpy as np
import jax

from spgemm_gnn_tpu.graphs.csr import Graph


def _multi_slice(values: np.ndarray, starts: np.ndarray,
                 ends: np.ndarray) -> np.ndarray:
    """Concatenate values[s:e] for each (s, e) pair — fully vectorised
    (np.repeat/cumsum, the same edge-expansion trick graphs/tiles.py uses);
    the per-row Python loop this replaces crawled at products scale."""
    lens = (ends - starts).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, values.dtype)
    # out position i belongs to row r(i); value index = starts[r] + offset
    first_out = np.r_[0, np.cumsum(lens)[:-1]]
    idx = np.arange(total, dtype=np.int64) + np.repeat(starts - first_out,
                                                       lens)
    return values[idx]


def khop_in_subgraph(g: Graph, seeds, hops: int
                     ) -> tuple[Graph, np.ndarray, np.ndarray]:
    """Induced in-neighborhood subgraph for `seeds` with exact L-layer
    semantics. Returns (subgraph, global_node_ids, seed_positions)."""
    indptr = np.asarray(g.indptr)
    indices = np.asarray(g.indices)
    seeds = np.unique(np.asarray(seeds, np.int64))
    # boolean-mask BFS: each hop expands only the nodes DISCOVERED last hop
    # (a frontier that has already been expanded contributes nothing new), so
    # total expansion work is O(E) across all hops, not O(hops * E)
    mask = np.zeros(g.num_nodes, bool)
    mask[seeds] = True
    new = seeds
    inner_mask = mask.copy()                       # (L-1)-hop closure mask
    for _ in range(hops):
        inner_mask = mask.copy()
        neigh = _multi_slice(indices, indptr[new], indptr[new + 1])
        prev = mask.copy()
        mask[neigh] = True
        new = np.flatnonzero(mask & ~prev)
        if not len(new):                           # closure converged
            break
    nodes = np.flatnonzero(mask).astype(np.int64)  # L-hop closure (sorted)
    if not hops:
        # zero layers consume no aggregations: the exact subgraph is edgeless
        # (the old per-node loop crashed here whenever a seed had an
        # out-of-set neighbour)
        inner_mask = np.zeros(g.num_nodes, bool)
    inner = np.flatnonzero(inner_mask).astype(np.int64)

    if len(nodes) == g.num_nodes and len(inner) == g.num_nodes:
        # saturated closure: every row keeps its full in-neighborhood, local
        # ids equal global ids — the exact subgraph IS the graph (deep-hop
        # batches on dense graphs hit this; skip the O(E) rebuild entirely)
        return g, nodes, seeds.copy()

    # all in-edges whose destination lies in the (L-1)-hop closure; local ids
    # via an O(N) inverse-permutation table (one scatter; no per-edge binary
    # search). Saturated node closure (hops=3 on a dense graph: every node
    # reached but some rows lose their in-edges) → identity ids, skip the
    # per-edge remap gathers entirely.
    saturated = len(nodes) == g.num_nodes
    if saturated:
        lut = np.arange(g.num_nodes, dtype=np.int64)
    else:
        lut = np.empty(g.num_nodes, np.int64)
        lut[nodes] = np.arange(len(nodes), dtype=np.int64)
    lens = (indptr[inner + 1] - indptr[inner]).astype(np.int64)
    src = _multi_slice(indices, indptr[inner], indptr[inner + 1])
    dst = np.repeat(inner, lens)
    src_l = src if saturated else lut[src]
    dst_l = dst if saturated else lut[dst]

    # the extraction order is already the sub in-CSR order (inner sorted,
    # sources CSR-sorted within each row), so build the CSR directly
    import jax.numpy as jnp
    n_sub, e_sub = len(nodes), len(src_l)
    sub_ptr = np.zeros(n_sub + 1, np.int64)
    np.add.at(sub_ptr, dst_l + 1, 1)
    np.cumsum(sub_ptr, out=sub_ptr)
    # transpose: two O-regimes, picked by measured crossover. (a) filter —
    # the global out-CSR (t_*) already groups edges by source in destination
    # order, so the sub transpose is the global t-rows of `nodes` compressed
    # to destinations in `inner`: O(scan) and order-preserving, no sort.
    # (b) argsort of the forward src column: O(e_sub log e_sub). Filter wins
    # when the scanned volume is within ~3x of the kept edges (it beats the
    # full-closure argsort 56s -> no-sort at 124M edges; argsort wins when
    # the closure's out-edges dwarf the induced edge set).
    g_t_indptr = np.asarray(g.t_indptr).astype(np.int64)
    t_starts, t_ends = g_t_indptr[nodes], g_t_indptr[nodes + 1]
    t_scan = int((t_ends - t_starts).sum())
    if t_scan <= 3 * e_sub:
        if saturated:          # every t-row survives: scan the array as-is
            t_v = np.asarray(g.t_indices).astype(np.int64)
        else:
            t_v = _multi_slice(np.asarray(g.t_indices), t_starts,
                               t_ends).astype(np.int64)
        keep = inner_mask[t_v]
        t_v = t_v[keep]
        # kept count per row: prefix-sum of `keep` sampled at row boundaries
        kc = np.r_[0, np.cumsum(keep)]
        row_ends = np.cumsum((t_ends - t_starts).astype(np.int64))
        t_counts = np.diff(np.r_[0, kc[row_ends]])
        t_ptr = np.r_[0, np.cumsum(t_counts)]
        t_indices_sub = t_v if saturated else lut[t_v]
        t_edge_dst_sub = np.repeat(np.arange(n_sub, dtype=np.int64), t_counts)
    else:
        order = np.argsort(src_l, kind="stable")
        t_ptr = np.zeros(n_sub + 1, np.int64)
        np.add.at(t_ptr, src_l + 1, 1)
        np.cumsum(t_ptr, out=t_ptr)
        t_indices_sub = dst_l[order]
        t_edge_dst_sub = src_l[order]
    sub = Graph(
        indptr=jnp.asarray(sub_ptr.astype(np.int32)),
        indices=jnp.asarray(src_l.astype(np.int32)),
        edge_dst=jnp.asarray(dst_l.astype(np.int32)),
        t_indptr=jnp.asarray(t_ptr.astype(np.int32)),
        t_indices=jnp.asarray(t_indices_sub.astype(np.int32)),
        t_edge_dst=jnp.asarray(t_edge_dst_sub.astype(np.int32)),
        # degree norms must be the GLOBAL degrees, not the induced ones
        in_degrees=jnp.asarray(np.asarray(g.in_degrees)[nodes]),
        out_degrees=jnp.asarray(np.asarray(g.out_degrees)[nodes]),
        num_nodes=n_sub, num_edges=e_sub, symmetric=False)
    seed_pos = lut[seeds]
    return sub, nodes, seed_pos


def predict_nodes(model, params, g: Graph, store, node_ids,
                  hops: int | None = None) -> jax.Array:
    """Logits for `node_ids` (sorted unique order) via minibatch inference.

    store: a FeatureStore (graphs/features.py) — only the subgraph's rows are
    fetched, so a host-resident store with a device cache serves hot rows
    without host→device transfer.
    """
    if hops is None:
        hops = getattr(model, "num_layers", 2)
    sub, nodes, pos = khop_in_subgraph(g, node_ids, hops)
    x = store.fetch(nodes)
    logits = model.apply({"params": params}, sub, x, train=False)
    return logits[pos]
