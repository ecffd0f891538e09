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

from spgemm_gnn_tpu.graphs.csr import Graph, from_edges


def khop_in_subgraph(g: Graph, seeds, hops: int
                     ) -> tuple[Graph, np.ndarray, np.ndarray]:
    """Induced in-neighborhood subgraph for `seeds` with exact L-layer
    semantics. Returns (subgraph, global_node_ids, seed_positions)."""
    indptr = np.asarray(g.indptr)
    indices = np.asarray(g.indices)
    seeds = np.unique(np.asarray(seeds, np.int64))
    closures = [seeds]
    frontier = seeds
    for _ in range(hops):
        starts, ends = indptr[frontier], indptr[frontier + 1]
        neigh = np.concatenate([indices[s:e] for s, e in zip(starts, ends)]) \
            if len(frontier) else np.zeros(0, np.int64)
        frontier = np.union1d(closures[-1], neigh)
        closures.append(frontier)
    nodes = closures[-1].astype(np.int64)          # L-hop closure
    inner = closures[-2] if hops else seeds        # needs full neighborhoods
    local = {int(n): i for i, n in enumerate(nodes)}

    # all in-edges whose destination lies in the (L-1)-hop closure
    e_dst, e_src = [], []
    for v in inner:
        s, e = indptr[v], indptr[v + 1]
        e_src.append(indices[s:e])
        e_dst.append(np.full(e - s, v, np.int64))
    src = np.concatenate(e_src) if e_src else np.zeros(0, np.int64)
    dst = np.concatenate(e_dst) if e_dst else np.zeros(0, np.int64)
    src_l = np.array([local[int(u)] for u in src], np.int64)
    dst_l = np.array([local[int(v)] for v in dst], np.int64)

    sub = from_edges(src_l, dst_l, len(nodes), symmetric=False)
    # degree norms must be the GLOBAL degrees, not the induced ones
    import jax.numpy as jnp
    sub = sub.replace(
        in_degrees=jnp.asarray(np.asarray(g.in_degrees)[nodes]),
        out_degrees=jnp.asarray(np.asarray(g.out_degrees)[nodes]))
    seed_pos = np.array([local[int(s)] for s in seeds], np.int64)
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
