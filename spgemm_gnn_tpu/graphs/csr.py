"""CSR graph container — the TPU-native replacement for the reference's DGLGraph usage.

The reference extracts CSR `(ptr, idx)` from DGL at
`/root/reference/utils/maxk_layers.py:104-144` with a three-level API fallback and
builds mean-aggregation edge weights in a Python loop (`:147-157`). Here the graph is
a frozen pytree of device arrays with static shapes, built once on host, and all
normalisation weights are computed from stored degrees under `jit`.

Orientation convention: aggregation gathers over **in-edges** (DGL `update_all`
semantics — destination node v aggregates from its in-neighbours u over edges u→v).
`indptr`/`indices` is therefore the in-CSR: row = destination, `indices[e]` = source.
All five training datasets are symmetric graphs, in which case the transpose
structure (needed by the backward pass) aliases the forward structure.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Graph:
    """Static-shape CSR graph (a pytree; safe to close over or pass through jit).

    Attributes:
      indptr:   int32[N+1]  in-CSR row pointers (row = destination node).
      indices:  int32[E]    source node of each in-edge, grouped by destination.
      edge_dst: int32[E]    destination of each in-edge (row ids expanded; sorted
                            ascending — the segment ids for segment_sum).
      t_indptr/t_indices/t_edge_dst: the transpose (out-CSR) structure, used by the
                            backward pass. For symmetric graphs these alias the
                            forward arrays (no extra memory).
      in_degrees / out_degrees: int32[N] raw degrees (no self-loop clamping).
      num_nodes / num_edges: static Python ints.
      symmetric: static bool — True if the edge set equals its transpose.
    """

    indptr: jax.Array
    indices: jax.Array
    edge_dst: jax.Array
    t_indptr: jax.Array
    t_indices: jax.Array
    t_edge_dst: jax.Array
    in_degrees: jax.Array
    out_degrees: jax.Array
    num_nodes: int = struct.field(pytree_node=False)
    num_edges: int = struct.field(pytree_node=False)
    symmetric: bool = struct.field(pytree_node=False, default=False)

    @property
    def edge_src(self) -> jax.Array:
        """Source node of each in-edge (alias of indices)."""
        return self.indices

    def __repr__(self) -> str:  # pragma: no cover
        return (f"Graph(N={self.num_nodes}, E={self.num_edges}, "
                f"symmetric={self.symmetric})")


def _csr_from_sorted(dst_sorted: np.ndarray, src_sorted: np.ndarray,
                     num_nodes: int):
    indptr = np.zeros(num_nodes + 1, dtype=np.int64)
    np.add.at(indptr, dst_sorted + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr.astype(np.int32), src_sorted.astype(np.int32)


def from_edges(src, dst, num_nodes: int, *, symmetric: bool | None = None,
               sort_neighbors: bool = True) -> Graph:
    """Build a Graph from a directed edge list (host-side, numpy).

    Args:
      src, dst: int arrays [E]; edge e goes src[e] → dst[e].
      num_nodes: number of nodes N.
      symmetric: if None, detected (cheaply, via sorted edge-pair comparison).
      sort_neighbors: sort sources within each CSR row (canonical form).
    """
    src = np.asarray(src, dtype=np.int64).ravel()
    dst = np.asarray(dst, dtype=np.int64).ravel()
    if src.shape != dst.shape:
        raise ValueError("src/dst length mismatch")
    E = src.shape[0]

    # in-CSR: sort by (dst, src). Native fast path (graphcore.cpp) when built;
    # numpy lexsort otherwise — the host-side analogue of the reference's
    # generate_meta.py preprocessing step.
    built = None
    if sort_neighbors:
        from spgemm_gnn_tpu.graphs import native
        if native.available():
            built = native.build_csr(src, dst, num_nodes)
    if built is not None:
        indptr, indices, edge_dst = built
        dst_s = edge_dst.astype(np.int64)
        src_s = indices.astype(np.int64)
    else:
        key = dst * num_nodes + src if sort_neighbors else dst
        order = np.argsort(key, kind="stable")
        dst_s, src_s = dst[order], src[order]
        indptr, indices = _csr_from_sorted(dst_s, src_s, num_nodes)
        edge_dst = dst_s.astype(np.int32)

    in_deg = np.diff(indptr).astype(np.int32)
    out_deg = np.bincount(src, minlength=num_nodes).astype(np.int32)

    if symmetric is None:
        fwd = np.sort(dst_s * num_nodes + src_s, kind="stable")
        rev = np.sort(src_s * num_nodes + dst_s, kind="stable")
        symmetric = bool(np.array_equal(fwd, rev))

    j_indptr = jnp.asarray(indptr)
    j_indices = jnp.asarray(indices)
    j_edge_dst = jnp.asarray(edge_dst)
    if symmetric:
        # alias the forward arrays — zero extra device memory
        j_t_indptr, j_t_indices, j_t_edge_dst = j_indptr, j_indices, j_edge_dst
    else:
        # transpose (out-CSR): sort the same edges by (src, dst)
        t_key = src_s * num_nodes + dst_s
        t_order = np.argsort(t_key, kind="stable")
        t_indptr, t_indices = _csr_from_sorted(src_s[t_order], dst_s[t_order],
                                               num_nodes)
        j_t_indptr = jnp.asarray(t_indptr)
        j_t_indices = jnp.asarray(t_indices)
        j_t_edge_dst = jnp.asarray(src_s[t_order].astype(np.int32))

    return Graph(
        indptr=j_indptr, indices=j_indices, edge_dst=j_edge_dst,
        t_indptr=j_t_indptr, t_indices=j_t_indices, t_edge_dst=j_t_edge_dst,
        in_degrees=jnp.asarray(in_deg), out_degrees=jnp.asarray(out_deg),
        num_nodes=int(num_nodes), num_edges=int(E), symmetric=symmetric,
    )


# t_perm intentionally not stored on Graph: all edge weights used by the models
# are separable per-edge functions of (src, dst) degrees, so the transpose-order
# weights are recomputed directly from t structure instead of permuting.


def add_self_loops(g: Graph) -> Graph:
    """Remove existing self-loops then add one per node.

    Mirrors DGL's AddSelfLoop transform used at
    `/root/reference/maxk_gnn_dgl.py:221-223` (remove-then-add to prevent
    duplicates).
    """
    src = np.asarray(g.indices)
    dst = np.asarray(g.edge_dst)
    keep = src != dst
    src = np.concatenate([src[keep], np.arange(g.num_nodes, dtype=src.dtype)])
    dst = np.concatenate([dst[keep], np.arange(g.num_nodes, dtype=dst.dtype)])
    return from_edges(src, dst, g.num_nodes, symmetric=g.symmetric or None)


def to_undirected(src, dst, num_nodes: int) -> Graph:
    """Build a symmetric graph from a directed edge list (add reverse edges,
    dedupe)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    key = np.unique(d * num_nodes + s)
    return from_edges(key % num_nodes, key // num_nodes, num_nodes,
                      symmetric=True)
