"""Neighbor-group (ELL) SpMM — the GNNAdvisor-role second baseline.

The reference benchmarks a third-party GNNAdvisor kernel as an independent
SpMM implementation (`kernels/spmm_gnna.cu`, /root/reference/README.md:61,136).
GNNAdvisor's core scheduling idea is *neighbor grouping*: every row's edge
list is chunked into fixed-size neighbor groups, turning the ragged CSR
workload into a regular 2-D one. This module reproduces that formulation
natively for XLA/TPU:

- host side (once per graph, the `generate_meta.py` role): chunk each
  destination row's in-edges into groups of `width` sources, padding the last
  group of each row with a sentinel that points at an all-zero feature row —
  an ELLPACK-on-groups table `grp_src i32[G, width]` + group→row map
  `grp_dst i32[G]`;
- device side: one dense gather `x[grp_src]` → in-group reduce (sum over the
  width axis) → `segment_sum` over groups. Power-law skew costs at most
  `width-1` padded slots per row, and hub rows simply own many groups — the
  same load-balancing effect as GNNAdvisor's neighbor groups (and of the
  reference's warp4 row splitting).

This is a genuinely independent implementation from both the plan-bucketed
Pallas kernels (kernels/spgemm_pallas.py, kernels/stream_pallas.py) and the
CSR gather/segment-sum oracle (ops/spmm.py): different preprocessing,
different device-side formulation, different reduction order. It serves as
the second baseline in `kernel_bench.py --impls xla ell pallas` and as an
extra validation implementation in tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from spgemm_gnn_tpu.graphs.csr import Graph


@struct.dataclass
class ELLTable:
    """Padded neighbor-group table for one aggregation direction.

    grp_src[g, j] = j-th source node of group g (sentinel `num_src` pads);
    grp_dst[g]    = destination row of group g (0 for all-sentinel pad groups,
                    which contribute exact zeros). Groups are ordered by
                    destination row, so segment ids are sorted.
    """
    grp_src: jax.Array                                  # i32[G, width]
    grp_dst: jax.Array                                  # i32[G]
    num_src: int = struct.field(pytree_node=False)      # sentinel value
    num_dst: int = struct.field(pytree_node=False)
    width: int = struct.field(pytree_node=False)


@struct.dataclass
class ELLGraph:
    """Graph + neighbor-group tables for forward and transpose aggregation.

    Quacks like Graph for the norm/degree computations (ops/norms.py), the
    same delegation contract as kernels.planned.PlannedGraph."""
    graph: Graph
    fwd: ELLTable
    bwd: ELLTable          # transpose table; aliases fwd on symmetric graphs

    @property
    def num_nodes(self):
        return self.graph.num_nodes

    @property
    def num_edges(self):
        return self.graph.num_edges

    @property
    def in_degrees(self):
        return self.graph.in_degrees

    @property
    def out_degrees(self):
        return self.graph.out_degrees


def build_ell_table(indptr, indices, num_src: int, *,
                    width: int = 32) -> ELLTable:
    """Chunk a CSR structure into fixed-width neighbor groups (host, numpy)."""
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int64)
    num_dst = len(indptr) - 1
    deg = np.diff(indptr)
    grp_per_row = -(-deg // width)                       # ceil, 0 for empty
    row_base = np.concatenate([[0], np.cumsum(grp_per_row)])
    num_groups = int(row_base[-1])
    g_pad = max(-(-max(num_groups, 1) // 8) * 8, 8)

    grp_src = np.full((g_pad, width), num_src, dtype=np.int32)
    grp_dst = np.zeros(g_pad, dtype=np.int32)
    if len(indices):
        edge_row = np.repeat(np.arange(num_dst, dtype=np.int64), deg)
        offset = np.arange(len(indices), dtype=np.int64) - indptr[edge_row]
        gid = row_base[edge_row] + offset // width
        grp_src[gid, offset % width] = indices
    if num_groups:
        grp_dst[:num_groups] = np.repeat(
            np.arange(num_dst, dtype=np.int64), grp_per_row)
    return ELLTable(grp_src=jnp.asarray(grp_src), grp_dst=jnp.asarray(grp_dst),
                    num_src=int(num_src), num_dst=int(num_dst),
                    width=int(width))


def ell_graph(g: Graph, *, width: int = 32) -> ELLGraph:
    """Build both direction tables (the transpose aliases on symmetric
    graphs, same trick as plan_graph)."""
    fwd = build_ell_table(g.indptr, g.indices, g.num_nodes, width=width)
    bwd = fwd if g.symmetric else build_ell_table(
        g.t_indptr, g.t_indices, g.num_nodes, width=width)
    return ELLGraph(graph=g, fwd=fwd, bwd=bwd)


def ell_spmm_raw(t: ELLTable, x: jax.Array) -> jax.Array:
    """y[v] = Σ_{groups g of v} Σ_j x[grp_src[g, j]]  — unweighted A·x.

    x: f32[num_src, dim]. The sentinel gathers from an appended zero row, so
    padded slots contribute exact zeros without a mask. Differentiable through
    XLA autodiff (gather → scatter-add)."""
    xp = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)
    rows = jnp.take(xp, t.grp_src, axis=0)               # [G, width, dim]
    part = rows.sum(axis=1)                              # [G, dim]
    return jax.ops.segment_sum(part, t.grp_dst, num_segments=t.num_dst,
                               indices_are_sorted=True)


def _scale(x, f):
    return x if f is None else x * f[:, None].astype(x.dtype)


def ell_aggregate(eg: ELLGraph, x: jax.Array, norm: str = "sum") -> jax.Array:
    """y = A_w · x with separable norm weights (dense features)."""
    from spgemm_gnn_tpu.ops.norms import node_factors
    src_f, dst_f = node_factors(eg, norm)
    return _scale(ell_spmm_raw(eg.fwd, _scale(x, src_f)), dst_f)


def spgemm_forward(dim, values, channels, src_f, dst_f, tables) -> jax.Array:
    """CBSR forward through the group table (api.py impl="ell")."""
    from spgemm_gnn_tpu.ops.maxk import cbsr_to_dense
    fwd, _ = tables
    x = _scale(cbsr_to_dense(values, channels, dim), src_f)
    return _scale(ell_spmm_raw(fwd, x), dst_f)


def sspmm_backward(g_ct, channels, src_f, dst_f, tables) -> jax.Array:
    """Sampled backward: transpose group-table product, then gather the k
    surviving channels per node. Returns dvalues [N, k]."""
    _, bwd = tables
    z = _scale(ell_spmm_raw(bwd, _scale(g_ct, dst_f)), src_f)
    return jnp.take_along_axis(z, channels, axis=-1)
