"""Edge-partitioned graph + SPMD aggregation under shard_map.

Partitioning scheme (host-side, once per graph — the distributed analogue of the
reference's `generate_meta.py` preprocessing):

- nodes are padded to a multiple of D (mesh size) and split into D contiguous
  blocks; device d owns node block d;
- edges (already sorted by destination) are split at block boundaries, so every
  in-edge lives on the device that owns its destination; each device's edge list
  is padded to the common maximum with sentinel edges targeting a trash row;
- source ids stay global: the aggregation all-gathers source features (dense
  path: [N, dim]; CBSR path: [N, k]+[N, k] — the dim/k compression is what makes
  the exchange cheap) and then gathers/accumulates locally.

Everything under `shard_map` is differentiable — XLA transposes the collectives
(all_gather ⇄ reduce_scatter) for the backward pass automatically.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from spgemm_gnn_tpu.graphs.csr import Graph
from spgemm_gnn_tpu.ops.norms import node_factors


@struct.dataclass
class ShardedGraph:
    """Graph partitioned over a 1-D mesh axis by destination-node blocks.

    Array fields are *global* arrays carrying a NamedSharding over the mesh;
    per-device blocks are recovered inside shard_map.
    """
    edge_src: jax.Array       # i32[D*Eps] global source ids (sharded by edge)
    edge_dst_local: jax.Array  # i32[D*Eps] destination - block offset; == Nps
    #                            for sentinel (padding) edges → trash row
    in_degrees: jax.Array     # i32[N_pad] (sharded by node; 0 on padding rows)
    out_degrees: jax.Array    # i32[N_pad]
    num_nodes: int = struct.field(pytree_node=False)   # original N
    num_edges: int = struct.field(pytree_node=False)   # original E
    nodes_per_shard: int = struct.field(pytree_node=False)
    edges_per_shard: int = struct.field(pytree_node=False)
    mesh: Mesh = struct.field(pytree_node=False)
    axis: str = struct.field(pytree_node=False, default="graph")

    @property
    def num_shards(self) -> int:
        return self.mesh.shape[self.axis]

    @property
    def padded_nodes(self) -> int:
        return self.nodes_per_shard * self.num_shards

    def node_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(self.axis))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())


def shard_graph(g: Graph, mesh: Mesh, axis: str = "graph") -> ShardedGraph:
    """Host-side partitioning of a Graph over the mesh (see module docstring)."""
    d = mesh.shape[axis]
    n_pad = -(-g.num_nodes // d) * d
    nps = n_pad // d

    indptr = np.asarray(g.indptr)
    src = np.asarray(g.indices)
    dst = np.asarray(g.edge_dst)

    # split edge list at node-block boundaries
    bounds = indptr[np.minimum(np.arange(d + 1) * nps, g.num_nodes)]
    counts = np.diff(bounds)
    eps = int(counts.max()) if len(counts) else 1
    eps = max(eps, 1)

    e_src = np.zeros((d, eps), np.int32)
    e_dst_local = np.full((d, eps), nps, np.int32)   # sentinel → trash row
    for i in range(d):
        lo, hi = bounds[i], bounds[i + 1]
        c = hi - lo
        e_src[i, :c] = src[lo:hi]
        e_dst_local[i, :c] = dst[lo:hi] - i * nps

    in_deg = np.zeros(n_pad, np.int32)
    in_deg[:g.num_nodes] = np.asarray(g.in_degrees)
    out_deg = np.zeros(n_pad, np.int32)
    out_deg[:g.num_nodes] = np.asarray(g.out_degrees)

    edge_shard = NamedSharding(mesh, P(axis))
    node_shard = NamedSharding(mesh, P(axis))
    return ShardedGraph(
        edge_src=jax.device_put(e_src.reshape(-1), edge_shard),
        edge_dst_local=jax.device_put(e_dst_local.reshape(-1), edge_shard),
        in_degrees=jax.device_put(in_deg, node_shard),
        out_degrees=jax.device_put(out_deg, node_shard),
        num_nodes=g.num_nodes, num_edges=g.num_edges,
        nodes_per_shard=nps, edges_per_shard=eps, mesh=mesh, axis=axis,
    )


def _sharded_node_factors(sg: ShardedGraph, norm: str):
    """node_factors against the padded/sharded degree arrays."""
    class _Degrees:
        in_degrees = sg.in_degrees
        out_degrees = sg.out_degrees
    return node_factors(_Degrees, norm)


def sharded_spmm(sg: ShardedGraph, x: jax.Array, norm: str = "sum",
                 k: int | None = None) -> jax.Array:
    """y = A_w @ x over the sharded graph. x: f32[N_pad, dim] sharded by node.

    If k is given, x is MaxK-k-sparse: the collective exchanges the compressed
    CBSR payload ([N,k] values + [N,k] channels) instead of dense rows.
    """
    src_f, dst_f = _sharded_node_factors(sg, norm)
    dim = x.shape[-1]
    axis = sg.axis
    nps, eps = sg.nodes_per_shard, sg.edges_per_shard

    x_in = x if src_f is None else x * src_f[:, None].astype(x.dtype)

    if k is not None and k < dim:
        # CBSR compression before the collective
        from spgemm_gnn_tpu.ops.maxk import cbsr_compact
        values, channels = cbsr_compact(x_in, k)

        def local_cbsr(vals_blk, ch_blk, e_src, e_dst_local):
            vals_g = jax.lax.all_gather(vals_blk, axis, tiled=True)   # [N,k]
            ch_g = jax.lax.all_gather(ch_blk, axis, tiled=True)       # [N,k]
            ev = jnp.take(vals_g, e_src, axis=0)                      # [Eps,k]
            ec = jnp.take(ch_g, e_src, axis=0)                        # [Eps,k]
            acc = jnp.zeros((nps + 1, dim), vals_blk.dtype)
            acc = acc.at[e_dst_local[:, None], ec].add(ev)
            return acc[:nps]

        y = shard_map(
            local_cbsr, mesh=sg.mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=P(axis),
        )(values, channels, sg.edge_src, sg.edge_dst_local)
    else:
        def local_dense(x_blk, e_src, e_dst_local):
            x_g = jax.lax.all_gather(x_blk, axis, tiled=True)         # [N,dim]
            msgs = jnp.take(x_g, e_src, axis=0)                       # [Eps,dim]
            acc = jax.ops.segment_sum(msgs, e_dst_local,
                                      num_segments=nps + 1,
                                      indices_are_sorted=True)
            return acc[:nps]

        y = shard_map(
            local_dense, mesh=sg.mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=P(axis),
        )(x_in, sg.edge_src, sg.edge_dst_local)

    return y if dst_f is None else y * dst_f[:, None].astype(y.dtype)
