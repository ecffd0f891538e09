"""Multi-chip aggregation through the Pallas kernels: per-shard tile plans
under shard_map.

Layout: the graph is partitioned by destination-node blocks over the 1-D mesh
(as in parallel/sharded.py). Each device builds a TilePlan for its own
in-edges — rows are its local destination block, columns index the *global*
node space — and runs the windowed-SpMM Pallas kernel on the all-gathered
feature matrix:

  forward:  y_local = Kernel(plan_d,  all_gather(x)ᵀ)              (per shard)
  backward: dx      = psum_scatter(Kernel(plan_dᵀ, all_gather(g)ᵀ))

The backward per-shard plan spans the global row space (each shard produces a
partial dense cotangent from its own edges); the reduce-scatter both sums the
partials and re-shards the result — the transpose of the forward's all-gather.

Per-shard plans have different tile counts; they are padded to the common
maximum with no-op tiles that repeat the last tile's destination block (so the
kernel's first-visit zeroing cannot re-trigger) and carry only padding slots.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spgemm_gnn_tpu.graphs.csr import Graph
from spgemm_gnn_tpu.graphs.tiles import TilePlan, build_tile_plan
from spgemm_gnn_tpu.kernels.spgemm_pallas import planned_spmm
from spgemm_gnn_tpu.ops.norms import node_factors


@struct.dataclass
class ShardedPlan:
    """Per-shard tile plans, stacked on a leading device axis and sharded."""
    ws_dst_block: jax.Array   # i32[D, W]
    ws_src_block: jax.Array   # i32[D, W]
    e_src_local: jax.Array    # i16[D, W, S]
    e_dst_local: jax.Array    # i16[D, W, S]
    num_tiles: int = struct.field(pytree_node=False)        # padded W
    tile_slots: int = struct.field(pytree_node=False)
    src_block: int = struct.field(pytree_node=False)
    dst_block: int = struct.field(pytree_node=False)
    window: int = struct.field(pytree_node=False)
    n_dst_blocks: int = struct.field(pytree_node=False)     # per shard
    n_src_blocks: int = struct.field(pytree_node=False)     # global
    num_edges: int = struct.field(pytree_node=False)

    def local_plan(self, wsd, wss, esrc, edst) -> TilePlan:
        """Rebuild a TilePlan from shard_map-local array blocks."""
        return TilePlan(
            ws_dst_block=wsd, ws_src_block=wss,
            e_src_local=esrc, e_dst_local=edst,
            num_tiles=self.num_tiles, tile_slots=self.tile_slots,
            src_block=self.src_block, dst_block=self.dst_block,
            window=self.window, n_dst_blocks=self.n_dst_blocks,
            n_src_blocks=self.n_src_blocks, num_edges=self.num_edges)


@struct.dataclass
class ShardedPlannedGraph:
    """Edge-partitioned graph + per-shard Pallas plans (fwd and bwd)."""
    fwd: ShardedPlan
    bwd: ShardedPlan
    in_degrees: jax.Array     # i32[N_pad] sharded by node
    out_degrees: jax.Array
    num_nodes: int = struct.field(pytree_node=False)
    num_edges: int = struct.field(pytree_node=False)
    nodes_per_shard: int = struct.field(pytree_node=False)
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


def _pad_stack(plans: list[TilePlan], mesh: Mesh, axis: str) -> ShardedPlan:
    w_max = max(p.num_tiles for p in plans)
    s = plans[0].tile_slots
    wsd = np.zeros((len(plans), w_max), np.int32)
    wss = np.zeros((len(plans), w_max), np.int32)
    esrc = np.full((len(plans), w_max, s), -1, np.int16)
    edst = np.zeros((len(plans), w_max, s), np.int16)
    for d, p in enumerate(plans):
        w = p.num_tiles
        wsd[d, :w] = np.asarray(p.ws_dst_block)
        wss[d, :w] = np.asarray(p.ws_src_block)
        esrc[d, :w] = np.asarray(p.e_src_local)
        edst[d, :w] = np.asarray(p.e_dst_local)
        # no-op padding tiles: repeat the last dst block so first-visit
        # zeroing never re-triggers; slots are all -1 (padding)
        wsd[d, w:] = wsd[d, w - 1] if w else 0
    sh = NamedSharding(mesh, P(axis))
    p0 = plans[0]
    return ShardedPlan(
        ws_dst_block=jax.device_put(wsd, sh),
        ws_src_block=jax.device_put(wss, sh),
        e_src_local=jax.device_put(esrc, sh),
        e_dst_local=jax.device_put(edst, sh),
        num_tiles=w_max, tile_slots=s, src_block=p0.src_block,
        dst_block=p0.dst_block, window=p0.window,
        n_dst_blocks=p0.n_dst_blocks, n_src_blocks=p0.n_src_blocks,
        num_edges=sum(p.num_edges for p in plans),
    )


def shard_planned_graph(g: Graph, mesh: Mesh, axis: str = "graph", *,
                        tile_slots: int = 1024, src_block: int = 256,
                        dst_block: int = 2048,
                        window: int | None = None) -> ShardedPlannedGraph:
    """Partition the graph by destination blocks and build per-shard plans."""
    d = mesh.shape[axis]
    nps = -(-g.num_nodes // d)
    nps = -(-nps // dst_block) * dst_block      # align shard size to R
    n_pad = nps * d

    indptr = np.asarray(g.indptr, np.int64)
    indices = np.asarray(g.indices)

    if window is None:
        from spgemm_gnn_tpu.graphs.tiles import auto_window
        window = auto_window(g.num_nodes, g.num_edges, src_block,
                             num_src_nodes=n_pad)

    fwd_plans, bwd_plans = [], []
    for i in range(d):
        lo, hi = i * nps, min((i + 1) * nps, g.num_nodes)
        if lo >= g.num_nodes:
            loc_ptr = np.zeros(nps + 1, np.int64)
            loc_idx = np.zeros(0, np.int32)
        else:
            loc_ptr = indptr[lo:hi + 1] - indptr[lo]
            if hi - lo < nps:
                loc_ptr = np.concatenate(
                    [loc_ptr, np.full(nps - (hi - lo), loc_ptr[-1])])
            loc_idx = indices[indptr[lo]:indptr[hi]]
        fwd_plans.append(build_tile_plan(
            loc_ptr, loc_idx, nps, tile_slots=tile_slots,
            src_block=src_block, dst_block=dst_block, window=window,
            num_src_nodes=n_pad))

        # backward: this shard's edges transposed — rows = global source u,
        # columns = destination v (local to this shard, but offset to global
        # ids so every shard gathers from the same global g layout)
        if lo >= g.num_nodes:
            t_ptr = np.zeros(n_pad + 1, np.int64)
            t_idx = np.zeros(0, np.int32)
        else:
            # build CSR over global rows from this shard's edge list
            e_src = indices[indptr[lo]:indptr[hi]].astype(np.int64)
            e_dst = (np.repeat(np.arange(lo, hi, dtype=np.int64),
                               np.diff(indptr[lo:hi + 1])))
            order = np.argsort(e_src * n_pad + e_dst, kind="stable")
            t_ptr = np.zeros(n_pad + 1, np.int64)
            np.add.at(t_ptr, e_src + 1, 1)
            np.cumsum(t_ptr, out=t_ptr)
            t_idx = e_dst[order].astype(np.int32)
        bwd_plans.append(build_tile_plan(
            t_ptr, t_idx, n_pad, tile_slots=tile_slots,
            src_block=src_block, dst_block=dst_block, window=window,
            num_src_nodes=n_pad))

    in_deg = np.zeros(n_pad, np.int32)
    in_deg[:g.num_nodes] = np.asarray(g.in_degrees)
    out_deg = np.zeros(n_pad, np.int32)
    out_deg[:g.num_nodes] = np.asarray(g.out_degrees)
    node_sh = NamedSharding(mesh, P(axis))
    return ShardedPlannedGraph(
        fwd=_pad_stack(fwd_plans, mesh, axis),
        bwd=_pad_stack(bwd_plans, mesh, axis),
        in_degrees=jax.device_put(in_deg, node_sh),
        out_degrees=jax.device_put(out_deg, node_sh),
        num_nodes=g.num_nodes, num_edges=g.num_edges,
        nodes_per_shard=nps, mesh=mesh, axis=axis,
    )


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _run_shard_kernel(sp: ShardedPlan, x_blk, wsd, wss, esrc, edst, axis,
                      out_rows: int):
    """all_gather features, run the local plan kernel, return [out_rows, dim]."""
    x_full = jax.lax.all_gather(x_blk, axis, tiled=True)    # [N_pad, dim]
    xt = x_full.T                                            # [dim, N_pad]
    pad = sp.n_src_blocks * sp.src_block - xt.shape[1]
    if pad:
        xt = jnp.pad(xt, ((0, 0), (0, pad)))
    plan = sp.local_plan(wsd[0], wss[0], esrc[0], edst[0])
    from spgemm_gnn_tpu.kernels import planned as _planned
    y = planned_spmm(plan, xt, stream=_planned.DEFAULT_STREAM,
                     interpret=_interpret())
    return y[:out_rows]


def _run_shard_kernel_cbsr(sp: ShardedPlan, vals_blk, ch_blk, dim, wsd, wss,
                           esrc, edst, axis, out_rows: int):
    """CBSR-compressed exchange: all_gather k values + k channel ids per node
    (k ≪ dim — the distributed payoff of the CBSR layout, SURVEY.md §7.3),
    densify on-device with the Pallas densify kernel, then run the plan
    kernel."""
    from spgemm_gnn_tpu.kernels.spgemm_pallas import densify_transpose
    vals_full = jax.lax.all_gather(vals_blk, axis, tiled=True)  # [N_pad, k]
    ch_full = jax.lax.all_gather(ch_blk, axis, tiled=True)      # [N_pad, k]
    n_cols = sp.n_src_blocks * sp.src_block
    xt = densify_transpose(vals_full, ch_full, dim, n_cols,
                           interpret=_interpret())               # [dim, cols]
    plan = sp.local_plan(wsd[0], wss[0], esrc[0], edst[0])
    from spgemm_gnn_tpu.kernels import planned as _planned
    y = planned_spmm(plan, xt, stream=_planned.DEFAULT_STREAM,
                     interpret=_interpret())
    return y[:out_rows]


def _scale(x, f):
    return x if f is None else x * f[:, None].astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _sharded_planned(x, src_f, dst_f, spg, k):
    return _sharded_planned_fwd(x, src_f, dst_f, spg, k)[0]


def _sharded_planned_fwd(x, src_f, dst_f, spg, k):
    axis = spg.axis
    sp = spg.fwd
    xs = _scale(x, src_f)
    dim = x.shape[-1]

    if k is not None and k < dim:
        # compress BEFORE the collective: k values + k channels per node
        from spgemm_gnn_tpu.ops.maxk import cbsr_from_masked
        vals, ch = cbsr_from_masked(xs, k)

        def body(v_blk, c_blk, wsd, wss, esrc, edst):
            return _run_shard_kernel_cbsr(sp, v_blk, c_blk, dim, wsd, wss,
                                          esrc, edst, axis,
                                          spg.nodes_per_shard)

        y = shard_map(
            body, mesh=spg.mesh,
            in_specs=(P(axis),) * 6,
            out_specs=P(axis), check_vma=False,
        )(vals, ch, sp.ws_dst_block, sp.ws_src_block, sp.e_src_local,
          sp.e_dst_local)
    else:
        def body(x_blk, wsd, wss, esrc, edst):
            return _run_shard_kernel(sp, x_blk, wsd, wss, esrc, edst, axis,
                                     spg.nodes_per_shard)

        y = shard_map(
            body, mesh=spg.mesh,
            in_specs=(P(axis),) * 5,
            out_specs=P(axis), check_vma=False,  # pallas outputs carry no vma
        )(xs, sp.ws_dst_block, sp.ws_src_block, sp.e_src_local,
          sp.e_dst_local)
    return _scale(y, dst_f), (src_f, dst_f, spg)


def _sharded_planned_bwd(k, res, g):
    src_f, dst_f, spg = res
    axis = spg.axis
    sp = spg.bwd
    gs = _scale(g, dst_f)

    def body(g_blk, wsd, wss, esrc, edst):
        # partial dense cotangent over the GLOBAL row space from local edges
        z = _run_shard_kernel(sp, g_blk, wsd, wss, esrc, edst, axis,
                              spg.padded_nodes)
        # sum partials over shards and re-shard by node (transpose of the
        # forward all_gather)
        return jax.lax.psum_scatter(z, axis, scatter_dimension=0, tiled=True)

    dx = shard_map(
        body, mesh=spg.mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis), check_vma=False,   # pallas_call outputs carry no vma
    )(gs, sp.ws_dst_block, sp.ws_src_block, sp.e_src_local, sp.e_dst_local)
    return (_scale(dx, src_f), None, None, None)


_sharded_planned.defvjp(_sharded_planned_fwd, _sharded_planned_bwd)


def sharded_planned_aggregate(spg: ShardedPlannedGraph, x: jax.Array,
                              norm: str = "sum",
                              k: int | None = None) -> jax.Array:
    """y = A_w · x across the mesh through the per-shard Pallas kernels.

    With k set (MaxK-sparse x), the collective exchanges the CBSR payload —
    k values + k channel ids per node instead of dim — the distributed payoff
    of the compressed layout (forward only; the backward cotangent is dense).
    """
    src_f, dst_f = node_factors(spg, norm)
    return _sharded_planned(x, src_f, dst_f, spg, k)
