"""Tile planning — the TPU analogue of the reference's warp-partition
preprocessing (`kernels/generate_meta.py` + `64_warp_4/<graph>.warp4` metadata,
SURVEY.md §2.1): a host-side, once-per-graph pass that reshapes the CSR edge
list into the static-grid layout the Pallas kernels consume.

Layout (all sizes static):
- destination rows are grouped into **blocks of S rows**; source nodes into
  **blocks of S nodes** (one parameter S because Mosaic's dynamic_gather
  requires index/operand shape equality — see kernels/spgemm_pallas.py);
- edges are bucketed by (dst_block, src_block), ordered by destination row
  within a bucket, and cut into **tiles of S edge slots**;
- each tile is subdivided into **chunks of C slots**; all edges of a chunk hit
  destination rows inside one **window of RW consecutive rows** (the chunk's
  accumulation becomes one [RW, C] @ [C, dim] MXU matmul). Chunks are cut
  greedily (next_cut = min(pos + C, first edge ≥ RW rows ahead)) so padding is
  minimal on skewed degree distributions — this is the analogue of the
  reference's hub-row splitting across warps;
- padding slots carry weight 0 (src_local 0, dst_win 0).

Plans are norm-independent: degree normalisation is applied as node-factor
pre/post scalings outside the kernel (see ops/norms.py), so one plan per
(graph, direction) serves every layer type.
"""
from __future__ import annotations

import numpy as np
from flax import struct

import jax
import jax.numpy as jnp


@struct.dataclass
class TilePlan:
    """Static-grid edge layout for the Pallas SpGEMM/SSpMM kernels.

    W = number of tiles (grid size); S = block/tile size; C = chunk; RW =
    destination-row window.
    """
    ws_dst_block: jax.Array   # i32[W]    out (dst-row) block per tile — sorted
    ws_src_block: jax.Array   # i32[W]    src node block per tile
    e_src_local: jax.Array    # i32[W, S] src id within block; -1 for padding
    e_dst_local: jax.Array    # i32[W, S] dst row offset within dst block; the
    #                           first slot of each chunk is its window start
    #                           (chunks are never empty unless fully padded)
    num_tiles: int = struct.field(pytree_node=False)
    block_size: int = struct.field(pytree_node=False)       # S
    chunk: int = struct.field(pytree_node=False)            # C
    window: int = struct.field(pytree_node=False)           # RW
    n_dst_blocks: int = struct.field(pytree_node=False)
    n_src_blocks: int = struct.field(pytree_node=False)
    num_edges: int = struct.field(pytree_node=False)        # real edges

    @property
    def padded_dst(self) -> int:
        return self.n_dst_blocks * self.block_size

    @property
    def padded_src(self) -> int:
        return self.n_src_blocks * self.block_size

    @property
    def fill(self) -> float:
        """Fraction of edge slots holding real edges."""
        return self.num_edges / float(self.num_tiles * self.block_size)


def build_tile_plan(indptr: np.ndarray, indices: np.ndarray, num_nodes: int,
                    *, block_size: int = 2048, chunk: int = 256,
                    window: int = 8, use_native: bool = True) -> TilePlan:
    """Build a TilePlan from an (in-)CSR structure.

    For the backward (SSpMM) plan, pass the transpose CSR (t_indptr/t_indices):
    the planner is direction-agnostic — "dst" is simply the CSR row axis.
    """
    S, C, RW = block_size, chunk, window
    if S % C:
        raise ValueError("block_size must be a multiple of chunk")
    if RW < 8:
        # windows start 8-aligned (TPU sublane slice alignment); RW < 8 could
        # exclude a chunk's own first row from its window
        raise ValueError("window must be >= 8")
    indptr = np.asarray(indptr, np.int64)

    # native fast path (bit-identical output; tests/test_native.py)
    from spgemm_gnn_tpu.graphs import native
    if use_native and native.available():
        res = native.build_plan_arrays(indptr, np.asarray(indices, np.int32),
                                       num_nodes, S, C, RW)
        if res is not None:
            ws_dst, ws_src, e_src_local, e_dst_local = res
            nb = max(-(-num_nodes // S), 1)
            return TilePlan(
                ws_dst_block=jnp.asarray(ws_dst),
                ws_src_block=jnp.asarray(ws_src),
                e_src_local=jnp.asarray(e_src_local),
                e_dst_local=jnp.asarray(e_dst_local),
                num_tiles=len(ws_dst), block_size=S, chunk=C, window=RW,
                n_dst_blocks=nb, n_src_blocks=nb,
                num_edges=int(indptr[-1]),
            )

    src = np.asarray(indices, np.int64)
    E = src.shape[0]
    n_dst_blocks = max(-(-num_nodes // S), 1)
    n_src_blocks = max(-(-num_nodes // S), 1)

    # per-edge dst row (CSR row expansion) and block keys
    dst = np.repeat(np.arange(len(indptr) - 1, dtype=np.int64),
                    np.diff(indptr))
    order = np.lexsort((src, dst, src // S, dst // S))
    src_o, dst_o = src[order], dst[order]
    bucket = (dst_o // S) * n_src_blocks + (src_o // S)

    # bucket run boundaries
    run_starts = np.flatnonzero(np.r_[True, bucket[1:] != bucket[:-1]])
    run_ends = np.r_[run_starts[1:], E]

    # greedy chunking inside each bucket run: next cut = min(pos + C, first
    # position whose dst row leaves the chunk's 8-aligned RW-row window).
    # Windows start at (row0 // 8) * 8 — TPU sublane dynamic slices must be
    # 8-aligned (Mosaic cannot prove alignment of arbitrary starts).
    chunk_slices: list[tuple[int, int]] = []   # (start, end) per chunk
    for rs, re in zip(run_starts, run_ends):
        rows = dst_o[rs:re]
        win0 = (rows // 8) * 8
        # limit[p] = first local index with row >= aligned_window(p) + RW
        limit = np.searchsorted(rows, win0 + RW, side="left")
        p = 0
        n = re - rs
        while p < n:
            q = min(p + C, int(limit[p]))
            chunk_slices.append((rs + p, rs + q))
            p = q

    # pack chunks into tiles of S//C chunks, not crossing bucket boundaries;
    # then pad. Tiles must be grouped by dst block (sorted already: buckets
    # are ordered by (dst_block, src_block) and chunks by position).
    cpt = S // C
    tiles: list[list[tuple[int, int]]] = []
    cur: list[tuple[int, int]] = []
    cur_bucket = -1
    for (s, e) in chunk_slices:
        b = bucket[s]
        if b != cur_bucket or len(cur) == cpt:
            if cur:
                tiles.append(cur)
            cur = []
            cur_bucket = b
        cur.append((s, e))
    if cur:
        tiles.append(cur)

    # guarantee every dst block appears (empty blocks still need zeroing)
    present = {int(dst_o[t[0][0]]) // S for t in tiles} if tiles else set()
    missing = [b for b in range(n_dst_blocks) if b not in present]

    W = len(tiles) + len(missing)
    ws_dst = np.zeros(W, np.int32)
    ws_src = np.zeros(W, np.int32)
    e_src_local = np.full((W, S), -1, np.int32)   # -1 ⇒ padding slot
    e_dst_local = np.zeros((W, S), np.int32)

    items = []
    for t in tiles:
        items.append((int(dst_o[t[0][0]]) // S, t))
    for b in missing:
        items.append((b, []))
    items.sort(key=lambda x: x[0])

    for w, (dblk, t) in enumerate(items):
        ws_dst[w] = dblk
        if not t:
            continue
        s0 = t[0][0]
        ws_src[w] = int(src_o[s0]) // S
        for ci, (s, e) in enumerate(t):
            n = e - s
            base = ci * C
            rows = dst_o[s:e]
            e_src_local[w, base:base + n] = src_o[s:e] - ws_src[w] * S
            e_dst_local[w, base:base + n] = rows - dblk * S
            # padding slots replicate the chunk's window start so the
            # in-kernel (row - row[chunk_start]) offsets stay in [0, RW)
            e_dst_local[w, base + n:base + C] = rows[0] - dblk * S

    return TilePlan(
        ws_dst_block=jnp.asarray(ws_dst), ws_src_block=jnp.asarray(ws_src),
        e_src_local=jnp.asarray(e_src_local),
        e_dst_local=jnp.asarray(e_dst_local),
        num_tiles=W, block_size=S, chunk=C, window=RW,
        n_dst_blocks=n_dst_blocks, n_src_blocks=n_src_blocks, num_edges=E,
    )


def auto_tile_params(num_nodes: int, num_edges: int,
                     block_size: int = 2048) -> tuple[int, int]:
    """Pick (chunk, window) from graph density.

    λ = expected edges per (destination row, source block). The chunk reduction
    is one [RW, C] @ [C, dim] matmul, so per-edge MXU cost ≈ RW·C·dim /
    min(C, λ·RW): pick the smallest window whose expected chunk occupancy
    λ·RW reaches the chunk size (the TPU analogue of the reference's
    density-dependent warp sizing, README_INTEGRATED.md:253-257)."""
    n_src_blocks = max(-(-num_nodes // block_size), 1)
    avg_deg = num_edges / max(num_nodes, 1)
    lam = avg_deg / n_src_blocks
    C = 128
    rw = C / max(lam, 1e-6)
    RW = 8
    while RW < rw and RW < 128:
        RW *= 2
    return C, RW


def plan_for_graph(g, *, transpose: bool = False, block_size: int = 2048,
                   chunk: int | None = None,
                   window: int | None = None) -> TilePlan:
    """TilePlan for a Graph's forward (in-CSR) or transpose (out-CSR) edges.

    chunk/window default to density-tuned values (auto_tile_params)."""
    if chunk is None or window is None:
        c_auto, rw_auto = auto_tile_params(g.num_nodes, g.num_edges,
                                           block_size)
        chunk = chunk or c_auto
        window = window or rw_auto
    indptr = g.t_indptr if transpose else g.indptr
    indices = g.t_indices if transpose else g.indices
    return build_tile_plan(np.asarray(indptr), np.asarray(indices),
                           g.num_nodes, block_size=block_size, chunk=chunk,
                           window=window)
