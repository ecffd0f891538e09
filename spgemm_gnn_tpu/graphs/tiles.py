"""Tile planning — the TPU analogue of the reference's warp-partition
preprocessing (`kernels/generate_meta.py` + `64_warp_4/<graph>.warp4` metadata,
SURVEY.md §2.1): a host-side, once-per-graph pass that reshapes the CSR edge
list into the static-grid layout the Pallas kernel consumes.

Layout (all sizes static):
- destination rows are grouped into **blocks of R rows** (one kernel output
  block each); source nodes into **blocks of B nodes** (one VMEM-resident
  feature block each);
- edges are bucketed by (dst_block, src_block), ordered by destination row
  within a bucket, and cut into **tiles of S edge slots** (the kernel grid);
- each tile divides into **chunks of C=128 slots** (the TPU lane width — the
  in-kernel gather operates on one 128-lane vector register per step); all
  edges of a chunk hit destination rows inside one **8-aligned window of RW
  consecutive rows**, so the chunk's accumulation is a single
  [RW, C] @ [C, dim] MXU matmul. Chunks are cut greedily (next cut =
  min(pos + C, first edge past the aligned window)) so padding stays small on
  skewed degree distributions — the analogue of the reference's hub-row
  splitting across warps;
- padding slots carry src_local = -1.

Plans are norm-independent: degree normalisation is applied as node-factor
pre/post scalings outside the kernel (see ops/norms.py), so one plan per
(graph, direction) serves every layer type. The same plan geometry serves the
backward pass: the sampled SSpMM is the forward kernel run on the transpose
plan with the upstream gradient as the feature matrix, sampled at the CBSR
channels afterwards (see kernels/spgemm_pallas.py).
"""
from __future__ import annotations

import numpy as np
from flax import struct

import jax
import jax.numpy as jnp

CHUNK = 128   # lane width; fixed by the slab-gather kernel design


@struct.dataclass
class TilePlan:
    """Static-grid edge layout for the Pallas windowed-SpMM kernel.

    W = number of tiles (grid size); S = edge slots per tile; B = source block
    (nodes); R = destination block (rows); RW = destination-row window.
    """
    ws_dst_block: jax.Array   # i32[W]    dst (output) block per tile — sorted
    ws_src_block: jax.Array   # i32[W]    src (feature) block per tile
    e_src_local: jax.Array    # i16[W, S] src id within block; -1 for padding
    #                           (int16 halves the host→device plan transfer;
    #                           the kernel widens to i32 on device)
    e_dst_local: jax.Array    # i16[W, S] dst row offset within dst block; the
    #                           first slot of each chunk determines its
    #                           8-aligned window start
    num_tiles: int = struct.field(pytree_node=False)
    tile_slots: int = struct.field(pytree_node=False)       # S
    src_block: int = struct.field(pytree_node=False)        # B
    dst_block: int = struct.field(pytree_node=False)        # R
    window: int = struct.field(pytree_node=False)           # RW
    n_dst_blocks: int = struct.field(pytree_node=False)
    n_src_blocks: int = struct.field(pytree_node=False)
    num_edges: int = struct.field(pytree_node=False)        # real edges

    @property
    def padded_dst(self) -> int:
        return self.n_dst_blocks * self.dst_block

    @property
    def padded_src(self) -> int:
        return self.n_src_blocks * self.src_block

    @property
    def fill(self) -> float:
        """Fraction of edge slots holding real edges."""
        return self.num_edges / float(self.num_tiles * self.tile_slots)


def auto_window(num_nodes: int, num_edges: int, src_block: int,
                num_src_nodes: int | None = None) -> int:
    """Density-tuned destination-row window.

    λ = expected edges per (destination row, source block); the smallest
    8-multiple window with λ·RW ≳ CHUNK keeps chunks full (the TPU analogue of
    the reference's density-dependent warp sizing,
    README_INTEGRATED.md:253-257)."""
    n_src = num_src_nodes if num_src_nodes is not None else num_nodes
    n_src_blocks = max(-(-n_src // src_block), 1)
    avg_deg = num_edges / max(num_nodes, 1)
    lam = avg_deg / n_src_blocks
    rw = 8
    while rw * lam < CHUNK and rw < 256:
        rw *= 2
    return rw


# src_block candidates for auto selection, and the chunk-fill level below
# which shrinking B stops paying. Measured on-chip (docs/DESIGN.md §cost
# model): per-edge VPU slab work ∝ B/128 while the MXU window term ∝ RW/fill,
# so the smallest B whose chunks stay ≳60% full wins in every regime tested
# (scripts/plan_tune.py sweeps, RESULTS.md §plan geometry).
SRC_BLOCK_CHOICES = (128, 256, 512)
SRC_BLOCK_FILL_TARGET = 0.6


def auto_src_block(num_nodes: int, num_edges: int,
                   num_src_nodes: int | None = None) -> int:
    """Smallest source block whose predicted chunk fill clears the target
    (falls back to the fullest candidate when none does — the low-degree
    regime, where plan_graph switches to the StreamPlan anyway)."""
    from spgemm_gnn_tpu.graphs.stream_tiles import predicted_windowed_fill
    n_src = num_src_nodes if num_src_nodes is not None else num_nodes
    best, best_fill = SRC_BLOCK_CHOICES[-1], -1.0
    for b in SRC_BLOCK_CHOICES:
        rw = auto_window(num_nodes, num_edges, b, num_src_nodes=n_src)
        f = predicted_windowed_fill(num_nodes, num_edges, b, n_src, rw)
        if f >= SRC_BLOCK_FILL_TARGET:
            return b
        if f > best_fill:
            best, best_fill = b, f
    return best


def build_tile_plan(indptr: np.ndarray, indices: np.ndarray, num_nodes: int,
                    *, tile_slots: int = 1024, src_block: int = 256,
                    dst_block: int = 4096, window: int | None = None,
                    num_src_nodes: int | None = None,
                    use_native: bool = True) -> TilePlan:
    """Build a TilePlan from an (in-)CSR structure.

    For the backward (SSpMM) plan, pass the transpose CSR (t_indptr/t_indices):
    the planner is direction-agnostic — "dst" is simply the CSR row axis.
    num_src_nodes: size of the source (column) id space when it differs from
    the row count — e.g. per-shard plans whose rows are a local node block but
    whose columns index the global node space (parallel/planned_sharded.py).
    """
    S, B, R = tile_slots, src_block, dst_block
    C = CHUNK
    if S % C:
        raise ValueError("tile_slots must be a multiple of 128")
    indptr = np.asarray(indptr, np.int64)
    E = int(indptr[-1])
    n_src = num_src_nodes if num_src_nodes is not None else num_nodes
    if window is None:
        window = min(auto_window(num_nodes, E, B, num_src_nodes=n_src), R)
    RW = window
    if RW < 8 or RW % 8:
        raise ValueError("window must be a positive multiple of 8")
    if RW > R:
        raise ValueError("window cannot exceed dst_block")
    if B > 32767 or R > 32767:
        raise ValueError("src_block/dst_block must fit int16 slot encoding")
    n_dst_blocks = max(-(-num_nodes // R), 1)
    n_src_blocks = max(-(-n_src // B), 1)

    # native fast path (bit-identical output; tests/test_native.py)
    from spgemm_gnn_tpu.graphs import native
    if use_native and native.available():
        res = native.build_plan_arrays(indptr, np.asarray(indices, np.int32),
                                       num_nodes, S, C, RW, B, R, n_src)
        if res is not None:
            ws_dst, ws_src, e_src_local, e_dst_local = res
            return TilePlan(
                ws_dst_block=jnp.asarray(ws_dst),
                ws_src_block=jnp.asarray(ws_src),
                e_src_local=jnp.asarray(e_src_local),
                e_dst_local=jnp.asarray(e_dst_local),
                num_tiles=len(ws_dst), tile_slots=S, src_block=B,
                dst_block=R, window=RW, n_dst_blocks=n_dst_blocks,
                n_src_blocks=n_src_blocks, num_edges=E,
            )

    src = np.asarray(indices, np.int64)

    # per-edge dst row (CSR row expansion) and block keys
    dst = np.repeat(np.arange(len(indptr) - 1, dtype=np.int64),
                    np.diff(indptr))
    order = np.lexsort((src, dst, src // B, dst // R))
    src_o, dst_o = src[order], dst[order]
    bucket = (dst_o // R) * n_src_blocks + (src_o // B)

    # bucket run boundaries
    run_starts = np.flatnonzero(np.r_[True, bucket[1:] != bucket[:-1]])
    run_ends = np.r_[run_starts[1:], E]

    # greedy chunking inside each bucket run: next cut = min(pos + C, first
    # position whose dst row leaves the chunk's 8-aligned RW-row window)
    chunk_slices: list[tuple[int, int]] = []   # (start, end) per chunk
    for rs, re in zip(run_starts, run_ends):
        rows = dst_o[rs:re]
        win0 = (rows // 8) * 8
        limit = np.searchsorted(rows, win0 + RW, side="left")
        p = 0
        n = re - rs
        while p < n:
            q = min(p + C, int(limit[p]))
            chunk_slices.append((rs + p, rs + q))
            p = q

    # pack chunks into tiles (same bucket, ≤ S/C chunks)
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
    present = {int(dst_o[t[0][0]]) // R for t in tiles} if tiles else set()
    missing = [b for b in range(n_dst_blocks) if b not in present]

    W = len(tiles) + len(missing)
    ws_dst = np.zeros(W, np.int32)
    ws_src = np.zeros(W, np.int32)
    e_src_local = np.full((W, S), -1, np.int16)   # -1 ⇒ padding slot
    e_dst_local = np.zeros((W, S), np.int16)

    items = []
    for t in tiles:
        items.append((int(dst_o[t[0][0]]) // R, t))
    for b in missing:
        items.append((b, []))
    items.sort(key=lambda x: x[0])

    for w, (dblk, t) in enumerate(items):
        ws_dst[w] = dblk
        if not t:
            continue
        s0 = t[0][0]
        ws_src[w] = int(src_o[s0]) // B
        for ci, (s, e) in enumerate(t):
            n = e - s
            base = ci * C
            rows = dst_o[s:e]
            e_src_local[w, base:base + n] = src_o[s:e] - ws_src[w] * B
            e_dst_local[w, base:base + n] = rows - dblk * R
            # padding slots replicate the chunk's window start so the
            # in-kernel aligned-window offsets stay in [0, RW)
            e_dst_local[w, base + n:base + C] = rows[0] - dblk * R

    return TilePlan(
        ws_dst_block=jnp.asarray(ws_dst), ws_src_block=jnp.asarray(ws_src),
        e_src_local=jnp.asarray(e_src_local),
        e_dst_local=jnp.asarray(e_dst_local),
        num_tiles=W, tile_slots=S, src_block=B, dst_block=R, window=RW,
        n_dst_blocks=n_dst_blocks, n_src_blocks=n_src_blocks, num_edges=E,
    )


@struct.dataclass
class MultiTilePlan:
    """A set of TilePlans over DISJOINT (dst-block, src-block) bucket classes
    of one graph, each with its own destination-row window RW.

    Why: with a single static RW, λ = edges per (dst row, src block) varies
    ~4× across buckets of a power-law graph (full-Reddit 10th/90th pct:
    0.22/0.85), so dense buckets pay an oversized one-hot scatter (cost
    ∝ RW) while sparse buckets pay low chunk fill. Each bucket goes to the
    window class minimizing the measured per-chunk cost model (below), and
    the kernel — unchanged, branch-free — runs once per class; outputs sum.
    (VERDICT r3 #1; calibration: KERNEL_ABLATE/PLANTUNE_FULL_r04.)
    """
    plans: tuple    # TilePlan per class, same B/R/node spaces, distinct RW

    @property
    def padded_dst(self) -> int:
        return self.plans[0].padded_dst

    @property
    def padded_src(self) -> int:
        return self.plans[0].padded_src

    @property
    def src_block(self) -> int:
        return self.plans[0].src_block

    @property
    def window(self) -> int:
        return max(p.window for p in self.plans)

    @property
    def num_edges(self) -> int:
        return sum(p.num_edges for p in self.plans)

    @property
    def num_tiles(self) -> int:
        return sum(p.num_tiles for p in self.plans)

    @property
    def tile_slots(self) -> int:
        return self.plans[0].tile_slots

    @property
    def fill(self) -> float:
        return self.num_edges / float(sum(p.num_tiles * p.tile_slots
                                          for p in self.plans))


# measured per-chunk cost model on the v5e (bf16x2, dim 256 — r4 ablation
# KERNEL_ABLATE: plain 169 ns at B=256/RW=256 = fixed 106 [99 floor + slab
# gather beyond B=128] + 0.24·RW one-hot scatter dots), and the greedy
# chunking efficiency at λ·RW ≈ C measured from plan fills (0.725 at
# λRW=136 ⇒ edges/chunk ≈ 0.68·λ·RW until the 128 cap).
CHUNK_FIXED_NS = 106.0
CHUNK_NS_PER_WINDOW_ROW = 0.24
CHUNK_GREEDY_EFF = 0.68
WINDOW_CLASSES = (64, 128, 256, 512, 1024)


def _class_cost(lam: np.ndarray, rw: int) -> np.ndarray:
    """Modeled cost per EDGE for buckets of density lam at window rw."""
    per_chunk = np.minimum(128.0, CHUNK_GREEDY_EFF * lam * rw)
    return (CHUNK_FIXED_NS + CHUNK_NS_PER_WINDOW_ROW * rw) / np.maximum(
        per_chunk, 1e-9)


def build_tile_plan_classes(indptr: np.ndarray, indices: np.ndarray,
                            num_nodes: int, *, tile_slots: int = 1024,
                            src_block: int = 256, dst_block: int = 4096,
                            classes: tuple = WINDOW_CLASSES,
                            num_src_nodes: int | None = None,
                            min_edge_share: float = 0.02,
                            use_native: bool = True) -> MultiTilePlan:
    """Partition buckets into per-density window classes and build one
    TilePlan per class (see MultiTilePlan). Classes attracting less than
    min_edge_share of the edges are merged into their neighbors."""
    indptr = np.asarray(indptr, np.int64)
    src = np.asarray(indices, np.int64)
    n_src = num_src_nodes if num_src_nodes is not None else num_nodes
    B, R = src_block, dst_block
    nsrc = max(-(-n_src // B), 1)
    dst = np.repeat(np.arange(num_nodes, dtype=np.int64), np.diff(indptr))
    bucket = (dst // R) * nsrc + (src // B)
    ub, inv, cnt = np.unique(bucket, return_inverse=True, return_counts=True)
    lam = cnt / float(R)
    costs = np.stack([_class_cost(lam, rw) for rw in classes], axis=1)
    choice = np.argmin(costs, axis=1)                     # class per bucket
    # merge classes that attract a negligible edge share (each class is a
    # separate kernel launch + compile)
    total = float(cnt.sum())
    for ci in range(len(classes)):
        mask = choice == ci
        share = cnt[mask].sum() / max(total, 1.0)
        if 0 < share < min_edge_share:
            sub = costs[mask].copy()
            sub[:, ci] = np.inf
            choice[mask] = np.argmin(sub, axis=1)
    edge_class = choice[inv]
    plans = []
    for ci, rw in enumerate(classes):
        mask = edge_class == ci
        if not mask.any():
            continue
        sub_dst = dst[mask]
        sub_src = src[mask].astype(np.int32)
        sub_ptr = np.zeros(num_nodes + 1, np.int64)
        sub_ptr[1:] = np.cumsum(np.bincount(sub_dst, minlength=num_nodes))
        plans.append(build_tile_plan(
            sub_ptr, sub_src, num_nodes, tile_slots=tile_slots,
            src_block=B, dst_block=R, window=min(rw, R),
            num_src_nodes=n_src, use_native=use_native))
    if not plans:   # empty graph: one empty plan keeps shapes well-defined
        plans.append(build_tile_plan(indptr, indices, num_nodes,
                                     tile_slots=tile_slots, src_block=B,
                                     dst_block=R, window=min(classes[0], R),
                                     num_src_nodes=n_src,
                                     use_native=use_native))
    return MultiTilePlan(plans=tuple(plans))


def plan_for_graph(g, *, transpose: bool = False, tile_slots: int = 1024,
                   src_block: int = 256, dst_block: int = 4096,
                   window: int | None = None) -> TilePlan:
    """TilePlan for a Graph's forward (in-CSR) or transpose (out-CSR) edges.

    window defaults to the density-tuned value (auto_window)."""
    indptr = g.t_indptr if transpose else g.indptr
    indices = g.t_indices if transpose else g.indices
    return build_tile_plan(np.asarray(indptr), np.asarray(indices),
                           g.num_nodes, tile_slots=tile_slots,
                           src_block=src_block, dst_block=dst_block,
                           window=window)
