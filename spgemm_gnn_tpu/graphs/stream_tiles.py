"""Stream tile planning — the low-degree companion of graphs/tiles.py.

The windowed TilePlan buckets edges by (dst block, src block) so the kernel can
gather from a VMEM-resident source block. That only fills its 128-edge chunks
when a source block contributes many edges per destination window — i.e. on
dense graphs (Reddit/proteins regime, avg degree ≳ 50). On the low-degree
graphs (flickr/yelp/products, avg degree 10–50 — the regime where the reference
CUDA kernels still run, `/root/reference/README.md:72-78,136`) the bucketed
fill collapses below 3% and the windowed kernel loses to plain XLA.

The StreamPlan drops source blocking entirely:

- edges stay in CSR (destination-sorted) order and keep their **global** source
  ids; the per-edge message gather is done OUTSIDE the kernel by XLA
  (`jnp.take` row gather — the one irregular op TPUs do well), one scan group
  at a time so the [slots, dim] message buffer never exceeds a budget;
- the Pallas kernel only does what XLA is bad at: the scatter-free windowed
  segment reduction (one [RW, 128] one-hot × [128, dim] MXU contraction per
  chunk), exactly as in the windowed kernel. Because edges are dst-sorted,
  a 128-edge chunk spans only ~128/avg_degree destination rows, so chunks are
  nearly full at ANY degree — the fill problem disappears by construction;
- groups are ranges of destination blocks: each scan step reduces its tiles
  into a [GB·R, dim] partial that is added to the matching row range of the
  carried output (dst-sorted tiles ⇒ each group touches one contiguous range;
  a boundary block shared by two groups simply receives two partial sums).

Every block inside a group's GB-range gets at least one tile (empty "filler"
tiles with all-padding slots) so the kernel's first-visit zeroing initialises
the whole partial — no garbage rows can reach the accumulator.

Plan layout per group g (all sizes static):
  ws_local[g, w]  destination block of tile w, RELATIVE to the group's first
                  block (in [0, GB));
  row0[g]         first destination row of the group (= first block × R);
  e_src[g, w, s]  GLOBAL source id per edge slot (int32; 0 for padding slots —
                  padding is neutralised through e_dst, not e_src);
  e_dst[g, w, s]  dst row offset within the tile's dst block; -1 for padding
                  slots (the kernel's one-hot never matches a negative row).
"""
from __future__ import annotations

import numpy as np
from flax import struct

import jax
import jax.numpy as jnp

from spgemm_gnn_tpu.graphs.tiles import CHUNK


@struct.dataclass
class StreamPlan:
    """Grouped, dst-sorted edge layout for the streaming Pallas reducer."""
    ws_local: jax.Array   # i32[G, Wg]   dst block per tile, group-relative
    row0: jax.Array       # i32[G]       first dst row of each group
    e_src: jax.Array      # i32[G, Wg, S] global src id; 0 for padding
    e_dst: jax.Array      # i16[G, Wg, S] dst row offset in block; -1 padding
    num_groups: int = struct.field(pytree_node=False)        # G
    group_tiles: int = struct.field(pytree_node=False)       # Wg
    tile_slots: int = struct.field(pytree_node=False)        # S
    dst_block: int = struct.field(pytree_node=False)         # R
    group_blocks: int = struct.field(pytree_node=False)      # GB
    window: int = struct.field(pytree_node=False)            # RW
    padded_dst: int = struct.field(pytree_node=False)        # carried y rows
    num_edges: int = struct.field(pytree_node=False)
    num_src_nodes: int = struct.field(pytree_node=False)

    kind = "stream"

    @property
    def fill(self) -> float:
        """Fraction of edge slots holding real edges."""
        return self.num_edges / float(
            self.num_groups * self.group_tiles * self.tile_slots)


def auto_stream_window(num_rows: int, num_edges: int,
                       dst_block: int = 4096) -> int:
    """Destination-row window sized so a full 128-edge chunk fits even when
    it STARTS at the end of an 8-aligned bucket: 8 rows of start slack plus
    2× the expected chunk span (CHUNK / avg_degree) for degree variance.
    Measured (deg 50): the old 2×span rule gave RW=8 → chunk fill 0.84;
    8 + 2×span gives RW=16 → 0.9998, and windows ≤ 32 are free in the
    stream kernel (the one-hot stays a single MXU pass)."""
    deg = num_edges / max(num_rows, 1)
    span = CHUNK / max(deg, 0.5)
    rw = int(-(-(8 + 2 * span) // 8) * 8)
    return max(8, min(rw, 256, dst_block))


def auto_group_blocks(group_tiles: int, tile_slots: int, dst_block: int,
                      deg: float, n_blocks: int) -> int:
    """Group block-range: the group's expected edge span plus 2 blocks of
    slack, floored at 2 (block-straddling groups — with GB=1 every block's
    LAST group pads to Wg; measured at deg 50: GB=1 → fill 0.63, 2 → 0.75,
    4 → 0.94) and capped so the [GB·R, dim] scan partial stays a modest HBM
    buffer. The cap wins over the floor. Shared by build_stream_plan and the
    multi-chip shard planner so their geometries cannot diverge."""
    cap = max(65536 // dst_block, 1)
    gb = int(-(-group_tiles * tile_slots //
               max(dst_block * deg, 1.0))) + 2
    return max(min(2, n_blocks, cap), min(gb, cap, n_blocks))


def predicted_windowed_fill(num_rows: int, num_edges: int, src_block: int,
                            num_src_nodes: int, window: int) -> float:
    """Expected chunk fill of a windowed TilePlan — used to decide plan kind
    without building (and discarding) a full plan at products scale."""
    n_src_blocks = max(-(-num_src_nodes // src_block), 1)
    deg = num_edges / max(num_rows, 1)
    lam = deg / n_src_blocks          # edges per (dst row, src block)
    return min(lam * window, CHUNK) / CHUNK


def build_stream_plan(indptr: np.ndarray, indices: np.ndarray, num_rows: int,
                      *, tile_slots: int = 1024, dst_block: int = 4096,
                      window: int | None = None, group_tiles: int = 256,
                      group_blocks: int | None = None,
                      num_src_nodes: int | None = None,
                      use_native: bool = True) -> StreamPlan:
    """Build a StreamPlan from an (in-)CSR structure.

    For the backward (SSpMM) plan pass the transpose CSR — the planner is
    direction-agnostic, as in graphs/tiles.py.
    """
    S, R, C = tile_slots, dst_block, CHUNK
    if S % C:
        raise ValueError("tile_slots must be a multiple of 128")
    indptr = np.asarray(indptr, np.int64)
    E = int(indptr[-1])
    n_src = int(num_src_nodes) if num_src_nodes is not None else num_rows
    deg = E / max(num_rows, 1)
    if window is None:
        window = auto_stream_window(num_rows, E, R)
    RW = window
    if RW < 8 or RW % 8 or RW > R:
        raise ValueError("window must be a positive multiple of 8 ≤ dst_block")
    n_blocks = max(-(-num_rows // R), 1)
    if group_blocks is None:
        group_blocks = auto_group_blocks(group_tiles, S, R, deg, n_blocks)
    GB = group_blocks

    # native fast path (bit-identical output; tests/test_native.py)
    from spgemm_gnn_tpu.graphs import native
    if use_native and native.available():
        res = native.build_stream_arrays(indptr,
                                         np.asarray(indices, np.int32),
                                         num_rows, S, C, RW, R, GB,
                                         group_tiles)
        if res is not None:
            ws_local, row0, e_src, e_dst = res
            return StreamPlan(
                ws_local=jnp.asarray(ws_local), row0=jnp.asarray(row0),
                e_src=jnp.asarray(e_src), e_dst=jnp.asarray(e_dst),
                num_groups=ws_local.shape[0], group_tiles=ws_local.shape[1],
                tile_slots=S, dst_block=R, group_blocks=GB, window=RW,
                padded_dst=(int(row0.max()) if len(row0) else 0) + GB * R,
                num_edges=E, num_src_nodes=n_src)

    dst = np.repeat(np.arange(num_rows, dtype=np.int64), np.diff(indptr))
    src = np.asarray(indices, np.int64)

    # ---- chunk cuts: ≤128 consecutive edges, inside one 8-aligned RW-row
    # window AND one dst block --------------------------------------------
    if E:
        win_end = (dst // 8) * 8 + RW
        blk_end = (dst // R + 1) * R
        limit = np.minimum(np.searchsorted(dst, win_end, side="left"),
                           np.searchsorted(dst, blk_end, side="left"))
    chunks: list[tuple[int, int]] = []
    p = 0
    while p < E:
        q = min(p + C, int(limit[p]))
        chunks.append((p, q))
        p = q

    # ---- tiles: ≤ S/C consecutive chunks of one dst block ----------------
    cpt = S // C
    tiles: list[tuple[int, list[tuple[int, int]]]] = []   # (block, chunks)
    cur: list[tuple[int, int]] = []
    cur_blk = -1
    for (s, e) in chunks:
        b = int(dst[s]) // R
        if b != cur_blk or len(cur) == cpt:
            if cur:
                tiles.append((cur_blk, cur))
            cur, cur_blk = [], b
        cur.append((s, e))
    if cur:
        tiles.append((cur_blk, cur))

    # ---- groups: consecutive tiles, ≤ group_tiles real tiles, spanning a
    # block range < GB; a hub block may split across groups (partials add) --
    groups: list[tuple[int, list[tuple[int, list]]]] = []  # (first_blk, tiles)
    gcur: list[tuple[int, list]] = []
    first_blk = 0
    for (b, t) in tiles:
        if gcur and (len(gcur) == group_tiles or b - first_blk >= GB):
            groups.append((first_blk, gcur))
            gcur, first_blk = [], b
        if not gcur:
            first_blk = b
        gcur.append((b, t))
    if gcur:
        groups.append((first_blk, gcur))
    if not groups:
        groups = [(0, [])]

    # fillers: every block inside each group's GB-range needs ≥1 tile so the
    # kernel's first-visit zeroing initialises the whole [GB·R] partial
    filled: list[tuple[int, list[tuple[int, list]]]] = []
    for (fb, ts) in groups:
        present = {b for (b, _) in ts}
        ts = ts + [(b, []) for b in range(fb, fb + GB) if b not in present]
        ts.sort(key=lambda x: x[0])
        filled.append((fb, ts))
    Wg = max(len(ts) for (_, ts) in filled)
    G = len(filled)

    ws_local = np.zeros((G, Wg), np.int32)
    row0 = np.zeros(G, np.int32)
    e_src = np.zeros((G, Wg, S), np.int32)
    e_dst = np.full((G, Wg, S), -1, np.int16)
    for g, (fb, ts) in enumerate(filled):
        row0[g] = fb * R
        for w, (b, t) in enumerate(ts):
            ws_local[g, w] = b - fb
            for ci, (s, e) in enumerate(t):
                n = e - s
                base = ci * C
                e_src[g, w, base:base + n] = src[s:e]
                e_dst[g, w, base:base + n] = dst[s:e] - b * R
        # pad tiles repeat the last real block so first-visit zeroing cannot
        # re-trigger on a block that already accumulated
        if ts:
            ws_local[g, len(ts):] = ws_local[g, len(ts) - 1]

    return StreamPlan(
        ws_local=jnp.asarray(ws_local), row0=jnp.asarray(row0),
        e_src=jnp.asarray(e_src), e_dst=jnp.asarray(e_dst),
        num_groups=G, group_tiles=Wg, tile_slots=S, dst_block=R,
        group_blocks=GB, window=RW,
        padded_dst=int(row0.max()) + GB * R if G else GB * R,
        num_edges=E, num_src_nodes=n_src)


def stream_plan_for_graph(g, *, transpose: bool = False, **kw) -> StreamPlan:
    """StreamPlan for a Graph's forward (in-CSR) or transpose (out-CSR) edges."""
    indptr = g.t_indptr if transpose else g.indptr
    indices = g.t_indices if transpose else g.indices
    return build_stream_plan(np.asarray(indptr), np.asarray(indices),
                             g.num_nodes, num_src_nodes=g.num_nodes, **kw)
