"""Tile planner invariant tests: edge conservation, locality bounds, chunk
window constraint, dst-block sort order, empty-block coverage."""
import numpy as np
import pytest

from spgemm_gnn_tpu.graphs.synthetic import powerlaw_graph, random_graph
from spgemm_gnn_tpu.graphs.tiles import CHUNK, build_tile_plan, plan_for_graph

P = dict(tile_slots=256, src_block=256, dst_block=128, window=8)


def reconstruct_edges(plan):
    """Recover the (src, dst) multiset from the plan."""
    ws_dst = np.asarray(plan.ws_dst_block)
    ws_src = np.asarray(plan.ws_src_block)
    e_src = np.asarray(plan.e_src_local)
    e_dst = np.asarray(plan.e_dst_local)
    m = e_src >= 0
    srcs, dsts = [], []
    for w in range(plan.num_tiles):
        srcs.append(ws_src[w] * plan.src_block + e_src[w][m[w]])
        dsts.append(ws_dst[w] * plan.dst_block + e_dst[w][m[w]])
    return np.concatenate(srcs), np.concatenate(dsts)


@pytest.mark.parametrize("maker,args", [
    (powerlaw_graph, (300, 4000)),
    (random_graph, (200, 1500)),
])
def test_plan_preserves_edges(maker, args):
    g = maker(*args, seed=3)
    plan = plan_for_graph(g, **P)
    src, dst = reconstruct_edges(plan)
    assert len(src) == g.num_edges == plan.num_edges
    got = np.sort(dst.astype(np.int64) * g.num_nodes + src)
    want = np.sort(np.asarray(g.edge_dst, np.int64) * g.num_nodes
                   + np.asarray(g.indices))
    np.testing.assert_array_equal(got, want)


def test_plan_invariants():
    g = powerlaw_graph(500, 6000, seed=5)
    plan = plan_for_graph(g, **P)
    S, RW = plan.tile_slots, plan.window
    ws_dst = np.asarray(plan.ws_dst_block)
    e_src = np.asarray(plan.e_src_local)
    e_dst = np.asarray(plan.e_dst_local)
    m = e_src >= 0

    # tiles sorted by dst block; every dst block present
    assert (np.diff(ws_dst) >= 0).all()
    assert set(range(plan.n_dst_blocks)) <= set(ws_dst.tolist())
    # locals in range (-1 = padding sentinel)
    assert (e_src >= -1).all() and (e_src < plan.src_block).all()
    assert (e_dst >= 0).all() and (e_dst < plan.dst_block).all()
    # chunk window constraint: rows ∈ [align8(row0), align8(row0)+RW)
    for w in range(plan.num_tiles):
        for ci in range(S // CHUNK):
            seg = e_dst[w, ci * CHUNK:(ci + 1) * CHUNK]
            segm = m[w, ci * CHUNK:(ci + 1) * CHUNK]
            w0 = (seg[0] // 8) * 8
            assert (seg >= w0).all() and (seg < w0 + RW).all(), (w, ci)
            # first slot must be a real edge unless the whole chunk is padding
            if segm.any():
                assert segm[0]
            # real edges' rows non-decreasing
            rows = seg[segm]
            assert (np.diff(rows) >= 0).all()


def test_plan_transpose_directed():
    g = random_graph(150, 900, seed=9, symmetric=False)
    plan_f = plan_for_graph(g, transpose=False, **P)
    plan_b = plan_for_graph(g, transpose=True, **P)
    sf, df = reconstruct_edges(plan_f)
    sb, db = reconstruct_edges(plan_b)
    # transpose plan holds the same edges with roles swapped
    a = np.sort(df.astype(np.int64) * g.num_nodes + sf)
    b = np.sort(sb.astype(np.int64) * g.num_nodes + db)
    np.testing.assert_array_equal(a, b)


def test_auto_window_density():
    from spgemm_gnn_tpu.graphs.tiles import auto_window
    # dense graph → small window; sparse graph → large window
    assert auto_window(10_000, 5_000_000, 1024) <= 32
    assert auto_window(1_000_000, 2_000_000, 1024) == 256


def test_auto_src_block():
    """auto_src_block reproduces the on-chip sweep winners (RESULTS.md §plan
    geometry): smallest B with full chunks; falls back to the fullest B."""
    from spgemm_gnn_tpu.graphs.tiles import auto_src_block
    # reddit-degree regimes: chunks stay full even at B=128 (measured best)
    assert auto_src_block(29_121, 14_325_000) == 128    # medium headline
    assert auto_src_block(8_000, 3_936_000) == 128      # reddit-density
    assert auto_src_block(15_000, 3_000_000) == 128     # deg200
    # mid-dense: B=128 fill collapses (0.43 predicted) — 256 clears
    assert auto_src_block(60_000, 6_000_000) == 256
    # low-degree (flickr shape): nothing clears — fullest candidate (the
    # plan kind cutover sends these to the StreamPlan anyway)
    assert auto_src_block(89_250, 989_006) == 512


def test_fill_reported():
    g = powerlaw_graph(300, 5000, seed=1)
    plan = plan_for_graph(g, **P)
    assert 0 < plan.fill <= 1.0
