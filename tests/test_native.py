"""Native graphcore (C++) vs pure-Python/numpy equivalence tests."""
import numpy as np
import pytest

from spgemm_gnn_tpu.graphs import native
from spgemm_gnn_tpu.graphs.synthetic import powerlaw_graph, random_graph
from spgemm_gnn_tpu.graphs.tiles import build_tile_plan

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native graphcore unavailable")

PK = dict(tile_slots=256, src_block=256, dst_block=128, window=8)


@pytest.mark.parametrize("maker,args", [
    (powerlaw_graph, (300, 4000)),
    (random_graph, (200, 1500)),
])
def test_native_plan_bit_identical(maker, args):
    g = maker(*args, seed=3)
    indptr = np.asarray(g.indptr)
    indices = np.asarray(g.indices)
    plan = build_tile_plan(indptr, indices, g.num_nodes, use_native=False,
                           **PK)
    res = native.build_plan_arrays(indptr, indices, g.num_nodes,
                                   PK["tile_slots"], 128, PK["window"],
                                   PK["src_block"], PK["dst_block"])
    assert res is not None
    ws_dst, ws_src, e_src, e_dst = res
    np.testing.assert_array_equal(np.asarray(plan.ws_dst_block), ws_dst)
    np.testing.assert_array_equal(np.asarray(plan.ws_src_block), ws_src)
    np.testing.assert_array_equal(np.asarray(plan.e_src_local), e_src)
    np.testing.assert_array_equal(np.asarray(plan.e_dst_local), e_dst)


def test_native_csr_matches_numpy():
    g = random_graph(150, 1200, seed=7, symmetric=False)
    src = np.asarray(g.indices, np.int64)
    dst = np.asarray(g.edge_dst, np.int64)
    res = native.build_csr(src, dst, g.num_nodes)
    assert res is not None
    indptr, indices, edge_dst = res
    np.testing.assert_array_equal(indptr, np.asarray(g.indptr))
    np.testing.assert_array_equal(indices, np.asarray(g.indices))
    np.testing.assert_array_equal(edge_dst, np.asarray(g.edge_dst))


def test_native_stream_planner_bit_identical():
    """gc_stream_count/fill must reproduce the Python StreamPlan exactly."""
    from spgemm_gnn_tpu.graphs import native
    from spgemm_gnn_tpu.graphs.stream_tiles import build_stream_plan
    from spgemm_gnn_tpu.graphs.synthetic import powerlaw_graph, random_graph
    if not native.available():
        import pytest
        pytest.skip("native lib unavailable")
    graphs = [powerlaw_graph(900, 4000, seed=21),
              random_graph(650, 2600, seed=23, symmetric=False)]
    kws = [dict(tile_slots=256, dst_block=256, group_tiles=8),
           dict(tile_slots=128, dst_block=128, group_tiles=2)]
    for g in graphs:
        for kw in kws:
            ip, ix = np.asarray(g.indptr), np.asarray(g.indices)
            p_n = build_stream_plan(ip, ix, g.num_nodes, use_native=True, **kw)
            p_p = build_stream_plan(ip, ix, g.num_nodes, use_native=False,
                                    **kw)
            assert (p_n.num_groups, p_n.group_tiles, p_n.padded_dst) == \
                (p_p.num_groups, p_p.group_tiles, p_p.padded_dst)
            for f in ("ws_local", "row0", "e_src", "e_dst"):
                np.testing.assert_array_equal(np.asarray(getattr(p_n, f)),
                                              np.asarray(getattr(p_p, f)),
                                              err_msg=f)


def test_native_labelprop_bit_identity():
    """gc_labelprop must match the numpy LPA sweeps exactly (same counts,
    same keyed-hash tie-break, same convergence)."""
    import numpy as np
    from spgemm_gnn_tpu.graphs import native
    from spgemm_gnn_tpu.graphs.relabel import _labelprop_labels
    from spgemm_gnn_tpu.graphs.synthetic import sbm_graph, random_graph
    if not native.available() or native._load().gc_labelprop is None:
        import pytest
        pytest.skip("native labelprop unavailable")
    for g in (sbm_graph(2000, 24000, communities=32, seed=5),
              random_graph(1500, 9000, seed=6, symmetric=False)):
        ip = np.asarray(g.indptr, np.int64)
        ix = np.asarray(g.indices, np.int64)
        a = _labelprop_labels(ip, ix, g.num_nodes, use_native=True)
        b = _labelprop_labels(ip, ix, g.num_nodes, use_native=False)
        np.testing.assert_array_equal(a, b)
