"""Plan disk cache: save/load roundtrip for both plan kinds, cache hits skip
the build, fingerprints distinguish structures (VERDICT r1 #9)."""
import numpy as np
import pytest

from spgemm_gnn_tpu.graphs.plan_cache import (
    cached_plan, graph_fingerprint, load_plan, plan_key, save_plan)
from spgemm_gnn_tpu.graphs.stream_tiles import StreamPlan
from spgemm_gnn_tpu.graphs.synthetic import powerlaw_graph, random_graph
from spgemm_gnn_tpu.graphs.tiles import TilePlan
from spgemm_gnn_tpu.kernels.planned import plan_graph


@pytest.mark.parametrize("kind", ["windowed", "stream"])
def test_save_load_roundtrip(tmp_path, kind):
    g = powerlaw_graph(300, 2500, seed=5)
    pg = plan_graph(g, kind=kind, tile_slots=256, dst_block=256,
                    src_block=256, window=None if kind == "stream" else 8)
    plan = pg.fwd_plan
    path = str(tmp_path / "p.npz")
    save_plan(path, plan)
    got = load_plan(path)
    assert type(got) is type(plan)
    for f in ("num_edges", "tile_slots", "dst_block", "window"):
        assert getattr(got, f) == getattr(plan, f)
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(plan),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cached_plan_hit_skips_build(tmp_path):
    g = random_graph(200, 1500, seed=6)
    calls = []

    def build():
        calls.append(1)
        return plan_graph(g, kind="windowed", tile_slots=256, dst_block=256,
                          window=8).fwd_plan

    key = plan_key(graph_fingerprint(g.indptr, g.indices), "f", "windowed",
                   S=256, R=256)
    p1 = cached_plan(str(tmp_path), key, build)
    p2 = cached_plan(str(tmp_path), key, build)
    assert len(calls) == 1
    np.testing.assert_array_equal(np.asarray(p1.e_src_local),
                                  np.asarray(p2.e_src_local))


def test_fingerprint_distinguishes_structures():
    g1 = random_graph(200, 1500, seed=6)
    g2 = random_graph(200, 1500, seed=7)
    assert graph_fingerprint(g1.indptr, g1.indices) != \
        graph_fingerprint(g2.indptr, g2.indices)
    assert graph_fingerprint(g1.indptr, g1.indices) == \
        graph_fingerprint(np.asarray(g1.indptr), np.asarray(g1.indices))


def test_plan_graph_cache_dir_end_to_end(tmp_path):
    """plan_graph with cache_dir: second call loads identical plans; the
    kernel result is unchanged."""
    import jax.numpy as jnp
    from spgemm_gnn_tpu.kernels.planned import planned_aggregate
    g = powerlaw_graph(400, 2000, seed=8)
    pg1 = plan_graph(g, cache_dir=str(tmp_path), tile_slots=256,
                     dst_block=256)
    files = list(tmp_path.glob("plan_*.npz"))
    assert files
    pg2 = plan_graph(g, cache_dir=str(tmp_path), tile_slots=256,
                     dst_block=256)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((g.num_nodes, 128)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(planned_aggregate(pg1, x, "mean")),
                               np.asarray(planned_aggregate(pg2, x, "mean")),
                               rtol=0, atol=0)
