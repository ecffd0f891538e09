"""Locality relabeling (VERDICT r2 #3): every order is a true permutation and
aggregation over the relabeled graph equals the original modulo relabeling —
through both the XLA oracle and the planned Pallas (interpret) path."""
import numpy as np
import jax.numpy as jnp
import pytest

from spgemm_gnn_tpu.graphs.relabel import ORDERS, relabel_graph
from spgemm_gnn_tpu.graphs.synthetic import powerlaw_graph, random_graph
from spgemm_gnn_tpu.ops.spmm import spmm


@pytest.mark.parametrize("order", ORDERS)
@pytest.mark.parametrize("symmetric", [True, False])
def test_relabel_preserves_aggregation(order, symmetric):
    g = (powerlaw_graph(300, 2000, seed=5) if symmetric
         else random_graph(300, 1500, seed=5, symmetric=False))
    rg, perm = relabel_graph(g, order)
    assert sorted(perm.tolist()) == list(range(g.num_nodes))
    assert rg.num_edges == g.num_edges
    assert rg.symmetric == g.symmetric
    x = np.random.default_rng(0).standard_normal((g.num_nodes, 16),
                                                 np.float32)
    for norm in ("sum", "mean", "gcn"):
        y = np.asarray(spmm(g, jnp.asarray(x), norm=norm))
        y_r = np.asarray(spmm(rg, jnp.asarray(x[perm]), norm=norm))
        np.testing.assert_allclose(y_r, y[perm], rtol=2e-5, atol=1e-5)


def test_relabel_through_planned_kernels():
    from spgemm_gnn_tpu.kernels.planned import plan_graph, planned_aggregate
    g = powerlaw_graph(300, 4000, seed=7)
    rg, perm = relabel_graph(g, "degree-bfs")
    x = np.random.default_rng(1).standard_normal((g.num_nodes, 16),
                                                 np.float32)
    pg = plan_graph(g, tile_slots=256, src_block=128, dst_block=256)
    prg = plan_graph(rg, tile_slots=256, src_block=128, dst_block=256)
    y = np.asarray(planned_aggregate(pg, jnp.asarray(x), norm="mean"))
    y_r = np.asarray(planned_aggregate(prg, jnp.asarray(x[perm]),
                                       norm="mean"))
    np.testing.assert_allclose(y_r, y[perm], rtol=2e-5, atol=1e-5)


def test_degree_order_concentrates_hubs():
    """Degree-led orders put the heaviest rows first — the property that
    keeps hub source blocks VMEM-resident."""
    g = powerlaw_graph(400, 6000, seed=3)
    deg = np.diff(np.asarray(g.indptr))
    for order in ("degree", "degree-bfs"):
        rg, perm = relabel_graph(g, order)
        first, rest = deg[perm[:40]].mean(), deg[perm[40:]].mean()
        assert first > 2 * rest, (order, first, rest)


def test_labelprop_recovers_latent_communities():
    """Label propagation recovers SBM communities that BFS orders leak
    (VERDICT r4 #2): intra-block locality after 'labelprop' approaches the
    construction level; the permutation is valid (aggregation-invariant)."""
    from spgemm_gnn_tpu.graphs.synthetic import (intra_block_fraction,
                                                 sbm_graph)
    from spgemm_gnn_tpu.ops.spmm import spmm
    g = sbm_graph(4000, 40000, communities=32, p_in=0.7, seed=2)
    f0 = intra_block_fraction(g, 128)
    rg, perm = relabel_graph(g, "labelprop")
    f1 = intra_block_fraction(rg, 128)
    assert f1 > 5 * f0, (f0, f1)
    # BFS leaks: labelprop must beat it clearly on this family
    rb, _ = relabel_graph(g, "degree-bfs")
    assert f1 > 2 * intra_block_fraction(rb, 128)
    # the permutation is a real relabeling: aggregation commutes
    x = np.random.default_rng(0).standard_normal((g.num_nodes, 8), np.float32)
    y = np.asarray(spmm(g, jnp.asarray(x), norm="mean"))
    y_r = np.asarray(spmm(rg, jnp.asarray(x[perm]), norm="mean"))
    np.testing.assert_allclose(y_r, y[perm], rtol=2e-5, atol=1e-5)
