"""Graph container tests: CSR construction, transpose, self-loops, degrees."""
import numpy as np
import pytest

from spgemm_gnn_tpu.graphs.csr import from_edges, add_self_loops, to_undirected
from spgemm_gnn_tpu.graphs.synthetic import random_graph, powerlaw_graph


def dense_adj(g):
    """A[dst, src] = multiplicity of edge src→dst."""
    a = np.zeros((g.num_nodes, g.num_nodes), dtype=np.int64)
    np.add.at(a, (np.asarray(g.edge_dst), np.asarray(g.indices)), 1)
    return a


def test_from_edges_roundtrip():
    src = [0, 1, 2, 2, 3]
    dst = [1, 2, 0, 3, 0]
    g = from_edges(src, dst, 4)
    assert g.num_nodes == 4 and g.num_edges == 5
    a = dense_adj(g)
    expect = np.zeros((4, 4), np.int64)
    for s, d in zip(src, dst):
        expect[d, s] += 1
    np.testing.assert_array_equal(a, expect)
    # CSR invariants
    indptr = np.asarray(g.indptr)
    assert indptr[0] == 0 and indptr[-1] == 5
    np.testing.assert_array_equal(np.diff(indptr), np.asarray(g.in_degrees))
    assert np.asarray(g.out_degrees).sum() == 5
    assert not g.symmetric


def test_transpose_structure_directed():
    rng = np.random.default_rng(3)
    src = rng.integers(0, 50, 400)
    dst = rng.integers(0, 50, 400)
    g = from_edges(src, dst, 50)
    a = dense_adj(g)
    # transpose CSR must encode A^T: row u lists its out-neighbours
    at = np.zeros_like(a)
    np.add.at(at, (np.asarray(g.t_edge_dst), np.asarray(g.t_indices)), 1)
    np.testing.assert_array_equal(at, a.T)


def test_symmetric_detection_and_alias(small_graph):
    g = small_graph
    assert g.symmetric
    a = dense_adj(g)
    np.testing.assert_array_equal(a, a.T)
    # transpose aliases forward arrays (no copy)
    assert g.t_indptr is g.indptr and g.t_indices is g.indices


def test_add_self_loops():
    g = from_edges([0, 1, 1], [1, 1, 2], 3)  # includes an existing self-loop
    g2 = add_self_loops(g)
    a = dense_adj(g2)
    assert (np.diag(a) == 1).all()          # exactly one loop per node
    assert g2.num_edges == 2 + 3            # removed 1 loop, added 3


def test_to_undirected_dedupes():
    g = to_undirected([0, 0, 1], [1, 1, 2], 3)
    a = dense_adj(g)
    np.testing.assert_array_equal(a, a.T)
    assert a.max() == 1
    assert g.num_edges == 4  # (0,1),(1,0),(1,2),(2,1)


def test_powerlaw_graph_is_skewed():
    g = powerlaw_graph(500, 5000, seed=0)
    deg = np.asarray(g.in_degrees)
    assert g.symmetric
    assert deg.max() > 5 * max(deg.mean(), 1)  # hub-heavy


def test_neighbors_sorted(small_graph):
    g = small_graph
    indptr = np.asarray(g.indptr)
    indices = np.asarray(g.indices)
    for v in range(0, g.num_nodes, 7):
        row = indices[indptr[v]:indptr[v + 1]]
        assert (np.diff(row) >= 0).all()


def test_sbm_graph_latent_clustering():
    """SBM stand-in (VERDICT r4 #2): shuffled ids hide the communities; a
    label-propagation relabel recovers block locality the uniform power-law
    provably lacks (bandwidth orders like degree-BFS leak across
    communities at p_in 0.7 — measured, see graphs/relabel.py)."""
    from spgemm_gnn_tpu.graphs.relabel import relabel_graph
    from spgemm_gnn_tpu.graphs.synthetic import (intra_block_fraction,
                                                 sbm_graph)
    g = sbm_graph(2000, 20000, communities=32, p_in=0.7, seed=0)
    assert g.symmetric
    deg = np.asarray(g.in_degrees)
    assert deg.max() > 5 * max(deg.mean(), 1)          # still hub-heavy
    block = 128
    f_shuffled = intra_block_fraction(g, block)
    rg, _ = relabel_graph(g, "labelprop")
    f_relabel = intra_block_fraction(rg, block)
    # shuffled ≈ random expectation; relabel recovers real locality
    assert f_shuffled < 0.15
    assert f_relabel > 2.5 * f_shuffled
    # the uniform power-law gains far less from the same relabel
    gp = powerlaw_graph(2000, 20000, seed=0)
    rp, _ = relabel_graph(gp, "labelprop")
    gain_pl = intra_block_fraction(rp, block) / max(
        intra_block_fraction(gp, block), 1e-9)
    gain_sbm = f_relabel / f_shuffled
    assert gain_sbm > 1.5 * gain_pl


def test_rmat_graph_latent_clustering():
    from spgemm_gnn_tpu.graphs.relabel import relabel_graph
    from spgemm_gnn_tpu.graphs.synthetic import (intra_block_fraction,
                                                 rmat_graph)
    g = rmat_graph(2048, 20000, seed=0)
    assert g.symmetric
    deg = np.asarray(g.in_degrees)
    assert deg.max() > 5 * max(deg.mean(), 1)
    # unshuffled R-MAT has id-contiguous self-similar locality; the shuffled
    # default hides it
    g_raw = rmat_graph(2048, 20000, seed=0, shuffle=False)
    f_raw = intra_block_fraction(g_raw, 128)
    f_shuf = intra_block_fraction(g, 128)
    assert f_raw > 1.3 * f_shuf   # R-MAT id-locality is real but mild
    rg, _ = relabel_graph(g, "degree-bfs")
    assert intra_block_fraction(rg, 128) > 2.5 * f_shuf
