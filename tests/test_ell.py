"""Neighbor-group (ELL) SpMM baseline tests — the GNNAdvisor role
(reference `kernels/spmm_gnna.cu`, README.md:61; SURVEY.md §2.1). Validates
the independent formulation against the dense oracle and the XLA impl, fwd
and sampled backward, on directed and symmetric graphs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spgemm_gnn_tpu.kernels.api import aggregate_cbsr
from spgemm_gnn_tpu.ops.ell import build_ell_table, ell_aggregate, ell_graph
from spgemm_gnn_tpu.ops.maxk import maxk_cbsr
from spgemm_gnn_tpu.ops.spmm import spmm

from tests.test_ops import dense_weighted_adj

K = 4
DIM = 16


def test_table_covers_every_edge_once(skewed_graph):
    g = skewed_graph
    t = build_ell_table(g.indptr, g.indices, g.num_nodes, width=8)
    grp_src = np.asarray(t.grp_src)
    grp_dst = np.asarray(t.grp_dst)
    valid = grp_src != g.num_nodes
    # multiset of (dst, src) pairs over valid slots == the edge multiset
    pairs = np.stack([np.repeat(grp_dst, 8)[valid.ravel()],
                      grp_src[valid]], axis=1)
    ref = np.stack([np.asarray(g.edge_dst), np.asarray(g.indices)], axis=1)
    key = lambda p: np.sort(p[:, 0].astype(np.int64) * g.num_nodes + p[:, 1])
    np.testing.assert_array_equal(key(pairs), key(ref))
    # group count is 8-aligned and within ceil(deg/width) + padding
    assert grp_src.shape[0] % 8 == 0


@pytest.mark.parametrize("norm", ["sum", "mean", "gcn"])
def test_ell_aggregate_matches_oracle(small_graph, rng, norm):
    g = small_graph
    eg = ell_graph(g, width=8)
    x = jnp.asarray(rng.standard_normal((g.num_nodes, DIM)).astype(np.float32))
    y = np.asarray(jax.jit(lambda v: ell_aggregate(eg, v, norm))(x))
    w = dense_weighted_adj(g, norm)
    np.testing.assert_allclose(y, w @ np.asarray(x), rtol=1e-4, atol=1e-5)
    # and vs the XLA segment-sum path
    np.testing.assert_allclose(y, np.asarray(spmm(g, x, norm)),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("graph_fixture", ["small_graph", "skewed_graph"])
@pytest.mark.parametrize("norm", ["sum", "mean"])
def test_cbsr_ell_matches_xla_fwd_and_grad(request, rng, graph_fixture, norm):
    g = request.getfixturevalue(graph_fixture)
    eg = ell_graph(g)
    x = jnp.asarray(rng.standard_normal((g.num_nodes, DIM)).astype(np.float32))
    vals, ch = maxk_cbsr(x, K)
    ct = jnp.asarray(rng.standard_normal((g.num_nodes, DIM)).astype(np.float32))

    def run(impl, graph):
        f = lambda v: aggregate_cbsr(graph, v, ch, DIM, norm, impl)
        y = f(vals)
        dv = jax.grad(lambda v: (f(v) * ct).sum())(vals)
        return np.asarray(y), np.asarray(dv)

    y_e, dv_e = run("ell", eg)
    y_x, dv_x = run("xla", g)
    np.testing.assert_allclose(y_e, y_x, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(dv_e, dv_x, rtol=1e-4, atol=1e-5)


def test_ell_graph_requires_table(small_graph, rng):
    x = jnp.asarray(rng.standard_normal((small_graph.num_nodes, DIM))
                    .astype(np.float32))
    vals, ch = maxk_cbsr(x, K)
    with pytest.raises(ValueError, match="ELLGraph"):
        aggregate_cbsr(small_graph, vals, ch, DIM, "sum", "ell")


def test_empty_rows_and_auto_impl(rng):
    # graph with isolated nodes (empty CSR rows → zero groups for those rows)
    from spgemm_gnn_tpu.graphs.csr import from_edges
    src = np.array([0, 1, 2, 5])
    dst = np.array([1, 2, 0, 6])
    g = from_edges(src, dst, 10)
    eg = ell_graph(g, width=4)
    x = jnp.asarray(rng.standard_normal((10, DIM)).astype(np.float32))
    vals, ch = maxk_cbsr(x, K)
    y = np.asarray(aggregate_cbsr(eg, vals, ch, DIM, "sum", "auto"))
    y_ref = np.asarray(aggregate_cbsr(g, vals, ch, DIM, "sum", "xla"))
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-6)
    assert np.abs(y[np.setdiff1d(np.arange(10), dst)]).max() == 0.0
