"""CBSR SpGEMM/SSpMM custom_vjp tests — forward vs dense oracle, sampled
backward vs autodiff-of-dense-path (the reference's cuSPARSE-role validation,
SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spgemm_gnn_tpu.kernels.api import aggregate, aggregate_cbsr
from spgemm_gnn_tpu.ops.maxk import maxk, maxk_cbsr, cbsr_to_dense
from spgemm_gnn_tpu.ops.spmm import spmm

from tests.test_ops import dense_weighted_adj

K = 4
DIM = 16


def _sparse_input(g, rng):
    x = rng.standard_normal((g.num_nodes, DIM)).astype(np.float32)
    return jnp.asarray(x)


@pytest.mark.parametrize("norm", ["sum", "mean", "gcn"])
@pytest.mark.parametrize("impl", ["xla", "xla_dense"])
def test_aggregate_cbsr_forward_matches_oracle(small_graph, rng, norm, impl):
    g = small_graph
    x = _sparse_input(g, rng)
    xs = maxk(x, K)
    vals, ch = maxk_cbsr(x, K)
    y = np.asarray(aggregate_cbsr(g, vals, ch, DIM, norm, impl))
    w = dense_weighted_adj(g, norm)
    np.testing.assert_allclose(y, w @ np.asarray(xs), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("norm", ["sum", "mean", "gcn"])
def test_sampled_backward_matches_dense_autodiff(small_graph, rng, norm):
    g = small_graph
    x = _sparse_input(g, rng)
    vals, ch = maxk_cbsr(x, K)
    ct = jnp.asarray(rng.standard_normal((g.num_nodes, DIM)).astype(np.float32))

    def loss_via(impl):
        def f(v):
            return (aggregate_cbsr(g, v, ch, DIM, norm, impl) * ct).sum()
        return jax.grad(f)(vals)

    g_sampled = np.asarray(loss_via("xla"))
    g_dense = np.asarray(loss_via("xla_dense"))
    np.testing.assert_allclose(g_sampled, g_dense, rtol=1e-4, atol=1e-5)

    # and against pure-autodiff of the fully dense formulation
    def dense_f(v):
        xd = cbsr_to_dense(v, ch, DIM)
        return (spmm(g, xd, norm) * ct).sum()

    g_auto = np.asarray(jax.grad(dense_f)(vals))
    np.testing.assert_allclose(g_sampled, g_auto, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("norm", ["mean", "gcn"])
def test_aggregate_maxk_path_equals_dense_path(skewed_graph, rng, norm):
    """aggregate(x, k=K) on a maxk-sparse x must equal spmm on the same x."""
    g = skewed_graph
    x = maxk(_sparse_input(g, rng), K)
    y_k = np.asarray(aggregate(g, x, norm=norm, k=K, impl="xla"))
    y_d = np.asarray(spmm(g, x, norm))
    np.testing.assert_allclose(y_k, y_d, rtol=1e-4, atol=1e-5)


def test_aggregate_grad_through_maxk(skewed_graph, rng):
    """End-to-end: grad through maxk→aggregate equals dense-path autodiff."""
    g = skewed_graph
    x = _sparse_input(g, rng)
    ct = jnp.asarray(rng.standard_normal((g.num_nodes, DIM)).astype(np.float32))

    def f_sparse(x):
        return (aggregate(g, maxk(x, K), norm="mean", k=K, impl="xla")
                * ct).sum()

    def f_dense(x):
        return (spmm(g, maxk(x, K), "mean") * ct).sum()

    gs = np.asarray(jax.grad(f_sparse)(x))
    gd = np.asarray(jax.grad(f_dense)(x))
    np.testing.assert_allclose(gs, gd, rtol=1e-4, atol=1e-5)


def test_aggregate_k_none_is_dense(small_graph, rng):
    g = small_graph
    x = _sparse_input(g, rng)
    np.testing.assert_allclose(np.asarray(aggregate(g, x, norm="mean")),
                               np.asarray(spmm(g, x, "mean")), rtol=1e-6)


def test_jit_and_directed(rng):
    from spgemm_gnn_tpu.graphs.synthetic import random_graph
    g = random_graph(60, 400, seed=7, symmetric=False)
    x = jnp.asarray(rng.standard_normal((60, DIM)).astype(np.float32))

    @jax.jit
    def f(x):
        xs = maxk(x, K)
        return aggregate(g, xs, norm="gcn", k=K, impl="xla")

    y = np.asarray(f(x))
    w = dense_weighted_adj(g, "gcn")
    np.testing.assert_allclose(y, w @ np.asarray(maxk(x, K)), rtol=1e-4,
                               atol=1e-5)
