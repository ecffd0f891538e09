"""Ops tests: maxk semantics (vs the reference torch spec), CBSR roundtrip,
SpMM vs dense-matmul oracle, norm weights, gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spgemm_gnn_tpu.graphs.synthetic import random_graph
from spgemm_gnn_tpu.ops.maxk import maxk, maxk_mask, maxk_cbsr, cbsr_to_dense
from spgemm_gnn_tpu.ops.norms import node_factors
from spgemm_gnn_tpu.ops.spmm import spmm, spmm_transpose


def dense_weighted_adj(g, norm):
    """Dense W[dst, src] oracle for the normalised adjacency."""
    a = np.zeros((g.num_nodes, g.num_nodes), dtype=np.float64)
    src = np.asarray(g.indices)
    dst = np.asarray(g.edge_dst)
    in_deg = np.asarray(g.in_degrees).astype(np.float64)
    out_deg = np.asarray(g.out_degrees).astype(np.float64)
    if norm == "sum":
        w = np.ones(len(src))
    elif norm == "mean":
        w = 1.0 / np.maximum(in_deg[dst], 1)
    elif norm == "gcn":
        w = 1.0 / (np.sqrt(np.maximum(out_deg[src], 1))
                   * np.sqrt(np.maximum(in_deg[dst], 1)))
    np.add.at(a, (dst, src), w)
    return a


# ---------------- MaxK ----------------

def torch_maxk_reference(x, k):
    """numpy re-statement of reference utils/models.py:12-26."""
    idx = np.argsort(-x, axis=1, kind="stable")[:, :k]
    mask = np.zeros_like(x)
    np.put_along_axis(mask, idx, 1.0, axis=1)
    return x * mask, mask


def test_maxk_matches_reference_semantics(rng):
    x = rng.standard_normal((40, 16)).astype(np.float32)
    y_ref, mask_ref = torch_maxk_reference(x, 4)
    y = np.asarray(maxk(jnp.asarray(x), 4))
    np.testing.assert_allclose(y, y_ref, rtol=1e-6)
    # exactly k nonzero per row (x has no zeros a.s.)
    assert ((np.asarray(maxk_mask(jnp.asarray(x), 4)) != 0).sum(1) == 4).all()


def test_maxk_gradient_is_masked(rng):
    x = jnp.asarray(rng.standard_normal((10, 8)).astype(np.float32))
    k = 3
    g = jax.grad(lambda x: (maxk(x, k) ** 2).sum())(x)
    mask = np.asarray(maxk_mask(x, k))
    # gradient zero off-mask, 2x on-mask (d/dx x^2 through identity)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(x) * mask,
                               rtol=1e-6)


def test_maxk_k_ge_dim_is_identity(rng):
    x = jnp.asarray(rng.standard_normal((5, 4)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(maxk(x, 4)), np.asarray(x))


def test_cbsr_roundtrip(rng):
    x = rng.standard_normal((30, 12)).astype(np.float32)
    k = 5
    vals, ch = maxk_cbsr(jnp.asarray(x), k)
    assert ch.dtype == jnp.int32 and vals.shape == (30, 5)
    # channels strictly increasing per row (canonical, unique)
    assert (np.diff(np.asarray(ch), axis=1) > 0).all()
    dense = np.asarray(cbsr_to_dense(vals, ch, 12))
    y_ref, _ = torch_maxk_reference(x, k)
    np.testing.assert_allclose(dense, y_ref, rtol=1e-6)


# ---------------- SpMM ----------------

@pytest.mark.parametrize("norm", ["sum", "mean", "gcn"])
def test_spmm_matches_dense_oracle(small_graph, rng, norm):
    g = small_graph
    x = rng.standard_normal((g.num_nodes, 8)).astype(np.float32)
    y = np.asarray(spmm(g, jnp.asarray(x), norm))
    w = dense_weighted_adj(g, norm)
    np.testing.assert_allclose(y, w @ x, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("norm", ["sum", "mean", "gcn"])
def test_spmm_transpose_is_adjoint(small_graph, rng, norm):
    g = small_graph
    x = rng.standard_normal((g.num_nodes, 8)).astype(np.float32)
    y = rng.standard_normal((g.num_nodes, 8)).astype(np.float32)
    lhs = np.vdot(np.asarray(spmm(g, jnp.asarray(x), norm)), y)
    rhs = np.vdot(x, np.asarray(spmm_transpose(g, jnp.asarray(y), norm)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_spmm_directed_graph(rng):
    from spgemm_gnn_tpu.graphs.synthetic import random_graph
    g = random_graph(50, 300, seed=5, symmetric=False)
    assert not g.symmetric
    x = rng.standard_normal((50, 4)).astype(np.float32)
    for norm in ("sum", "mean", "gcn"):
        y = np.asarray(spmm(g, jnp.asarray(x), norm))
        np.testing.assert_allclose(y, dense_weighted_adj(g, norm) @ x,
                                   rtol=1e-4, atol=1e-5)
        # adjoint
        z = rng.standard_normal((50, 4)).astype(np.float32)
        lhs = np.vdot(y, z)
        rhs = np.vdot(x, np.asarray(spmm_transpose(g, jnp.asarray(z), norm)))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_spmm_grad_is_transpose(small_graph, rng):
    g = small_graph
    x = jnp.asarray(rng.standard_normal((g.num_nodes, 4)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((g.num_nodes, 4)).astype(np.float32))
    grad = jax.grad(lambda x: (spmm(g, x, "mean") * ct).sum())(x)
    np.testing.assert_allclose(np.asarray(grad),
                               np.asarray(spmm_transpose(g, ct, "mean")),
                               rtol=1e-4, atol=1e-5)
