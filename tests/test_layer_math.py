"""Hand-computed layer math on a 4-node graph — guards the DGL-formula wiring
(mean/SAGE, symmetric-norm/GCN, eps/GIN) with explicit expected values rather
than the dense-matmul oracle."""
import jax
import jax.numpy as jnp
import numpy as np

from spgemm_gnn_tpu.graphs.csr import from_edges
from spgemm_gnn_tpu.models.layers import GINAgg, GraphConvAgg, SAGEConv
from spgemm_gnn_tpu.ops.spmm import spmm

# edges (src→dst): 0→1, 2→1, 1→3, 3→0   (directed, no loops)
SRC = [0, 2, 1, 3]
DST = [1, 1, 3, 0]
G = from_edges(SRC, DST, 4)
X = np.array([[1.0, 0.0],
              [0.0, 2.0],
              [3.0, 1.0],
              [1.0, 1.0]], np.float32)


def test_mean_aggregation_values():
    # in-degrees: [1, 2, 0, 1]; mean over in-neighbours; 0-in-degree → 0
    y = np.asarray(spmm(G, jnp.asarray(X), "mean"))
    expect = np.array([
        X[3],                    # node 0 ← {3}
        (X[0] + X[2]) / 2.0,     # node 1 ← {0, 2}
        [0.0, 0.0],              # node 2 ← {}
        X[1],                    # node 3 ← {1}
    ], np.float32)
    np.testing.assert_allclose(y, expect, rtol=1e-6)


def test_gcn_symmetric_norm_values():
    # out-degrees: [1, 1, 1, 1]; in-degrees: [1, 2, 0, 1] (clamped ≥ 1)
    # w(u→v) = 1/sqrt(out(u) · in(v))
    y = np.asarray(spmm(G, jnp.asarray(X), "gcn"))
    s2 = 1.0 / np.sqrt(2.0)
    expect = np.array([
        X[3],                       # w(3→0) = 1/sqrt(1·1)
        (X[0] + X[2]) * s2,         # w(·→1) = 1/sqrt(1·2)
        [0.0, 0.0],
        X[1],
    ], np.float32)
    np.testing.assert_allclose(y, expect, rtol=1e-6)


def test_gin_layer_values():
    # GIN: y = (1 + eps)·x + sum-agg(x); eps initialises to 0
    layer = GINAgg(impl="xla")
    v = layer.init(jax.random.PRNGKey(0), G, jnp.asarray(X))
    assert float(v["params"]["eps"]) == 0.0
    y = np.asarray(layer.apply(v, G, jnp.asarray(X)))
    agg = np.array([X[3], X[0] + X[2], [0, 0], X[1]], np.float32)
    np.testing.assert_allclose(y, X + agg, rtol=1e-6)
    # learnable eps participates
    v2 = {"params": {"eps": jnp.asarray(0.5)}}
    y2 = np.asarray(layer.apply(v2, G, jnp.asarray(X)))
    np.testing.assert_allclose(y2, 1.5 * X + agg, rtol=1e-6)


def test_sage_layer_values():
    """SAGE: fc_self(x) + fc_neigh(mean-agg(x)), bias only on fc_self."""
    layer = SAGEConv(2, feat_drop=0.0, impl="xla")
    v = layer.init(jax.random.PRNGKey(0), G, jnp.asarray(X))
    w_self = np.asarray(v["params"]["fc_self"]["kernel"])
    b_self = np.asarray(v["params"]["fc_self"]["bias"])
    w_neigh = np.asarray(v["params"]["fc_neigh"]["kernel"])
    assert "bias" not in v["params"]["fc_neigh"]
    y = np.asarray(layer.apply(v, G, jnp.asarray(X)))
    agg = np.array([X[3], (X[0] + X[2]) / 2, [0, 0], X[1]], np.float32)
    expect = X @ w_self + b_self + agg @ w_neigh
    np.testing.assert_allclose(y, expect, rtol=1e-5, atol=1e-6)


def test_gcn_layer_bias():
    layer = GraphConvAgg(2, impl="xla")
    v = {"params": {"bias": jnp.asarray([10.0, 20.0])}}
    y = np.asarray(layer.apply(v, G, jnp.asarray(X)))
    s2 = 1.0 / np.sqrt(2.0)
    agg = np.array([X[3], (X[0] + X[2]) * s2, [0, 0], X[1]], np.float32)
    np.testing.assert_allclose(y, agg + np.array([10.0, 20.0]), rtol=1e-6)
