"""Direct planned (dense fast-path) aggregation vs the XLA oracle — fwd, vjp,
and through a model layer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spgemm_gnn_tpu.graphs.synthetic import powerlaw_graph
from spgemm_gnn_tpu.kernels.api import aggregate
from spgemm_gnn_tpu.kernels.planned import plan_graph, planned_aggregate
from spgemm_gnn_tpu.ops.maxk import maxk
from spgemm_gnn_tpu.ops.spmm import spmm, spmm_transpose

DIM = 128
PLAN = dict(tile_slots=128, src_block=128, dst_block=128, window=8)


@pytest.fixture(scope="module")
def pg():
    return plan_graph(powerlaw_graph(250, 2500, seed=21), **PLAN)


@pytest.mark.parametrize("norm", ["sum", "mean", "gcn"])
def test_planned_aggregate_forward(pg, rng, norm):
    g = pg.graph
    x = jnp.asarray(rng.standard_normal((g.num_nodes, DIM)).astype(np.float32))
    y = np.asarray(planned_aggregate(pg, x, norm))
    y_ref = np.asarray(spmm(g, x, norm))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("norm", ["mean", "gcn"])
def test_planned_aggregate_vjp(pg, rng, norm):
    g = pg.graph
    x = jnp.asarray(rng.standard_normal((g.num_nodes, DIM)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((g.num_nodes, DIM)).astype(np.float32))
    dx = np.asarray(jax.grad(
        lambda x: (planned_aggregate(pg, x, norm) * ct).sum())(x))
    dx_ref = np.asarray(spmm_transpose(g, ct, norm))
    np.testing.assert_allclose(dx, dx_ref, rtol=1e-4, atol=1e-5)


def test_aggregate_routes_planned_graph(pg, rng):
    """aggregate() on a PlannedGraph with maxk input: fast path ≡ dense path,
    including the gradient through maxk."""
    g = pg.graph
    x = jnp.asarray(rng.standard_normal((g.num_nodes, DIM)).astype(np.float32))

    def f_fast(x):
        return (aggregate(pg, maxk(x, 8), norm="mean", k=8,
                          impl="pallas") ** 2).sum()

    def f_ref(x):
        return (spmm(g, maxk(x, 8), "mean") ** 2).sum()

    np.testing.assert_allclose(float(f_fast(x)), float(f_ref(x)), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jax.grad(f_fast)(x)),
                               np.asarray(jax.grad(f_ref)(x)),
                               rtol=1e-3, atol=1e-4)


def test_aggregate_relu_path_through_plan(pg, rng):
    """Dense (ReLU) aggregation also routes through the planned kernel."""
    g = pg.graph
    x = jnp.asarray(rng.standard_normal((g.num_nodes, DIM)).astype(np.float32))
    y = np.asarray(aggregate(pg, x, norm="gcn", impl="pallas"))
    np.testing.assert_allclose(y, np.asarray(spmm(g, x, "gcn")), rtol=1e-4,
                               atol=1e-5)


def test_dim_384_yelp_hidden(pg, rng):
    """dim=384 (yelp hidden size): non-power-of-two lane multiple."""
    g = pg.graph
    x = jnp.asarray(rng.standard_normal((g.num_nodes, 384)).astype(np.float32))
    y = np.asarray(planned_aggregate(pg, x, "mean"))
    np.testing.assert_allclose(y, np.asarray(spmm(g, x, "mean")), rtol=1e-4,
                               atol=1e-5)
