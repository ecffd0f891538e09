"""Multi-chip tests on the 8-virtual-device CPU mesh: sharded aggregation vs
single-device oracle (dense + CBSR routes, fwd + grad), and the full dryrun."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spgemm_gnn_tpu.graphs.synthetic import powerlaw_graph
from spgemm_gnn_tpu.ops.maxk import maxk
from spgemm_gnn_tpu.ops.spmm import spmm
from spgemm_gnn_tpu.parallel.mesh import make_mesh
from spgemm_gnn_tpu.parallel.sharded import shard_graph, sharded_spmm

DIM, K = 16, 4


@pytest.fixture(scope="module")
def setup():
    g = powerlaw_graph(300, 3000, seed=4)
    mesh = make_mesh(8)
    sg = shard_graph(g, mesh)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((g.num_nodes, DIM)).astype(np.float32)
    x_pad = np.zeros((sg.padded_nodes, DIM), np.float32)
    x_pad[:g.num_nodes] = x
    return g, sg, x, x_pad


@pytest.mark.parametrize("norm", ["sum", "mean", "gcn"])
def test_sharded_dense_matches_single(setup, norm):
    g, sg, x, x_pad = setup
    y_ref = np.asarray(spmm(g, jnp.asarray(x), norm))
    xs = jax.device_put(x_pad, sg.node_sharding())
    y = np.asarray(jax.jit(lambda x: sharded_spmm(sg, x, norm))(xs))
    np.testing.assert_allclose(y[:g.num_nodes], y_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(y[g.num_nodes:], 0.0, atol=1e-6)


@pytest.mark.parametrize("norm", ["mean", "gcn"])
def test_sharded_cbsr_matches_single(setup, norm):
    g, sg, x, x_pad = setup
    xk = np.asarray(maxk(jnp.asarray(x), K))
    xk_pad = np.zeros_like(x_pad)
    xk_pad[:g.num_nodes] = xk
    y_ref = np.asarray(spmm(g, jnp.asarray(xk), norm))
    xs = jax.device_put(xk_pad, sg.node_sharding())
    y = np.asarray(jax.jit(lambda x: sharded_spmm(sg, x, norm, k=K))(xs))
    np.testing.assert_allclose(y[:g.num_nodes], y_ref, rtol=1e-4, atol=1e-5)


def test_sharded_grad_matches_single(setup):
    g, sg, x, x_pad = setup
    ct = np.random.default_rng(1).standard_normal(
        (sg.padded_nodes, DIM)).astype(np.float32)

    def f_sharded(x):
        return (sharded_spmm(sg, x, "mean") * ct).sum()

    xs = jax.device_put(x_pad, sg.node_sharding())
    gs = np.asarray(jax.jit(jax.grad(f_sharded))(xs))

    def f_single(x):
        return (spmm(g, x, "mean") * ct[:g.num_nodes]).sum()

    gd = np.asarray(jax.grad(f_single)(jnp.asarray(x)))
    np.testing.assert_allclose(gs[:g.num_nodes], gd, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n", [2, 8])
def test_dryrun_multichip(n):
    from spgemm_gnn_tpu.parallel.dryrun import run_dryrun
    loss = run_dryrun(n)
    assert np.isfinite(loss) and loss > 0
