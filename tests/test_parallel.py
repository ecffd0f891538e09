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


def test_dryrun_sweep_matrix():
    """The multi-chip certification matrix (VERDICT r2 #6): dense/CBSR
    exchange, f32/bf16x2 stream, windowed/stream shard plans, all three
    norms — every config validated vs the single-device oracle with comm
    stats. run_sweep asserts internally; re-assert the coverage here."""
    from spgemm_gnn_tpu.parallel.dryrun import run_sweep
    recs = run_sweep(4)
    assert all(r["ok"] for r in recs)
    assert {r["norm"] for r in recs} == {"sum", "mean", "gcn"}
    assert {r["stream"] for r in recs} == {"f32", "bf16x2"}
    assert any(r["k"] for r in recs) and any(r["k"] is None for r in recs)
    kinds = {k for r in recs for k in r["plan_kinds"]}
    assert kinds == {"StackedWindowed", "StackedStream"}
    assert all(r["exchange_bytes"] <= r["full_gather_bytes"] for r in recs)
    # the yelp-shaped wide config exercises the uint16×2 channel pack
    assert any(r["dim"] > 256 and r["k"] for r in recs)
    # bf16 halo values (VERDICT r4 #8): ~1.6× smaller CBSR payload
    b16 = next(r for r in recs if r["halo_dtype"] == "bf16")
    f32 = next(r for r in recs if r["config"] == "windowed_cbsr_f32_mean")
    assert f32["exchange_bytes"] / b16["exchange_bytes"] > 1.5


def test_trajectory_match_multichip():
    """Multi-epoch sharded Trainer vs single-device oracle: locked loss and
    accuracy trajectories + best-val checkpoint restore (VERDICT r4 #5)."""
    from spgemm_gnn_tpu.parallel.dryrun import run_trajectory_match
    rec = run_trajectory_match(4, epochs=5)
    assert rec["ok"]
    assert rec["max_loss_diff"] < 2e-4
    assert rec["best_epoch_single"] == rec["best_epoch_sharded"]


def test_multihost_helpers():
    """Multi-host plumbing: single-process no-op, hybrid mesh fallback on the
    fake CPU mesh, process summary (SURVEY.md §5.8; real pods unreachable
    here — the launch logic is what's testable)."""
    from spgemm_gnn_tpu.parallel.multihost import (
        initialize_multihost, make_hybrid_mesh, process_summary)
    assert initialize_multihost(None, 1, 0) is False   # single-process no-op
    mesh = make_hybrid_mesh(dcn=2, ici=4)
    assert mesh.shape == {"dp": 2, "graph": 4}
    mesh1 = make_hybrid_mesh(ici=8)                    # dcn inferred = 1
    assert mesh1.shape == {"dp": 1, "graph": 8}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        make_hybrid_mesh(dcn=3, ici=3)
    s = process_summary()
    assert s["process_count"] == 1 and s["global_devices"] == 8


def test_hybrid_mesh_trains():
    """A (dp=2, graph=4) hybrid mesh supports the sharded-aggregation layout
    on its ICI axis."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from spgemm_gnn_tpu.parallel.multihost import make_hybrid_mesh
    from spgemm_gnn_tpu.parallel.sharded import shard_graph, sharded_spmm
    from spgemm_gnn_tpu.graphs.synthetic import powerlaw_graph
    from spgemm_gnn_tpu.ops.spmm import spmm
    mesh = make_hybrid_mesh(dcn=2, ici=4)
    g = powerlaw_graph(200, 1600, seed=61)
    sg = shard_graph(g, mesh, axis="graph")
    x = np.zeros((sg.padded_nodes, 32), np.float32)
    x[:g.num_nodes] = np.random.default_rng(0).standard_normal(
        (g.num_nodes, 32))
    xs = jax.device_put(x, NamedSharding(mesh, P("graph")))
    y = np.asarray(jax.jit(
        lambda xv, s: sharded_spmm(s, xv, "mean"))(xs, sg))
    y_ref = np.asarray(spmm(g, jnp.asarray(x[:g.num_nodes]), "mean"))
    np.testing.assert_allclose(y[:g.num_nodes], y_ref, rtol=1e-4, atol=1e-5)
