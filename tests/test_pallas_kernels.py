"""Pallas SpGEMM/SSpMM kernel tests (interpreter mode on CPU — the Pallas
"sanitizer", SURVEY.md §5.2) against the XLA oracle, plus end-to-end gradient
parity through the custom_vjp "pallas" impl."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spgemm_gnn_tpu.graphs.synthetic import powerlaw_graph, random_graph
from spgemm_gnn_tpu.kernels.api import aggregate_cbsr
from spgemm_gnn_tpu.kernels.planned import plan_graph
from spgemm_gnn_tpu.ops.maxk import maxk, maxk_cbsr, cbsr_to_dense
from spgemm_gnn_tpu.ops.spmm import spmm

DIM, K = 128, 4   # DIM must be a multiple of 128 (lane width)
PLAN = dict(tile_slots=128, src_block=256, dst_block=128, window=8)


@pytest.fixture(scope="module", params=["powerlaw", "uniform", "directed"])
def pg(request):
    if request.param == "powerlaw":
        g = powerlaw_graph(300, 3000, seed=11)
    elif request.param == "uniform":
        g = random_graph(150, 1200, seed=12)
    else:
        g = random_graph(170, 1100, seed=13, symmetric=False)
    return plan_graph(g, **PLAN)


@pytest.mark.parametrize("norm", ["sum", "mean", "gcn"])
def test_pallas_forward_matches_xla(pg, rng, norm):
    g = pg.graph
    x = jnp.asarray(rng.standard_normal((g.num_nodes, DIM)).astype(np.float32))
    vals, ch = maxk_cbsr(x, K)
    y_pallas = np.asarray(aggregate_cbsr(pg, vals, ch, DIM, norm, "pallas"))
    y_xla = np.asarray(aggregate_cbsr(g, vals, ch, DIM, norm, "xla"))
    np.testing.assert_allclose(y_pallas, y_xla, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("norm", ["sum", "mean", "gcn"])
def test_pallas_backward_matches_xla(pg, rng, norm):
    g = pg.graph
    x = jnp.asarray(rng.standard_normal((g.num_nodes, DIM)).astype(np.float32))
    vals, ch = maxk_cbsr(x, K)
    ct = jnp.asarray(rng.standard_normal((g.num_nodes, DIM)).astype(np.float32))

    def grad_via(graph, impl):
        f = lambda v: (aggregate_cbsr(graph, v, ch, DIM, norm, impl) * ct).sum()
        return np.asarray(jax.grad(f)(vals))

    gp = grad_via(pg, "pallas")
    gx = grad_via(g, "xla")
    np.testing.assert_allclose(gp, gx, rtol=1e-4, atol=1e-5)


def test_pallas_under_jit_full_pipeline(pg, rng):
    """maxk → CBSR → pallas aggregate → loss, jitted, grads finite + correct."""
    g = pg.graph
    x = jnp.asarray(rng.standard_normal((g.num_nodes, DIM)).astype(np.float32))

    @jax.jit
    def loss_pallas(x):
        vals, ch = maxk_cbsr(x, K)
        y = aggregate_cbsr(pg, vals, ch, DIM, "mean", "pallas")
        return (y ** 2).sum()

    @jax.jit
    def loss_dense(x):
        return (spmm(g, maxk(x, K), "mean") ** 2).sum()

    np.testing.assert_allclose(float(loss_pallas(x)), float(loss_dense(x)),
                               rtol=1e-4)
    gp = np.asarray(jax.grad(loss_pallas)(x))
    gd = np.asarray(jax.grad(loss_dense)(x))
    np.testing.assert_allclose(gp, gd, rtol=1e-3, atol=1e-4)


def test_planned_graph_auto_impl(pg, rng):
    """impl='auto' on a PlannedGraph routes to pallas."""
    g = pg.graph
    x = jnp.asarray(rng.standard_normal((g.num_nodes, DIM)).astype(np.float32))
    vals, ch = maxk_cbsr(x, K)
    y_auto = np.asarray(aggregate_cbsr(pg, vals, ch, DIM, "mean", "auto"))
    y_x = np.asarray(aggregate_cbsr(g, vals, ch, DIM, "mean", "xla"))
    np.testing.assert_allclose(y_auto, y_x, rtol=1e-4, atol=1e-5)


def test_bf16x2_packed_stream(pg, rng):
    """bf16x2-packed feature stream: one gather serves two dim halves;
    matches the f32 stream at bf16 tolerance."""
    from spgemm_gnn_tpu.kernels.spgemm_pallas import planned_spmm
    import jax.numpy as jnp
    g = pg.graph
    plan = pg.fwd_plan
    x = rng.standard_normal((plan.padded_src, DIM)).astype(np.float32)
    xt = jnp.asarray(x.T)
    y32 = np.asarray(planned_spmm(plan, xt, interpret=True))
    y16 = np.asarray(planned_spmm(plan, xt, stream="bf16x2", interpret=True))
    scale = np.abs(y32).max() + 1e-6
    assert np.max(np.abs(y16 - y32)) / scale < 2e-2   # bf16 mantissa
    # correlation sanity: same structure
    np.testing.assert_allclose(y16, y32, rtol=0.1, atol=0.05 * scale)


def test_bf16x2_maxk_sparse_stream(pg, rng):
    """bf16x2 with MaxK-sparse input — the dominant real workload: most lanes
    are zero, so the packed f32 words are frequently subnormal (hi half = 0).
    The kernel must treat packed words as opaque bits (select, never float
    arithmetic — ADVICE r1) or these values silently flush to zero on TPU.
    With k-sparse bf16-representable inputs the result must be EXACT."""
    from spgemm_gnn_tpu.kernels.spgemm_pallas import planned_spmm
    plan = pg.fwd_plan
    n = plan.padded_src
    # bf16-exact values (small ints) so the stream itself is lossless
    x = rng.integers(-8, 9, size=(n, DIM)).astype(np.float32)
    x = np.asarray(maxk(jnp.asarray(x + 0.125 * np.sign(x)), K))  # k-sparse
    xt = jnp.asarray(x.T)
    y32 = np.asarray(planned_spmm(plan, xt, interpret=True))
    y16 = np.asarray(planned_spmm(plan, xt, stream="bf16x2", interpret=True))
    np.testing.assert_allclose(y16, y32, rtol=0, atol=1e-6)


def test_densify_rows_and_sample_channels(rng):
    """Row-major CBSR densify + channel sampling Pallas kernels vs the XLA
    formulations they replace (the explicit-CBSR path's glue ops)."""
    from spgemm_gnn_tpu.kernels.spgemm_pallas import (densify_rows,
                                                      sample_channels)
    from spgemm_gnn_tpu.ops.maxk import cbsr_to_dense, maxk_cbsr
    n, dim, k = 300, 128, 8
    x = jnp.asarray(rng.standard_normal((n, dim)).astype(np.float32))
    vals, ch = maxk_cbsr(x, k)
    dense_p = np.asarray(densify_rows(vals, ch, dim, interpret=True))
    dense_x = np.asarray(cbsr_to_dense(vals, ch, dim))
    np.testing.assert_allclose(dense_p, dense_x, rtol=0, atol=0)
    z = jnp.asarray(rng.standard_normal((n, dim)).astype(np.float32))
    s_p = np.asarray(sample_channels(z, ch, interpret=True))
    s_x = np.asarray(jnp.take_along_axis(z, ch, axis=-1))
    np.testing.assert_allclose(s_p, s_x, rtol=0, atol=0)


def test_multiwindow_span_dispatch(rng):
    """Span-class dispatch (the full-graph λ-collapse fix): a low-λ plan
    whose window is 256 must produce BIT-IDENTICAL output whether each chunk
    pays the full-RW one-hot matmul or its smallest covering span class."""
    from spgemm_gnn_tpu.graphs.tiles import build_tile_plan
    from spgemm_gnn_tpu.kernels.spgemm_pallas import (branch_windows_for,
                                                      planned_spmm)
    g = powerlaw_graph(3000, 40000, seed=7)
    plan = build_tile_plan(np.asarray(g.indptr), np.asarray(g.indices),
                           g.num_nodes, tile_slots=1024, src_block=128,
                           dst_block=1024, window=256)
    assert branch_windows_for(plan.window) == (64, 128, 256)
    dim = 128
    x = rng.standard_normal((plan.padded_src, dim)).astype(np.float32)
    xt = jnp.asarray(x.T)
    y_mw = np.asarray(planned_spmm(plan, xt, interpret=True,
                                   multiwindow=True))
    y_1w = np.asarray(planned_spmm(plan, xt, interpret=True,
                                   multiwindow=False))
    y_ns = np.asarray(planned_spmm(plan, xt, interpret=True,
                                   multiwindow=False, skip_empty=False))
    np.testing.assert_array_equal(y_mw, y_1w)
    np.testing.assert_array_equal(y_ns, y_1w)
    # and against the segment-sum oracle
    dst = np.repeat(np.arange(g.num_nodes), np.diff(np.asarray(g.indptr)))
    oracle = np.zeros((plan.padded_dst, dim), np.float32)
    np.add.at(oracle, dst, x[np.asarray(g.indices)])
    np.testing.assert_allclose(y_mw, oracle, rtol=1e-4, atol=1e-4)
    # bf16x2 stream rides the same dispatch
    y16 = np.asarray(planned_spmm(plan, xt, stream="bf16x2", interpret=True,
                                  multiwindow=True))
    scale = np.abs(oracle).max() + 1e-6
    assert np.max(np.abs(y16 - oracle)) / scale < 2e-2


def test_windowed_classes_plan(rng):
    """Per-density window classes (graphs/tiles.py::build_tile_plan_classes):
    disjoint bucket partitions must reproduce the single-plan aggregation
    exactly through fast path, gradient, CBSR path, and the disk cache."""
    import tempfile
    from spgemm_gnn_tpu.graphs.plan_cache import load_plan, save_plan
    from spgemm_gnn_tpu.graphs.tiles import MultiTilePlan
    from spgemm_gnn_tpu.kernels.planned import plan_graph
    g = powerlaw_graph(2500, 60000, seed=3)
    pgc = plan_graph(g, kind="windowed_classes", tile_slots=256,
                     src_block=128, dst_block=512)
    mp = pgc.fwd_plan
    assert isinstance(mp, MultiTilePlan) and len(mp.plans) >= 2
    # classes partition the edges exactly
    assert sum(p.num_edges for p in mp.plans) == g.num_edges
    x = jnp.asarray(rng.standard_normal((g.num_nodes, DIM)).astype(np.float32))
    xk = maxk(x, K)
    y = np.asarray(aggregate_cbsr(pgc, *maxk_cbsr(x, K), DIM, "mean",
                                  "pallas"))
    y0 = np.asarray(aggregate_cbsr(g, *maxk_cbsr(x, K), DIM, "mean", "xla"))
    np.testing.assert_allclose(y, y0, rtol=1e-4, atol=1e-5)
    from spgemm_gnn_tpu.kernels.api import aggregate
    ct = jnp.asarray(rng.standard_normal(y0.shape).astype(np.float32))
    gp = np.asarray(jax.grad(lambda v: (
        aggregate(pgc, v, norm="mean", k=K, impl="pallas") * ct).sum())(xk))
    g0 = np.asarray(jax.grad(lambda v: (spmm(g, v, "mean") * ct).sum())(xk))
    np.testing.assert_allclose(gp, g0, rtol=1e-4, atol=1e-5)
    with tempfile.TemporaryDirectory() as d:
        save_plan(d + "/mp.npz", mp)
        mp2 = load_plan(d + "/mp.npz")
    assert isinstance(mp2, MultiTilePlan)
    assert [p.window for p in mp2.plans] == [p.window for p in mp.plans]
