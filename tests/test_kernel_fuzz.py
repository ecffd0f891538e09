"""Fuzz the planned kernel across random graphs × plan geometries vs the XLA
oracle (interpret mode). Broad shallow coverage to complement the deep
fixed-geometry tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spgemm_gnn_tpu.graphs.synthetic import powerlaw_graph, random_graph
from spgemm_gnn_tpu.kernels.planned import plan_graph, planned_aggregate
from spgemm_gnn_tpu.ops.spmm import spmm

CASES = [
    # (graph kind, n, e, dim, tile_slots, src_block, dst_block, window)
    ("powerlaw", 123, 900, 128, 128, 128, 128, 8),
    ("powerlaw", 400, 5000, 128, 256, 128, 256, 16),
    ("uniform", 257, 2000, 256, 128, 256, 128, 8),
    ("uniform", 96, 300, 128, 256, 256, 256, 24),
    ("directed", 310, 1700, 128, 384, 128, 128, 8),
    ("powerlaw", 64, 4000, 128, 128, 128, 128, 40),   # dense tiny (hubs)
]


@pytest.mark.parametrize("kind,n,e,dim,s,b,r,rw", CASES)
def test_fuzz_planned_vs_oracle(kind, n, e, dim, s, b, r, rw):
    seed = hash((kind, n, e)) % 1000
    if kind == "powerlaw":
        g = powerlaw_graph(n, e, seed=seed)
    elif kind == "uniform":
        g = random_graph(n, e, seed=seed)
    else:
        g = random_graph(n, e, seed=seed, symmetric=False)
    pg = plan_graph(g, tile_slots=s, src_block=b, dst_block=r, window=rw)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((g.num_nodes, dim)).astype(np.float32))
    for norm in ("sum", "gcn"):
        y = np.asarray(planned_aggregate(pg, x, norm))
        y_ref = np.asarray(spmm(g, x, norm))
        np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-5,
                                   err_msg=f"{kind} {norm} S={s} B={b} R={r}")
    # grad through the transpose plan
    ct = jnp.asarray(rng.standard_normal((g.num_nodes, dim)).astype(np.float32))
    dx = np.asarray(jax.grad(
        lambda xv: (planned_aggregate(pg, xv, "mean") * ct).sum())(x))
    from spgemm_gnn_tpu.ops.spmm import spmm_transpose
    dx_ref = np.asarray(spmm_transpose(g, ct, "mean"))
    np.testing.assert_allclose(dx, dx_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_cbsr_compact(seed):
    """Random (n, dim, k, sparsity) against the XLA construction: dense
    reconstruction exact, channels distinct, gradient matches."""
    from spgemm_gnn_tpu.kernels.maxk_pallas import cbsr_compact_pallas
    from spgemm_gnn_tpu.ops.maxk import cbsr_from_masked, cbsr_to_dense, maxk

    rng = np.random.default_rng(1000 + seed)
    n = int(rng.integers(3, 400))
    dim = int(rng.choice([128, 200, 256, 384]))
    k = int(rng.choice([1, 2, 8, 17, 32]))
    block = int(rng.choice([64, 128, 512]))
    x = jnp.asarray(rng.standard_normal((n, dim)).astype(np.float32))
    xm = maxk(x, k)
    if rng.random() < 0.5:   # deficient rows
        xm = jnp.where(jnp.asarray(rng.random((n, dim)) < 0.4), xm, 0.0)
    v, c = cbsr_compact_pallas(xm, k, block)
    cfg = f"n={n} dim={dim} k={k} block={block}"
    np.testing.assert_array_equal(np.asarray(cbsr_to_dense(v, c, dim)),
                                  np.asarray(xm), err_msg=cfg)
    assert all(len(set(row)) == k for row in np.asarray(c)), cfg
    # weight the loss by CHANNEL (slot order differs between the kernel and
    # the oracle on deficient rows; the channel set is identical)
    u = jnp.asarray(rng.standard_normal(dim).astype(np.float32))

    def loss(fn, t):
        vals, ch = fn(t, k)
        return jnp.sum(vals * jnp.take(u, ch))

    g1 = jax.grad(lambda t: loss(
        lambda a, b: cbsr_compact_pallas(a, b, block), t))(xm)
    g0 = jax.grad(lambda t: loss(cbsr_from_masked, t))(xm)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-6,
                               err_msg=cfg)
