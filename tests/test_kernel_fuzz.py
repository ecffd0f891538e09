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
