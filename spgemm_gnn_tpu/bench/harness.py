"""Benchmark primitives.

Timing method: the axon TPU tunnel makes per-call host sync unreliable
(block_until_ready can return before completion; host readbacks are the only
true sync). We therefore chain `iters` data-dependent applications of the
function and bracket ONE tiny readback, reporting (total - t1) / (iters - 1)
when possible to amortise dispatch+readback overhead.
"""
from __future__ import annotations

import time
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp

from spgemm_gnn_tpu.graphs.synthetic import powerlaw_graph

from spgemm_gnn_tpu.kernels.planned import plan_graph



def time_chained(step: Callable[[Any], Any], x0: Any, iters: int = 8,
                 max_seconds: float = 20.0) -> float:
    """Seconds per iteration of `step` (x -> x-like), data-dependence chained.

    The timed chain continues from the warm-up output (never reuses x0, which
    a donating step may have consumed). If a single warm iteration exceeds
    max_seconds/iters, fewer timed iterations are used (slow-baseline guard).
    """
    x = step(x0)   # warm (compile) + sync
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[0])
    t0 = time.perf_counter()
    x = step(x)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[0])
    t1 = time.perf_counter() - t0
    if t1 * iters > max_seconds:
        iters = max(int(max_seconds / max(t1, 1e-9)), 1)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[0])
    return (time.perf_counter() - t0) / iters


def _cached_graph(generator: str, n_nodes: int, n_edges: int, seed: int,
                  **genkw):
    """Disk-cached synthetic graph (bench graphs are expensive to rebuild and
    the driver reruns bench.py in a fresh process). generator: "powerlaw"
    (uniform hub-skew) or the clustered families "sbm" / "rmat"
    (graphs/synthetic.py, VERDICT r4 #2)."""
    import os
    from spgemm_gnn_tpu.graphs.csr import from_edges
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".bench_cache")
    tag = "pl" if generator == "powerlaw" else generator + "_".join(
        f"{k}{v}" for k, v in sorted(genkw.items()))
    path = os.path.join(cache_dir, f"{tag}_{n_nodes}_{n_edges}_{seed}.npz")
    if os.path.exists(path):
        z = np.load(path)
        return from_edges(z["src"], z["dst"], int(z["n"]), symmetric=True)
    if generator == "powerlaw":
        g = powerlaw_graph(n_nodes, n_edges, seed=seed)
    elif generator == "sbm":
        from spgemm_gnn_tpu.graphs.synthetic import sbm_graph
        g = sbm_graph(n_nodes, n_edges, seed=seed, **genkw)
    elif generator == "rmat":
        from spgemm_gnn_tpu.graphs.synthetic import rmat_graph
        g = rmat_graph(n_nodes, n_edges, seed=seed, **genkw)
    else:
        raise ValueError(f"unknown generator {generator!r}")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez(path, src=np.asarray(g.indices), dst=np.asarray(g.edge_dst),
                 n=g.num_nodes)
    except OSError:
        pass
    return g


def _cached_powerlaw(n_nodes: int, n_edges: int, seed: int):
    return _cached_graph("powerlaw", n_nodes, n_edges, seed)


def _bench_inputs(n_nodes: int, n_edges: int, dim: int, k: int, seed: int,
                  plan_kw: dict | None):
    import os
    from spgemm_gnn_tpu.ops.maxk import maxk
    g = _cached_powerlaw(n_nodes, n_edges // 2, seed)
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".bench_cache")
    pg = plan_graph(g, cache_dir=cache_dir, **(plan_kw or {}))
    # feature/cotangent inputs are generated ON DEVICE: the axon tunnel moves
    # ~1 MB/s, so host-side RNG would add minutes of startup per bench run
    key = jax.random.PRNGKey(seed)
    x0 = jax.random.normal(key, (g.num_nodes, dim), jnp.float32)
    xk = maxk(x0, k)   # the masked-dense activations the models aggregate
    ct = jax.random.normal(jax.random.fold_in(key, 1),
                           (g.num_nodes, dim), jnp.float32)
    return g, pg, xk, ct


def bench_impl(g, pg, xk, ct, dim: int, k: int, norm: str, impl: str,
               iters: int = 8, graph_override=None) -> dict[str, float]:
    """Time fwd/bwd of the model-level aggregate() for one implementation.

    Graph/cotangent are jit arguments, not closures (closures embed as HLO
    constants — breaks the remote-compile TPU path). graph_override supplies
    a prepared structure for impls that need one (e.g. an ops.ell.ELLGraph
    for impl='ell')."""
    from spgemm_gnn_tpu.kernels.api import aggregate
    if graph_override is not None:
        graph = graph_override
    else:
        graph = pg if impl == "pallas" else g

    fwd = jax.jit(lambda xv, gr: aggregate(gr, xv, norm=norm, k=k, impl=impl))

    def fwd_step(xv):
        return xv + fwd(xv, graph) * 1e-9

    t_fwd = time_chained(fwd_step, xk, iters)

    bwd = jax.jit(jax.grad(
        lambda xv, gr, cot: (aggregate(gr, xv, norm=norm, k=k, impl=impl)
                             * cot).sum()))

    def bwd_step(xv):
        return xv + bwd(xv, graph, ct) * 1e-9

    t_bwd = time_chained(bwd_step, xk, iters)
    return {"fwd_s": t_fwd, "bwd_s": t_bwd,
            "fwd_gedges": g.num_edges / t_fwd / 1e9,
            "bwd_gedges": g.num_edges / t_bwd / 1e9}


def validate_numerics(g, pg, xk, ct, dim: int, k: int,
                      norm: str = "mean") -> dict:
    """On-device numerics record for the benchmarked config: Pallas (f32 and
    bf16x2 streams) vs the XLA oracle, forward and gradient. Written per round
    as the kernel-correctness artifact (bench.py --validate)."""
    import time as _time
    from spgemm_gnn_tpu.kernels import planned
    from spgemm_gnn_tpu.kernels.api import aggregate

    def fwd(impl, graph):
        return jax.jit(lambda xv, gr: aggregate(gr, xv, norm=norm, k=k,
                                                impl=impl))(xk, graph)

    def bwd(impl, graph):
        f = jax.jit(jax.grad(lambda xv, gr, cot: (
            aggregate(gr, xv, norm=norm, k=k, impl=impl) * cot).sum()))
        return f(xk, graph, ct)

    def relerr(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return float(np.max(np.abs(a - b)) / (1e-6 + np.max(np.abs(b))))

    # gradients are compared ON THE MAXK SUPPORT: the planned fast path
    # returns the unmasked dense cotangent (MaxK's own VJP masks it next in
    # the training composition), the CBSR path masks at the k channels —
    # they agree exactly where the gradient is consumed.
    support = np.asarray(xk) != 0

    old = planned.DEFAULT_STREAM
    try:
        y_x = fwd("xla", g)
        g_x = bwd("xla", g) * support
        planned.DEFAULT_STREAM = "f32"
        y_p32 = fwd("pallas", pg)
        g_p32 = bwd("pallas", pg) * support
        planned.DEFAULT_STREAM = "bf16x2"
        y_p16 = fwd("pallas", pg)
    finally:
        planned.DEFAULT_STREAM = old
    out = {
        "backend": jax.default_backend(),
        "num_edges": g.num_edges, "dim": dim, "k": k,
        "plan_kind": type(pg.fwd_plan).__name__,
        "fwd_f32_relerr_vs_oracle": relerr(y_p32, y_x),
        "bwd_f32_relerr_vs_oracle": relerr(g_p32, g_x),
        "fwd_bf16x2_relerr_vs_f32": relerr(y_p16, y_p32),
        "recorded": _time.strftime("%F %T"),
    }
    out["pass"] = (out["fwd_f32_relerr_vs_oracle"] < 1e-3
                   and out["bwd_f32_relerr_vs_oracle"] < 1e-3
                   and out["fwd_bf16x2_relerr_vs_f32"] < 2e-2)
    return out


# edge cap for the XLA baseline: its gather/scatter formulation materialises
# O(E·dim) buffers and cannot run Reddit-scale graphs in 16 GB HBM. Above the
# cap the baseline is measured on a same-structure smaller graph and reported
# per-edge (the formulation is linear in E).
XLA_BASELINE_EDGE_CAP = 6_000_000


def bench_aggregation(n_nodes: int, n_edges: int, dim: int, k: int,
                      impls=("xla", "pallas"), norm: str = "mean",
                      iters: int = 8, seed: int = 0,
                      plan_kw: dict | None = None) -> dict[str, Any]:
    """Forward+backward aggregation micro-bench on a synthetic power-law graph.

    Returns {impl: {fwd_s, bwd_s, fwd_gedges, bwd_gedges}, meta...}.
    """
    g, pg, xk, ct = _bench_inputs(n_nodes, n_edges, dim, k, seed, plan_kw)
    out: dict[str, Any] = {"num_nodes": g.num_nodes, "num_edges": g.num_edges,
                           "dim": dim, "k": k,
                           "fwd_fill": pg.fwd_plan.fill,
                           "bwd_fill": pg.bwd_plan.fill}
    for impl in impls:
        if impl == "xla" and g.num_edges > XLA_BASELINE_EDGE_CAP:
            scale = XLA_BASELINE_EDGE_CAP / n_edges
            gs, pgs, xks, cts = _bench_inputs(
                max(int(n_nodes * scale), 1024), XLA_BASELINE_EDGE_CAP,
                dim, k, seed, plan_kw)
            r = bench_impl(gs, pgs, xks, cts, dim, k, norm, impl, iters)
            # report per-edge rates (times rescaled to the full edge count)
            ratio = g.num_edges / gs.num_edges
            out[impl] = {"fwd_s": r["fwd_s"] * ratio,
                         "bwd_s": r["bwd_s"] * ratio,
                         "fwd_gedges": r["fwd_gedges"],
                         "bwd_gedges": r["bwd_gedges"],
                         "subsampled_edges": gs.num_edges}
        else:
            out[impl] = bench_impl(g, pg, xk, ct, dim, k, norm, impl, iters)
    return out


def bench_training_step(dataset, config, iters: int = 4) -> dict[str, Any]:
    """Wall time per full training step (fwd+bwd+update) for a Trainer config."""
    from spgemm_gnn_tpu.train.loop import Trainer
    tr = Trainer(config, dataset)
    state = tr.init_state()
    rng = jax.random.PRNGKey(0)

    # warm/compile
    state, loss = tr.train_step(state, rng)
    _ = float(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        state, loss = tr.train_step(state, jax.random.fold_in(rng, i))
    _ = float(loss)
    per = (time.perf_counter() - t0) / iters
    return {"step_s": per, "epochs_per_s": 1.0 / per,
            "edges_per_s": tr.g.num_edges / per}
