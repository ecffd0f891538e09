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


def bench_aggregation(n_nodes: int, n_edges: int, dim: int, k: int,
                      impls=("xla", "pallas"), norm: str = "mean",
                      iters: int = 8, seed: int = 0,
                      plan_kw: dict | None = None) -> dict[str, Any]:
    """Forward+backward aggregation micro-bench on a synthetic power-law graph.

    Returns {impl: {fwd_s, bwd_s, fwd_gedges, bwd_gedges}, meta...}.
    """
    from spgemm_gnn_tpu.ops.maxk import maxk

    g = powerlaw_graph(n_nodes, n_edges // 2, seed=seed)
    pg = plan_graph(g, **(plan_kw or {}))
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(rng.standard_normal((g.num_nodes, dim), dtype=np.float32))
    xk = maxk(x0, k)   # the masked-dense activations the models aggregate
    ct = jnp.asarray(rng.standard_normal((g.num_nodes, dim), dtype=np.float32))
    out: dict[str, Any] = {"num_nodes": g.num_nodes, "num_edges": g.num_edges,
                           "dim": dim, "k": k,
                           "fwd_fill": pg.fwd_plan.fill,
                           "bwd_fill": pg.bwd_plan.fill}

    from spgemm_gnn_tpu.kernels.api import aggregate

    for impl in impls:
        graph = pg if impl == "pallas" else g

        # graph/cotangent are jit arguments, not closures (closures embed as
        # HLO constants — breaks the remote-compile TPU path). This measures
        # the model-level path: aggregate() on MaxK-masked dense activations.
        fwd = jax.jit(
            lambda xv, gr: aggregate(gr, xv, norm=norm, k=k, impl=impl))

        def fwd_step(xv):
            y = fwd(xv, graph)
            return xv + y * 1e-9

        t_fwd = time_chained(fwd_step, xk, iters)

        bwd = jax.jit(jax.grad(
            lambda xv, gr, cot: (aggregate(gr, xv, norm=norm, k=k, impl=impl)
                                 * cot).sum()))

        def bwd_step(xv):
            return xv + bwd(xv, graph, ct) * 1e-9

        t_bwd = time_chained(bwd_step, xk, iters)
        out[impl] = {
            "fwd_s": t_fwd, "bwd_s": t_bwd,
            "fwd_gedges": g.num_edges / t_fwd / 1e9,
            "bwd_gedges": g.num_edges / t_bwd / 1e9,
        }
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
