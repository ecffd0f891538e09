"""Timing instrumentation — the aggregation-% stat as a first-class measurement
(reference `SAGE.start_timing/stop_timing`, utils/models.py:167-232, reported at
maxk_gnn_dgl.py:150-153 — there implemented by monkey-patching DGL internals
with cuda-synchronize fences; here by timing explicitly jitted sub-programs).

Under jit the whole train step is one fused program, so the aggregation share
cannot be bracketed inline; instead we time (a) the full step and (b) an
aggregation-only program with identical shapes/impl, and report b/a. This is
the Amdahl number that motivates the MaxK kernels (59.8% on Reddit SAGE ReLU —
BASELINE.md).
"""
from __future__ import annotations

import time
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp


def measure_aggregation_fraction(trainer, iters: int = 4) -> dict[str, Any]:
    """Estimate the fraction of a training step spent in graph aggregation."""
    from spgemm_gnn_tpu.bench.harness import time_chained
    from spgemm_gnn_tpu.kernels.api import aggregate
    from spgemm_gnn_tpu.ops.maxk import maxk

    cfg = trainer.config
    g = trainer.g
    state = trainer.init_state()
    rng = jax.random.PRNGKey(0)

    def full_step(state):
        new_state, _ = trainer.train_step(state, rng)
        return new_state

    t_step = time_chained(full_step, state, iters)

    # aggregation-only program: L layers of (maxk +) aggregate fwd+bwd at the
    # hidden dim, matching what the model's layers execute
    dim = cfg.hidden_dim
    k = cfg.maxk if cfg.nonlinear == "maxk" else None
    layers = cfg.hidden_layers
    # the probe rides the configured compute dtype — an extra f32 [N, dim]
    # on top of the live training state OOMs at products scale under bf16
    x0 = jnp.zeros((g.num_nodes, dim), jnp.dtype(cfg.dtype))

    def agg_loss(x, g):
        h = x
        for _ in range(layers):
            h2 = maxk(h, k) if k else jax.nn.relu(h)
            h = aggregate(g, h2, norm="mean", k=k, impl=cfg.impl)
        return (h ** 2).sum()

    agg_grad = jax.jit(jax.grad(agg_loss, argnums=0))

    def agg_step(x):
        return x + agg_grad(x, g) * 1e-9

    t_agg = time_chained(agg_step, x0, iters)

    frac = min(t_agg / t_step, 1.0) if t_step > 0 else 0.0
    return {"step_s": t_step, "aggregation_s": t_agg,
            "aggregation_pct": 100.0 * frac}


class EpochTimer:
    """Simple wall-clock epoch timer (sync via tiny readback)."""

    def __init__(self):
        self.total = 0.0
        self.count = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.total += time.perf_counter() - self._t0
        self.count += 1
        return False

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)
