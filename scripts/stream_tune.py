"""Stream-plan geometry sweep (products regime): window (RW) × tile_slots,
dense-row vs CBSR-edge-gather forward, measured on the claimed device.

At deg ~50 the auto window is 8 rows, and a [8,128]x[128,256] one-hot pass
wastes >90% of an MXU tile — RW 16/32 cost the same MXU passes but cut the
chunk fragmentation that holds products fill at 0.64. Measure, don't guess.

  timeout 1800 env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/stream_tune.py --scale deg50 --k 32
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="deg50")
    ap.add_argument("--windows", nargs="*", type=int, default=[8, 16, 32])
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--stream", default="bf16x2")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import SCALES
    from spgemm_gnn_tpu.bench.harness import _cached_powerlaw, time_chained
    from spgemm_gnn_tpu.graphs.stream_tiles import stream_plan_for_graph
    from spgemm_gnn_tpu.kernels.stream_pallas import (
        stream_spmm, stream_spmm_cbsr)
    from spgemm_gnn_tpu.ops.maxk import maxk, cbsr_from_masked, pack_channels

    n_nodes, n_edges = SCALES[args.scale]
    g = _cached_powerlaw(n_nodes, n_edges // 2, 0)
    interp = jax.default_backend() != "tpu"
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (g.num_nodes, args.dim), jnp.float32)
    xk = maxk(x0, args.k)
    vals, ch = cbsr_from_masked(xk, args.k)
    pch = pack_channels(ch)
    n = g.num_nodes
    y_ref = None
    for rw in args.windows:
        t0 = time.time()
        plan = stream_plan_for_graph(g, window=rw)
        t_plan = time.time() - t0
        # plan/channels as jit arguments — never closures (CLAUDE.md)
        f_dense = jax.jit(lambda xv, p: stream_spmm(
            p, xv, stream=args.stream, interpret=interp)[:n])
        f_cbsr = jax.jit(lambda v, pc, p: stream_spmm_cbsr(
            p, v, pc, args.dim, stream=args.stream, interpret=interp)[:n])
        y = f_dense(xk, plan)
        if y_ref is None:
            y_ref = y
        err = float(jnp.max(jnp.abs(f_cbsr(vals, pch, plan) - y))
                    / (1e-6 + jnp.max(jnp.abs(y))))
        xerr = float(jnp.max(jnp.abs(y - y_ref))
                     / (1e-6 + jnp.max(jnp.abs(y_ref))))
        t_d = time_chained(lambda xv: xv + f_dense(xv, plan) * 1e-9, xk,
                           args.iters)
        t_c = time_chained(lambda v: v + f_cbsr(v, pch, plan)[:, :args.k]
                           * 1e-9, vals, args.iters)
        print(json.dumps({
            "scale": args.scale, "edges": g.num_edges, "k": args.k,
            "window": rw, "fill": round(float(plan.fill), 4),
            "groups": plan.num_groups, "plan_s": round(t_plan, 1),
            "dense_ms": round(t_d * 1e3, 2), "cbsr_ms": round(t_c * 1e3, 2),
            "dense_gedges": round(g.num_edges / t_d / 1e9, 4),
            "cbsr_gedges": round(g.num_edges / t_c / 1e9, 4),
            "err_cbsr_vs_dense": err, "err_vs_rw0": xerr}), flush=True)


if __name__ == "__main__":
    main()
