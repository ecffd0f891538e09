"""CBSR-edge-gather stream forward A/B (VERDICT r2 #5) — measure, don't
analyse: dense-row stream vs [E, k]-gather stream at low-degree corpus
points, on the claimed device.

  timeout 1800 env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/stream_cbsr_probe.py --scale sparse --k 32

Prints one JSON line per (scale, k, variant) with the chained forward time
and validation error vs the dense-row stream.
"""
from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", nargs="*", default=["sparse"])
    ap.add_argument("--k", nargs="*", type=int, default=[32])
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--stream", default="bf16x2", choices=["f32", "bf16x2"])
    ap.add_argument("--dst-block", type=int, default=None,
                    help="stream-plan R override (smaller = less scoped "
                         "VMEM for the out block; k=32 needs <=2048)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import SCALES
    from spgemm_gnn_tpu.bench.harness import _cached_powerlaw, time_chained
    from spgemm_gnn_tpu.graphs.stream_tiles import stream_plan_for_graph
    from spgemm_gnn_tpu.kernels.stream_pallas import (
        stream_spmm, stream_spmm_cbsr)
    from spgemm_gnn_tpu.ops.maxk import maxk, cbsr_from_masked, pack_channels

    for scale in args.scale:
        n_nodes, n_edges = SCALES[scale]
        g = _cached_powerlaw(n_nodes, n_edges // 2, 0)
        plan_kw = {} if args.dst_block is None else dict(
            dst_block=args.dst_block)
        plan = stream_plan_for_graph(g, **plan_kw)
        interp = jax.default_backend() != "tpu"   # CPU smoke: interpret mode
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (g.num_nodes, args.dim), jnp.float32)
        for k in args.k:
            xk = maxk(x0, k)
            vals, ch = cbsr_from_masked(xk, k)
            pch = pack_channels(ch)
            n = g.num_nodes

            # plan/channel arrays ride as jit ARGUMENTS (CLAUDE.md: closed-
            # over plan arrays embed as HLO constants and overflow the
            # remote-compile payload at full scale)
            f_dense = jax.jit(lambda xv, p: stream_spmm(
                p, xv, stream=args.stream, interpret=interp)[:n])
            f_cbsr = jax.jit(lambda v, pc, p: stream_spmm_cbsr(
                p, v, pc, args.dim, stream=args.stream,
                interpret=interp)[:n])

            y_d = f_dense(xk, plan)
            t_d = time_chained(lambda xv: xv + f_dense(xv, plan) * 1e-9, xk,
                               args.iters)
            rec = {"scale": scale, "edges": g.num_edges, "k": k,
                   "dim": args.dim, "stream": args.stream,
                   "fill": round(float(plan.fill), 3),
                   "window": plan.window, "gb": plan.group_blocks,
                   "dense_ms": round(t_d * 1e3, 2),
                   "dense_gedges": round(g.num_edges / t_d / 1e9, 4)}
            try:   # the measured-negative variant; may also exceed scoped
                # VMEM at default geometry — the dense numbers must survive
                y_c = f_cbsr(vals, pch, plan)
                rec["err_vs_dense"] = float(
                    jnp.max(jnp.abs(y_c - y_d))
                    / (1e-6 + jnp.max(jnp.abs(y_d))))
                t_c = time_chained(
                    lambda v: v + f_cbsr(v, pch, plan)[:, :k] * 1e-9, vals,
                    args.iters)
                rec["cbsr_ms"] = round(t_c * 1e3, 2)
                rec["cbsr_gedges"] = round(g.num_edges / t_c / 1e9, 4)
                rec["cbsr_vs_dense"] = round(t_d / t_c, 3)
            except Exception as exc:
                rec["cbsr_error"] = f"{type(exc).__name__}"[:60]
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
