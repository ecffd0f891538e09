"""Relabeling A/B (VERDICT r2 #3): plan quality and, on TPU, measured Ge/s
for each locality order vs the original labeling.

Host-only (plan geometry):   python scripts/relabel_probe.py --scale large
On the chip (measured rates):
  timeout 1800 env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/relabel_probe.py --scale full --measure

Prints one JSON line per order with plan fill / tiles / window, and with
--measure the chained fwd/bwd Ge/s of the model fast path (the same numbers
bench.py reports).
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
    ap.add_argument("--scale", default="large")
    ap.add_argument("--orders", nargs="*",
                    default=["none", "degree", "degree-bfs", "rcm"])
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--measure", action="store_true",
                    help="time the kernels on the claimed device")
    ap.add_argument("--generator", default="powerlaw",
                    choices=["powerlaw", "sbm", "rmat"],
                    help="graph family: clustered sbm/rmat carry the LATENT "
                         "locality real graphs have and uniform power-law "
                         "provably lacks (VERDICT r4 #2)")
    ap.add_argument("--p_in", type=float, default=0.7,
                    help="sbm intra-community edge probability")
    ap.add_argument("--communities", type=int, default=64)
    ap.add_argument("--window", type=int, default=None,
                    help="override plan window: locality recovered by a "
                         "relabel only pays through a SMALLER window at "
                         "sustained fill — auto geometry reads global stats")
    ap.add_argument("--src_block", type=int, default=None)
    ap.add_argument("--kind", default="auto",
                    choices=["auto", "windowed", "stream",
                             "windowed_classes"])
    args = ap.parse_args()

    from bench import SCALES
    from spgemm_gnn_tpu.bench.harness import _cached_graph, bench_impl
    from spgemm_gnn_tpu.graphs.relabel import relabel_graph
    from spgemm_gnn_tpu.kernels.planned import plan_graph

    n_nodes, n_edges = SCALES[args.scale]
    genkw = (dict(p_in=args.p_in, communities=args.communities)
             if args.generator == "sbm" else {})
    g0 = _cached_graph(args.generator, n_nodes, n_edges // 2, 0, **genkw)

    for order in args.orders:
        t0 = time.time()
        if order == "none":
            g, perm = g0, None
        else:
            g, perm = relabel_graph(g0, order)
        t_rel = time.time() - t0
        t0 = time.time()
        plan_kw = {"kind": args.kind}
        if args.window:
            plan_kw["window"] = args.window
        if args.src_block:
            plan_kw["src_block"] = args.src_block
        pg = plan_graph(g, cache_dir=None, **plan_kw)
        t_plan = time.time() - t0
        p = pg.fwd_plan
        rec = {"order": order, "scale": args.scale,
               "generator": args.generator,
               "num_edges": g.num_edges, "plan_kind": type(p).__name__,
               "fill": round(float(p.fill), 4),
               "relabel_s": round(t_rel, 2), "plan_s": round(t_plan, 2)}
        if type(p).__name__ == "TilePlan":
            rec.update(window=p.window, src_block=p.src_block,
                       tiles=p.num_tiles)
        if args.measure:
            import jax
            import jax.numpy as jnp
            from spgemm_gnn_tpu.ops.maxk import maxk
            key = jax.random.PRNGKey(0)
            x0 = jax.random.normal(key, (g.num_nodes, args.dim), jnp.float32)
            xk = maxk(x0, args.k)
            ct = jax.random.normal(jax.random.fold_in(key, 1),
                                   (g.num_nodes, args.dim), jnp.float32)
            from spgemm_gnn_tpu.kernels import planned
            planned.DEFAULT_STREAM = "bf16x2"
            r = bench_impl(g, pg, xk, ct, args.dim, args.k, "mean", "pallas",
                           iters=args.iters)
            rec.update(fwd_gedges=round(r["fwd_gedges"], 4),
                       bwd_gedges=round(r["bwd_gedges"], 4),
                       hmean_gedges=round(
                           2 / (1 / r["fwd_gedges"] + 1 / r["bwd_gedges"]), 4))
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
