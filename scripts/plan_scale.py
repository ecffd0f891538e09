#!/usr/bin/env python
"""Plan-build cost at production scale (host-side only, no device needed).

The reference amortises its warp-partition preprocessing once per graph
(`kernels/generate_meta.py`, SURVEY.md §2.1); our equivalent is the TilePlan /
StreamPlan build (native C++ fast path, graphs/native.py) plus the disk cache
(graphs/plan_cache.py). This script measures both at a chosen scale — default
ogbn-products (2.45M nodes / ~124M directed edges, the largest training
graph, BASELINE.md §Graph corpus) — so training-startup cost is a recorded
number, not a guess (round-1 VERDICT weak #7).

Usage: python scripts/plan_scale.py [--nodes N] [--edges E] [--cache DIR]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--nodes", type=int, default=2_449_029)
    ap.add_argument("--edges", type=int, default=62_000_000,
                    help="pre-symmetrisation samples (~2x after)")
    ap.add_argument("--cache", default="/tmp/plan_scale_cache")
    ap.add_argument("--out", default=None, help="write a JSON line here too")
    args = ap.parse_args(argv)

    from spgemm_gnn_tpu.graphs.synthetic import powerlaw_graph
    from spgemm_gnn_tpu.kernels.planned import plan_graph

    t0 = time.perf_counter()
    g = powerlaw_graph(args.nodes, args.edges, seed=7)
    t_gen = time.perf_counter() - t0
    print(f"graph: N={g.num_nodes:,} E={g.num_edges:,} "
          f"(gen {t_gen:.1f}s)", flush=True)

    os.makedirs(args.cache, exist_ok=True)
    t0 = time.perf_counter()
    pg = plan_graph(g, cache_dir=args.cache)
    t_build = time.perf_counter() - t0
    kind = type(pg.fwd_plan).__name__
    print(f"cold plan build (fwd{'+bwd' if not g.symmetric else ', bwd aliased'}"
          f", {kind}, native+cache write): {t_build:.1f}s", flush=True)

    t0 = time.perf_counter()
    plan_graph(g, cache_dir=args.cache)
    t_warm = time.perf_counter() - t0
    print(f"warm plan build (disk-cache hit): {t_warm:.2f}s", flush=True)

    row = {"nodes": g.num_nodes, "edges": g.num_edges, "plan_kind": kind,
           "gen_s": round(t_gen, 1), "cold_build_s": round(t_build, 1),
           "warm_build_s": round(t_warm, 2)}
    print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(row, f)


if __name__ == "__main__":
    main()
