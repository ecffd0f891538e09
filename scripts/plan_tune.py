#!/usr/bin/env python
"""Plan-geometry autotune probe: measure the windowed-kernel aggregation pair
across (src_block, window, tile_slots) on one graph regime and report how far
the model-based auto choice (graphs/tiles.py::auto_window) sits from the
measured best (VERDICT r1 #9 acceptance: auto within 10% of hand-tuned).

Usage (TPU): env PYTHONPATH=/root/repo:/root/.axon_site \\
    python scripts/plan_tune.py --regime reddit-density --stream bf16x2
Prints one JSON line per config; graphs/plans ride the .bench_cache.
"""
import argparse
import json
import sys

REGIMES = {
    # n_nodes, n_edges (matching kernel_bench SYNTH_CORPUS / bench.py SCALES
    # so the .bench_cache graph files are shared)
    "reddit-density": (8_000, 3_936_000),
    "deg200": (15_000, 3_000_000),
    "mid-dense": (60_000, 6_000_000),
    "medium": (29_121, 14_325_000),
    "full": (232_965, 114_000_000),   # Reddit scale (bench.py --scale full)
}

CONFIGS = [
    ("auto", {}),               # auto_src_block + auto_window
    ("w8", {"window": 8}),
    ("w16", {"window": 16}),
    ("w32", {"window": 32}),
    ("w64", {"window": 64}),
    ("w128", {"window": 128}),
    ("b128", {"src_block": 128}),
    ("b256", {"src_block": 256}),
    ("b512", {"src_block": 512}),
    ("b512-w8", {"src_block": 512, "window": 8}),
    # full-graph regime: λ = deg·B/N collapses at large N, so the auto window
    # grows to 256 and every RW-proportional kernel term (one-hot scatter
    # matmul, window RMW, one-hot build) dominates — large B trades cheap
    # slab-gather passes for a small window (VERDICT r3 #1 calibration)
    ("b1024", {"src_block": 1024}),
    ("b2048", {"src_block": 2048}),
    # per-density window classes (graphs/tiles.py::build_tile_plan_classes):
    # disjoint bucket partitions, one branch-free kernel launch per class
    ("classes", {"kind": "windowed_classes"}),
    ("classes-b128", {"kind": "windowed_classes", "src_block": 128}),
    ("classes-b512", {"kind": "windowed_classes", "src_block": 512}),
    ("s512", {"tile_slots": 512}),
    ("s2048", {"tile_slots": 2048}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--regime", default="reddit-density",
                    choices=list(REGIMES))
    ap.add_argument("--stream", default="bf16x2", choices=["f32", "bf16x2"])
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--configs", nargs="*", default=None,
                    help="subset of config names to run")
    args = ap.parse_args()

    import jax
    from spgemm_gnn_tpu.bench.harness import bench_aggregation
    from spgemm_gnn_tpu.kernels import planned
    planned.DEFAULT_STREAM = args.stream
    print(f"# devices: {jax.devices()} stream={args.stream} "
          f"regime={args.regime}", file=sys.stderr, flush=True)

    n, e = REGIMES[args.regime]
    names = args.configs or [c[0] for c in CONFIGS]
    best = None
    for name, kw in CONFIGS:
        if name not in names:
            continue
        # force the windowed plan kind: geometry tuning is about the windowed
        # kernel (stream plans have their own auto_stream_window)
        r = bench_aggregation(n, e, args.dim, args.k, impls=("pallas",),
                              plan_kw={"kind": "windowed", **kw},
                              iters=args.iters)   # kw's own "kind" wins
        p = r["pallas"]
        h = 2.0 / (1.0 / p["fwd_gedges"] + 1.0 / p["bwd_gedges"])
        row = {"regime": args.regime, "config": name, **kw,
               "fill": round(r["fwd_fill"], 3),
               "fwd_gedges": round(p["fwd_gedges"], 4),
               "bwd_gedges": round(p["bwd_gedges"], 4),
               "hmean_gedges": round(h, 4)}
        print(json.dumps(row), flush=True)
        if best is None or h > best[1]:
            best = (name, h)
    if best:
        print(f"# best: {best[0]} at {best[1]:.4f} Ge/s", file=sys.stderr,
              flush=True)


if __name__ == "__main__":
    main()
