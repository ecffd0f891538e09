#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures the MaxK CBSR aggregation pair (Pallas SpGEMM forward + SSpMM
backward) on a Reddit-shaped synthetic power-law graph at k=32, dim=256, and
reports throughput in edges/s. `vs_baseline` is the speedup over the XLA
gather/segment-sum baseline on the same device — the cuSPARSE-role comparison
the reference uses for its headline numbers (README.md:136).

Usage: python bench.py [--scale small|medium|full] [--cpu] [--iters N]
Progress goes to stderr; the single JSON line is the only stdout output.
"""
import argparse
import json
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


SCALES = {
    # nodes, edges (directed, pre-symmetrise target)
    "micro": (2_000, 20_000),         # interpret-mode smoke only
    "tiny": (20_000, 400_000),
    "small": (60_000, 3_000_000),
    "medium": (232_965, 30_000_000),
    "full": (232_965, 114_000_000),   # Reddit-scale
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="medium", choices=list(SCALES))
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (interpret-mode pallas) — smoke only")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--dim", type=int, default=256)
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        args.scale = "micro"   # interpret-mode pallas: smoke only

    import jax
    log(f"devices: {jax.devices()}")
    n, e = SCALES[args.scale]

    from spgemm_gnn_tpu.bench.harness import bench_aggregation

    t0 = time.perf_counter()
    try:
        res = bench_aggregation(n, e, args.dim, args.k,
                                impls=["xla", "pallas"], iters=args.iters)
    except Exception as exc:  # pallas not viable → baseline-only fallback
        log(f"pallas bench failed ({type(exc).__name__}: {exc}); "
            f"falling back to xla only")
        try:
            res = bench_aggregation(n, e, args.dim, args.k, impls=["xla"],
                                    iters=args.iters)
        except Exception as exc2:
            log(f"xla bench failed too ({type(exc2).__name__}: {exc2})")
            print(json.dumps({
                "metric": f"maxk_spgemm_aggregation_{args.scale}_k{args.k}",
                "value": 0.0, "unit": "Gedges/s", "vs_baseline": 0.0,
            }), flush=True)
            return
    log(f"bench done in {time.perf_counter()-t0:.1f}s: {res}")

    xla = res["xla"]
    xla_eps = 2.0 / (1.0 / xla["fwd_gedges"] + 1.0 / xla["bwd_gedges"])
    if "pallas" in res:
        pal = res["pallas"]
        eps = 2.0 / (1.0 / pal["fwd_gedges"] + 1.0 / pal["bwd_gedges"])
        vs = eps / xla_eps
    else:
        eps, vs = xla_eps, 1.0

    print(json.dumps({
        "metric": f"maxk_spgemm_aggregation_{args.scale}_k{args.k}",
        "value": round(eps, 4),
        "unit": "Gedges/s",
        "vs_baseline": round(vs, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
