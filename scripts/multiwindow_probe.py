#!/usr/bin/env python
"""A/B probe: span-class multiwindow dispatch vs single-window one-hot
scatter in the windowed Pallas kernel (VERDICT r3 #1 — the full-Reddit λ
collapse). Runs the model-level aggregation pair per scale and appends JSONL
rows to --out.

Run (ONE TPU process at a time, background, generous timeout):
  timeout 1800 env PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/multiwindow_probe.py --scales medium full
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", nargs="+", default=["medium", "full"])
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--stream", default="bf16x2", choices=["f32", "bf16x2"])
    ap.add_argument("--out", default="/tmp/multiwindow_probe.jsonl")
    ap.add_argument("--modes", default="base,pipeline",
                    help="comma list: base | skip | branch | pipeline "
                         "(first mode is the comparison baseline)")
    args = ap.parse_args()

    from bench import SCALES
    import jax
    from spgemm_gnn_tpu.bench import harness
    from spgemm_gnn_tpu.kernels import planned

    planned.DEFAULT_STREAM = args.stream
    log(f"devices: {jax.devices()} stream={args.stream}")

    for scale in args.scales:
        n, e = SCALES[scale]
        t0 = time.perf_counter()
        g, pg, xk, ct = harness._bench_inputs(n, e, args.dim, args.k, 0, None)
        log(f"[{scale}] inputs in {time.perf_counter()-t0:.0f}s; "
            f"plan={type(pg.fwd_plan).__name__} RW={pg.fwd_plan.window} "
            f"B={getattr(pg.fwd_plan, 'src_block', '-')} "
            f"fill={pg.fwd_plan.fill:.3f} E={g.num_edges}")
        rows = []
        modes = [m.strip() for m in args.modes.split(",") if m.strip()]
        for mode in modes:
            planned.MULTIWINDOW = mode == "branch"
            planned.SKIP_EMPTY = mode in ("skip", "branch")
            planned.PIPELINE = mode == "pipeline"
            t0 = time.perf_counter()
            r = harness.bench_impl(g, pg, xk, ct, args.dim, args.k,
                                   "mean", "pallas", args.iters)
            hm = 2.0 / (1 / r["fwd_gedges"] + 1 / r["bwd_gedges"])
            row = {"scale": scale, "mode": mode, "stream": args.stream,
                   "k": args.k, "dim": args.dim,
                   "window": pg.fwd_plan.window,
                   "fill": round(pg.fwd_plan.fill, 4),
                   "hmean_gedges": round(hm, 4),
                   **{k2: round(v, 6) for k2, v in r.items()},
                   "bench_s": round(time.perf_counter() - t0, 1)}
            rows.append(row)
            log(json.dumps(row))
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")
        if len(rows) > 1 and rows[0]["hmean_gedges"] > 0:
            log(f"[{scale}] " + "  ".join(
                f"{r['mode']}: "
                f"{r['hmean_gedges'] / rows[0]['hmean_gedges']:.3f}x"
                for r in rows[1:]))
    planned.MULTIWINDOW = False
    planned.SKIP_EMPTY = False
    planned.PIPELINE = True


if __name__ == "__main__":
    main()
