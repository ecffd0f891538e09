#!/usr/bin/env python
"""Windowed-kernel cost attribution: time planned_spmm with one per-chunk
term ablated at a time (timing-only variants, WRONG OUTPUT — see
spgemm_pallas._spmm_kernel debug_variant). The full-graph regime's per-chunk
cost fits 30ns·slabs + 0.35ns·RW + 23ns (PLANTUNE_FULL_r04) but the RW term's
owner (one-hot build vs window RMW vs dot issue) is not identifiable from
geometry sweeps alone — this probe separates them.

  timeout 1800 env PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/kernel_ablate.py --scale full
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = ("plain", "no_gather", "cheap_onehot", "no_dot", "static_rmw",
            "no_rmw", "floor")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="full")
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--stream", default="bf16x2")
    ap.add_argument("--out", default="/tmp/kernel_ablate.jsonl")
    ap.add_argument("--variants", nargs="*", default=None)
    args = ap.parse_args()

    from bench import SCALES
    import jax
    import jax.numpy as jnp
    from spgemm_gnn_tpu.bench import harness
    from spgemm_gnn_tpu.kernels.spgemm_pallas import planned_spmm

    log(f"devices: {jax.devices()}")
    n, e = SCALES[args.scale]
    g, pg, xk, ct = harness._bench_inputs(n, e, args.dim, args.k, 0, None)
    plan = pg.fwd_plan
    log(f"[{args.scale}] plan RW={plan.window} B={plan.src_block} "
        f"fill={plan.fill:.3f} tiles={plan.num_tiles}")
    pad = plan.padded_src - xk.shape[0]
    xt0 = jnp.pad(xk.T, ((0, 0), (0, pad)))

    base_ns = None
    for variant in (args.variants or VARIANTS):
        fn = jax.jit(lambda xt, p, _v=variant: planned_spmm(
            p, xt, stream=args.stream, debug_variant=None
            if _v == "plain" else _v))

        def step(xt, _f=fn, _p=plan):
            y = _f(xt, _p)
            return xt + y[0, 0].astype(xt.dtype) * 1e-20

        t = harness.time_chained(step, xt0, args.iters)
        chunks = plan.num_tiles * plan.tile_slots // 128
        ns_chunk = t / chunks * 1e9
        row = {"scale": args.scale, "variant": variant, "stream": args.stream,
               "window": plan.window, "src_block": plan.src_block,
               "fill": round(plan.fill, 4), "fwd_s": round(t, 6),
               "ns_per_chunk": round(ns_chunk, 1)}
        if variant == "plain":
            base_ns = ns_chunk
        elif base_ns:
            row["delta_ns_vs_plain"] = round(ns_chunk - base_ns, 1)
        log(json.dumps(row))
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
