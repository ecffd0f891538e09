#!/usr/bin/env python
"""Kernel benchmark CLI — the reference's standalone `maxk_kernel_test` harness
(kernels/main.cu, README.md:97-131): sweep k × implementations over a graph
corpus, validate against the XLA oracle, and print timings.

Usage:
  python kernel_bench.py                       # default synthetic corpus
  python kernel_bench.py --graphs reddit yelp  # real graphs (npz in --data_path)
  python kernel_bench.py --k 8 16 32 64 --dim 256 --impls xla pallas
  python kernel_bench.py --cpu                 # interpret-mode smoke
"""
import argparse
import json
import sys
import time

import numpy as np

# synthetic corpus approximating the reference's 24-graph suite regimes
# (SURVEY.md §6: 4.3K–2.45M nodes, 99K–124M edges; README.md:72-78): average
# degree spans 5–492, sizes bounded so host→device transfer through the
# tunnel stays benchable. deg ≲ 40 graphs exercise the stream-plan kernel,
# denser ones the windowed kernel.
SYNTH_CORPUS = {
    "synth-tiny-dense": (4_300, 430_000),          # 24-graph low end, deg 100
    "synth-deg5": (400_000, 2_000_000),
    "synth-mid-sparse": (200_000, 2_000_000),      # deg 10
    "synth-flickr-like": (89_250, 1_960_000),      # deg ~22 (flickr shape)
    "synth-products-like": (60_000, 3_000_000),    # deg 50 (products density)
    "synth-mid-dense": (60_000, 6_000_000),        # deg 100
    "synth-deg200": (15_000, 3_000_000),
    "synth-reddit-density": (8_000, 3_936_000),    # deg 492 (reddit density)
    "synth-small-dense": (10_000, 1_000_000),      # legacy name, deg 100
    "synth-reddit-like": (232_965, 25_000_000),    # legacy large run
}

# the default sweep: 8 regimes spanning avg degree 5 → 492
CORPUS_SWEEP = ["synth-tiny-dense", "synth-deg5", "synth-mid-sparse",
                "synth-flickr-like", "synth-products-like", "synth-mid-dense",
                "synth-deg200", "synth-reddit-density"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", nargs="*", default=["synth-mid-dense"],
                    help=f"graph names: {list(SYNTH_CORPUS)}, 'sweep' (the "
                         f"8-regime corpus), or dataset names")
    ap.add_argument("--k", nargs="*", type=int, default=[8, 16, 32, 64])
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--impls", nargs="*", default=["xla", "pallas"])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--data_path", default="./data")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--validate", action="store_true",
                    help="check pallas vs xla allclose before timing")
    ap.add_argument("--json", action="store_true", help="JSON-lines output")
    ap.add_argument("--stream", default="f32", choices=["f32", "bf16x2"],
                    help="Pallas feature-stream precision (f32 default for "
                         "exact oracle comparisons)")
    ap.add_argument("--op", default="spgemm", choices=["spgemm", "maxk"],
                    help="spgemm: aggregation pair; maxk: the standalone "
                         "top-k kernel (the reference's maxk_kernel_test "
                         "second build, README.md:113-131)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        args.graphs = ["synth-tiny"]
        SYNTH_CORPUS["synth-tiny"] = (2_000, 20_000)

    import jax
    import jax.numpy as jnp
    from spgemm_gnn_tpu.bench.harness import time_chained
    from spgemm_gnn_tpu.kernels.api import aggregate_cbsr
    from spgemm_gnn_tpu.kernels import planned
    from spgemm_gnn_tpu.kernels.planned import plan_graph
    from spgemm_gnn_tpu.ops.maxk import maxk_cbsr

    planned.DEFAULT_STREAM = args.stream
    print(f"# devices: {jax.devices()} stream={args.stream}",
          file=sys.stderr, flush=True)

    if args.op == "maxk":
        from spgemm_gnn_tpu.kernels.maxk_pallas import maxk_pallas
        from spgemm_gnn_tpu.ops.maxk import maxk
        n, dim = (200_000, args.dim) if not args.cpu else (2_000, args.dim)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((n, dim), dtype=np.float32))
        for k in args.k:
            row = {"op": "maxk", "n": n, "dim": dim, "k": k}
            f_p = jax.jit(lambda xv, _k=k: maxk_pallas(xv, _k))
            f_x = jax.jit(lambda xv, _k=k: maxk(xv, _k))
            if args.validate:
                err = float(jnp.max(jnp.abs(f_p(x) - f_x(x))))
                row["err"] = err
            t_p = time_chained(lambda xv: xv + f_p(xv) * 1e-9, x, args.iters)
            t_x = time_chained(lambda xv: xv + f_x(xv) * 1e-9, x, args.iters)
            row["pallas_ms"] = round(t_p * 1e3, 3)
            row["xla_topk_ms"] = round(t_x * 1e3, 3)
            row["speedup"] = round(t_x / t_p, 2)
            print(json.dumps(row) if args.json else
                  f"maxk k={k:3d}  pallas {t_p*1e3:7.2f}ms  "
                  f"xla-topk {t_x*1e3:7.2f}ms  ({t_x/t_p:.2f}x)", flush=True)
        return

    if args.graphs == ["sweep"]:
        args.graphs = CORPUS_SWEEP
    import os
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_cache")
    for gname in args.graphs:
        if gname in SYNTH_CORPUS:
            n, e = SYNTH_CORPUS[gname]
            from spgemm_gnn_tpu.bench.harness import _cached_powerlaw
            g = _cached_powerlaw(n, e // 2, 0)
        else:
            from spgemm_gnn_tpu.graphs.datasets import load_dataset
            g = load_dataset(gname, args.data_path).graph
        pg = plan_graph(g, cache_dir=cache_dir)
        eg = None
        if "ell" in args.impls:
            from spgemm_gnn_tpu.ops.ell import ell_graph
            eg = ell_graph(g)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((g.num_nodes, args.dim),
                                            dtype=np.float32))
        ct = jnp.asarray(rng.standard_normal((g.num_nodes, args.dim),
                                             dtype=np.float32))
        header = (f"# {gname}: N={g.num_nodes} E={g.num_edges} "
                  f"avg_deg={g.num_edges/g.num_nodes:.1f} "
                  f"fill={pg.fwd_plan.fill:.2f} RW={pg.fwd_plan.window}")
        print(header, file=sys.stderr, flush=True)

        for k in args.k:
            vals, ch = maxk_cbsr(x, k)
            row = {"graph": gname, "k": k, "dim": args.dim,
                   "edges": g.num_edges}
            for impl in args.impls:
                graph = {"pallas": pg, "ell": eg}.get(impl, g)
                try:
                    fwd = jax.jit(lambda v, c, gr: aggregate_cbsr(
                        gr, v, c, args.dim, "mean", impl))
                    if args.validate and impl != "xla":
                        y = fwd(vals, ch, graph)
                        y0 = jax.jit(lambda v, c, gr: aggregate_cbsr(
                            gr, v, c, args.dim, "mean", "xla"))(vals, ch, g)
                        err = float(jnp.max(jnp.abs(y - y0)) /
                                    (1e-6 + jnp.max(jnp.abs(y0))))
                        row[f"{impl}_err"] = round(err, 6)

                    def fstep(v, _f=fwd, _g=graph):
                        return v + _f(v, ch, _g)[:, :k] * 1e-9

                    t_f = time_chained(fstep, vals, args.iters)

                    bwd = jax.jit(jax.grad(lambda v, c, gr, co: (
                        aggregate_cbsr(gr, v, c, args.dim, "mean", impl)
                        * co).sum()))

                    def bstep(v, _b=bwd, _g=graph):
                        return v + _b(v, ch, _g, ct) * 1e-9

                    t_b = time_chained(bstep, vals, args.iters)
                    row[f"{impl}_fwd_ms"] = round(t_f * 1e3, 3)
                    row[f"{impl}_bwd_ms"] = round(t_b * 1e3, 3)
                    row[f"{impl}_gedges"] = round(
                        2 * g.num_edges / (t_f + t_b) / 1e9, 4)
                except Exception as exc:
                    row[f"{impl}_error"] = f"{type(exc).__name__}: {exc}"[:120]
            if args.json:
                print(json.dumps(row), flush=True)
            else:
                parts = [f"k={k:3d}"]
                for impl in args.impls:
                    if f"{impl}_fwd_ms" in row:
                        parts.append(
                            f"{impl}: fwd {row[f'{impl}_fwd_ms']:8.2f}ms "
                            f"bwd {row[f'{impl}_bwd_ms']:8.2f}ms "
                            f"({row[f'{impl}_gedges']:.3f} Ge/s)")
                    else:
                        parts.append(f"{impl}: ERROR")
                if "pallas_gedges" in row and "xla_gedges" in row:
                    parts.append(
                        f"speedup {row['pallas_gedges']/max(row['xla_gedges'],1e-9):.2f}x")
                print("  ".join(parts), flush=True)


if __name__ == "__main__":
    main()
