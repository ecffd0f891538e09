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


def _validate_rows(pg_full, g_full, vals_full, ch_full, dim,
                   n_sample: int = 256, seed: int = 0) -> float:
    """Validate the FULL-SIZE timed plan on a row sample (ADVICE r3): max rel
    err of the pallas forward vs an on-the-fly XLA mean-aggregate of the
    sampled rows' in-neighborhoods — O(sample·deg) work, no [E, k] oracle
    buffers, so it runs at any graph size."""
    import jax
    import jax.numpy as jnp
    from spgemm_gnn_tpu.kernels.api import aggregate_cbsr
    from spgemm_gnn_tpu.ops.maxk import cbsr_to_dense
    y = jax.jit(lambda v, c, gr: aggregate_cbsr(
        gr, v, c, dim, "mean", "pallas"))(vals_full, ch_full, pg_full)
    rng = np.random.default_rng(seed)
    rows = np.unique(rng.integers(0, g_full.num_nodes, n_sample))
    indptr = np.asarray(g_full.indptr)
    indices = np.asarray(g_full.indices)
    segs = [indices[indptr[r]:indptr[r + 1]] for r in rows]
    counts = np.array([len(s) for s in segs], np.int64)
    nbr = (np.concatenate(segs) if counts.sum()
           else np.zeros(0, indices.dtype))
    uniq, inv = np.unique(nbr, return_inverse=True)
    if not len(uniq):
        return 0.0
    xs = cbsr_to_dense(jnp.take(vals_full, jnp.asarray(uniq), axis=0),
                       jnp.take(ch_full, jnp.asarray(uniq), axis=0), dim)
    msgs = jnp.take(xs, jnp.asarray(inv), axis=0)
    seg_ids = jnp.asarray(np.repeat(np.arange(len(rows)), counts))
    ref = jax.ops.segment_sum(msgs, seg_ids, num_segments=len(rows))
    ref = ref / jnp.maximum(jnp.asarray(counts, jnp.float32), 1.0)[:, None]
    got = jnp.take(y, jnp.asarray(rows), axis=0)
    return float(jnp.max(jnp.abs(got - ref)) / (1e-6 + jnp.max(jnp.abs(ref))))


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

# The reference's full 24-graph benchmark suite (README.md:72-78 +
# images/24graphs.png) — real sizes. Downloads are impossible here (zero
# egress), so `--graphs corpus24` benches synthetic power-law STAND-INS that
# reproduce each graph's node count and average degree, the two regime
# parameters the kernels are sensitive to. Graphs above the caps are scaled
# uniformly (degree preserved; `scale` recorded per row): the XLA baseline's
# O(E·dim) buffers and the host tunnel bound benchable size.
CORPUS_24_REF = {
    "am": (881_680, 5_668_682),
    "amazon0505": (410_236, 4_878_874),
    "amazon0601": (403_394, 5_478_357),
    "artist": (50_515, 1_638_396),
    "citation": (2_927_963, 30_387_995),
    "collab": (235_868, 2_358_104),
    "com-amazon": (334_863, 1_851_744),
    "DD": (334_925, 1_686_092),
    "ddi": (4_267, 2_135_822),
    "Flickr": (89_250, 989_006),
    "ogbn-arxiv": (169_343, 1_166_243),
    "ogbn-products": (2_449_029, 123_718_280),
    "ogbn-proteins": (132_534, 79_122_504),
    "OVCAR-8H": (1_889_542, 3_946_402),
    "ppa": (576_289, 42_463_862),
    "PROTEINS_full": (43_466, 162_088),
    "pubmed": (19_717, 99_203),
    "ppi": (56_944, 818_716),
    "Reddit": (232_965, 114_615_891),
    "SW-620H": (1_888_584, 3_944_206),
    "TWITTER-Partial": (580_768, 1_435_116),
    "Yeast": (1_710_902, 3_636_546),
    "Yelp": (716_847, 13_954_819),
    "youtube": (1_138_499, 5_980_886),
}
CORPUS24_EDGE_CAP = 4_200_000
CORPUS24_NODE_CAP = 500_000
# the Pallas side holds full-size graphs (proven at 112.7M-edge Reddit,
# RESULTS.md) — these caps exist only as an HBM guard for --pallas-full
PALLAS_EDGE_CAP = 130_000_000
PALLAS_NODE_CAP = 3_000_000


def corpus24_standin(name: str, *, edge_cap: int | None = None,
                     node_cap: int | None = None) -> tuple[int, int, float]:
    """(nodes, edges, scale) of the bench stand-in for a 24-suite graph."""
    n, e = CORPUS_24_REF[name]
    s = min(1.0, (edge_cap or CORPUS24_EDGE_CAP) / e,
            (node_cap or CORPUS24_NODE_CAP) / n)
    return max(int(n * s), 4_096), int(e * s), s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", nargs="*", default=["synth-mid-dense"],
                    help=f"graph names: {list(SYNTH_CORPUS)}, 'sweep' (the "
                         f"8-regime corpus), 'corpus24' (stand-ins for the "
                         f"reference's 24-graph suite), or dataset names")
    ap.add_argument("--k", nargs="*", type=int, default=[8, 16, 32, 64])
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--impls", nargs="*", default=["xla", "pallas"])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--data_path", default="./data")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--validate", action="store_true",
                    help="check pallas vs xla allclose before timing")
    ap.add_argument("--json", action="store_true", help="JSON-lines output")
    ap.add_argument("--generator", default="powerlaw",
                    choices=["powerlaw", "sbm", "rmat"],
                    help="synthetic family for corpus stand-ins: sbm/rmat "
                         "carry latent community structure (VERDICT r4 #2)")
    ap.add_argument("--stream", default="f32", choices=["f32", "bf16x2"],
                    help="Pallas feature-stream precision (f32 default for "
                         "exact oracle comparisons)")
    ap.add_argument("--pallas-full", action="store_true",
                    help="corpus24: bench the PALLAS side at each graph's "
                         "real size (HBM guard caps only); the XLA baseline "
                         "and the validation row stay at the standin caps "
                         "and compare per-edge (VERDICT r2 #2)")
    ap.add_argument("--chain", type=int, default=1,
                    help="apply the aggregation N times inside ONE jitted "
                         "dispatch (both impls — fair). A 4-layer model runs "
                         "8 aggregation directions per jitted train step, so "
                         "chain>1 reflects what a small dispatch-bound graph "
                         "(pubmed: 99K edges) actually pays per aggregation "
                         "in situ; rates are still per-application")
    ap.add_argument("--op", default="spgemm",
                    choices=["spgemm", "maxk", "cbsr"],
                    help="spgemm: aggregation pair; maxk: the standalone "
                         "top-k kernel (the reference's maxk_kernel_test "
                         "second build, README.md:113-131); cbsr: the "
                         "compaction kernel emitting (values, channels) — "
                         "the maxk_kernel sp_data/sp_index emission role")
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

    if args.op == "cbsr":
        from spgemm_gnn_tpu.kernels.maxk_pallas import cbsr_compact_pallas
        from spgemm_gnn_tpu.ops.maxk import (
            cbsr_from_masked, cbsr_to_dense, maxk)
        n, dim = (200_000, args.dim) if not args.cpu else (2_000, args.dim)
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.standard_normal((n, dim), dtype=np.float32))
        for k in args.k:
            row = {"op": "cbsr", "n": n, "dim": dim, "k": k}
            x = jax.jit(lambda xv, _k=k: maxk(xv, _k))(x0)
            f_p = jax.jit(lambda xv, _k=k: cbsr_compact_pallas(xv, _k))
            f_x = jax.jit(lambda xv, _k=k: cbsr_from_masked(xv, _k))
            if args.validate:
                (vp, cp), (vx, cx) = f_p(x), f_x(x)
                err = float(jnp.max(jnp.abs(
                    cbsr_to_dense(vp, cp, dim) - cbsr_to_dense(vx, cx, dim))))
                row["err"] = err
            # zero-preserving chain: a multiplicative perturbation keeps the
            # masked sparsity pattern (≤ k nonzeros/row) intact across timed
            # iterations — an additive chain would densify the input from
            # iteration 2 and break the compaction precondition (ADVICE r2)
            t_p = time_chained(lambda xv: xv * (1 + f_p(xv)[0].sum() * 1e-9),
                               x, args.iters)
            t_x = time_chained(lambda xv: xv * (1 + f_x(xv)[0].sum() * 1e-9),
                               x, args.iters)
            row["pallas_ms"] = round(t_p * 1e3, 3)
            row["xla_ms"] = round(t_x * 1e3, 3)
            row["speedup"] = round(t_x / t_p, 2)
            print(json.dumps(row) if args.json else
                  f"cbsr k={k:3d}  pallas {t_p*1e3:7.2f}ms  "
                  f"xla {t_x*1e3:7.2f}ms  ({t_x/t_p:.2f}x)", flush=True)
        return

    if args.graphs == ["sweep"]:
        args.graphs = CORPUS_SWEEP
    elif args.graphs == ["corpus24"]:
        args.graphs = list(CORPUS_24_REF)
    import os
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_cache")
    def run_graph(gname):
        meta = {}
        g_full = None                  # --pallas-full: real-size pallas graph
        from spgemm_gnn_tpu.bench.harness import _cached_graph
        gen = args.generator
        if gname in SYNTH_CORPUS:
            n, e = SYNTH_CORPUS[gname]
            g = _cached_graph(gen, n, e // 2, 0)
            meta = {"generator": gen}
        elif gname in CORPUS_24_REF:
            n, e, s = corpus24_standin(gname)
            g = _cached_graph(gen, n, e // 2, 0)
            meta = {"ref_nodes": CORPUS_24_REF[gname][0],
                    "ref_edges": CORPUS_24_REF[gname][1],
                    "scale": round(s, 4), "generator": gen}
            if args.pallas_full:
                nf, ef, sf = corpus24_standin(
                    gname, edge_cap=PALLAS_EDGE_CAP, node_cap=PALLAS_NODE_CAP)
                meta["pallas_scale"] = round(sf, 4)
                if (nf, ef) != (n, e):
                    g_full = _cached_graph(gen, nf, ef // 2, 0)
        else:
            from spgemm_gnn_tpu.graphs.datasets import load_dataset
            g = load_dataset(gname, args.data_path).graph
        pg = plan_graph(g, cache_dir=cache_dir)
        pg_full = plan_graph(g_full, cache_dir=cache_dir) \
            if g_full is not None else None
        eg = None
        if "ell" in args.impls:
            from spgemm_gnn_tpu.ops.ell import ell_graph
            eg = ell_graph(g)
        # inputs are generated ON DEVICE — host RNG + transfer through the
        # ~MB/s tunnel would dominate full-size rows (bench/harness.py)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (g.num_nodes, args.dim), jnp.float32)
        ct = jax.random.normal(jax.random.fold_in(key, 1),
                               (g.num_nodes, args.dim), jnp.float32)
        ct_full = None
        if g_full is not None:
            ct_full = jax.random.normal(jax.random.fold_in(key, 1),
                                        (g_full.num_nodes, args.dim),
                                        jnp.float32)
        header = (f"# {gname}: N={g.num_nodes} E={g.num_edges} "
                  f"avg_deg={g.num_edges/g.num_nodes:.1f} "
                  f"fill={pg.fwd_plan.fill:.2f} RW={pg.fwd_plan.window}"
                  + (f" full: N={g_full.num_nodes} E={g_full.num_edges}"
                     if g_full is not None else ""))
        print(header, file=sys.stderr, flush=True)

        for k in args.k:
            vals, ch = maxk_cbsr(x, k)
            vals_full = ch_full = None
            if g_full is not None:
                # the dense [N_full, dim] f32 source is 3 GB at citation
                # scale — regenerate it per k and free it before timing so
                # only the [N_full, k] CBSR arrays stay resident
                x_full = jax.random.normal(key, (g_full.num_nodes, args.dim),
                                           jnp.float32)
                vals_full, ch_full = maxk_cbsr(x_full, k)
                vals_full.block_until_ready()
                del x_full
            row = {"graph": gname, "k": k, "dim": args.dim,
                   "edges": g.num_edges, **meta}
            for impl in args.impls:
                graph = {"pallas": pg, "ell": eg}.get(impl, g)
                # pallas times at the real size when --pallas-full built one;
                # validation stays at the standin size (the XLA oracle's own
                # [E, k] buffers are why the standin caps exist)
                t_graph, t_vals, t_ch, t_ct, t_edges = (
                    graph, vals, ch, ct, g.num_edges)
                if impl == "pallas" and pg_full is not None:
                    t_graph, t_vals, t_ch, t_ct, t_edges = (
                        pg_full, vals_full, ch_full, ct_full,
                        g_full.num_edges)
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
                    if (args.validate and impl == "pallas"
                            and pg_full is not None):
                        # the timed full-size plan must be validated TOO
                        # (ADVICE r3): a geometry bug only manifest at full
                        # scale would otherwise ride the headline. Sampled
                        # rows vs an on-the-fly XLA gather on those rows —
                        # O(sample·deg) work, no [E, k] oracle buffers.
                        row["pallas_full_err"] = round(_validate_rows(
                            pg_full, g_full, vals_full, ch_full, args.dim),
                            6)

                    if args.chain > 1:
                        # N applications inside ONE jitted dispatch (see
                        # --chain help); per-application time reported
                        def fchain(v, c, gr, _k=k):
                            for _ in range(args.chain):
                                v = v + aggregate_cbsr(
                                    gr, v, c, args.dim, "mean",
                                    impl)[:, :_k] * 1e-9
                            return v
                        jf = jax.jit(fchain)

                        def fstep(v, _g=t_graph, _c=t_ch):
                            return jf(v, _c, _g)
                    else:
                        def fstep(v, _f=fwd, _g=t_graph, _c=t_ch, _k=k):
                            return v + _f(v, _c, _g)[:, :_k] * 1e-9

                    t_f = time_chained(fstep, t_vals, args.iters) / args.chain

                    grad_once = jax.grad(lambda v, c, gr, co: (
                        aggregate_cbsr(gr, v, c, args.dim, "mean", impl)
                        * co).sum())
                    if args.chain > 1:
                        def bchain(v, c, gr, co):
                            for _ in range(args.chain):
                                v = v + grad_once(v, c, gr, co) * 1e-9
                            return v
                        jb = jax.jit(bchain)

                        def bstep(v, _g=t_graph, _c=t_ch, _co=t_ct):
                            return jb(v, _c, _g, _co)
                    else:
                        bwd = jax.jit(grad_once)

                        def bstep(v, _b=bwd, _g=t_graph, _c=t_ch, _co=t_ct):
                            return v + _b(v, _c, _g, _co) * 1e-9

                    t_b = time_chained(bstep, t_vals, args.iters) / args.chain
                    row[f"{impl}_fwd_ms"] = round(t_f * 1e3, 3)
                    row[f"{impl}_bwd_ms"] = round(t_b * 1e3, 3)
                    row[f"{impl}_edges"] = t_edges
                    row[f"{impl}_gedges"] = round(
                        2 * t_edges / (t_f + t_b) / 1e9, 4)
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
                    note = (" (per-edge, mixed sizes)"
                            if pg_full is not None else "")
                    parts.append(
                        f"speedup "
                        f"{row['pallas_gedges']/max(row['xla_gedges'],1e-9):.2f}x"
                        f"{note}")
                print("  ".join(parts), flush=True)

    import gc
    for gname in args.graphs:
        try:
            run_graph(gname)
        except Exception as exc:   # one graph must not end the sweep
            print(json.dumps({"graph": gname, "error":
                              f"{type(exc).__name__}: {exc}"[:160]}),
                  flush=True)
        finally:
            # jitted lambdas churn the executable cache and pin device
            # buffers; 24 full-size graphs OOM the chip without this
            jax.clear_caches()
            gc.collect()

if __name__ == "__main__":
    main()
