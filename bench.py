#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Measures the MaxK CBSR aggregation pair (Pallas SpGEMM forward + SSpMM
backward) on a Reddit-shaped synthetic power-law graph at k=32, dim=256, and
reports throughput in edges/s plus the effective message bandwidth against the
measured v5e rooflines (docs/DESIGN.md §Roofline). `vs_baseline` is the
speedup over the XLA gather/segment-sum baseline on the same device — the
cuSPARSE-role comparison the reference uses for its headline numbers
(README.md:136).

Usage: python bench.py [--scale small|medium|full] [--cpu] [--iters N]
       [--stream f32|bf16x2] [--validate]
Progress goes to stderr; the single JSON line is the only stdout output.

Watchdog: each phase (device claim / input build / pallas / baseline) has its
own budget; on a stall the most recent successful measurement is emitted with
an explicit `"stale": true` marker (never silently).
"""
import argparse
import json
import os
import signal
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


SCALES = {
    # nodes, edges (directed, pre-symmetrise target)
    "micro": (2_000, 20_000),         # interpret-mode smoke only
    "tiny": (20_000, 400_000),
    "small": (60_000, 3_000_000),
    # eighth-Reddit nodes at full Reddit average degree (~492): kernel
    # behaviour tracks density (edges per row/src-block), not raw edge count,
    # and the tunnel's ~1 MB/s host→device transfer bounds total bench time
    "medium": (29_121, 14_325_000),
    "large": (58_241, 28_650_000),    # quarter-Reddit nodes, full degree
    "full": (232_965, 114_000_000),   # Reddit-scale
    # products-regime density: the stream-kernel path (avg degree ~25)
    "sparse": (200_000, 5_000_000),
    # the ELL-tie regime (deg 100) and products density (deg 50) — probe
    # scales for the CBSR-edge-gather / beat-ELL work (VERDICT r2 #4/#5)
    "mid-dense": (60_000, 6_000_000),
    "deg50": (60_000, 3_000_000),
}

# measured v5e rooflines (docs/DESIGN.md): streaming elementwise HBM BW and
# the dynamic-gather BW the message stage is bound by
ROOFLINE_ELEMENTWISE_GBPS = 199.0
ROOFLINE_GATHER_GBPS = 116.0

# measured pure-MXU time of the kernel's per-chunk one-hot + message dots at
# dim 256 bf16x2 (KERNEL_ABLATE_r04.jsonl term-by-term ablation; the ~99 ns
# measured floor adds the un-removable slab/issue overhead) — `mxu_util`
# reports achieved per-chunk time against this dot bound so "near structural
# optimum" is a number in the artifact (VERDICT r4 #7)
MXU_DOT_NS_PER_CHUNK = 62.5


def _plan_chunks(plan) -> int:
    """Total 128-slot chunks one kernel pass executes (incl. padding)."""
    from spgemm_gnn_tpu.graphs.stream_tiles import StreamPlan
    from spgemm_gnn_tpu.graphs.tiles import MultiTilePlan
    if isinstance(plan, MultiTilePlan):
        return sum(_plan_chunks(p) for p in plan.plans)
    if isinstance(plan, StreamPlan):
        return plan.num_groups * plan.group_tiles * plan.tile_slots // 128
    return plan.num_tiles * plan.tile_slots // 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="medium", choices=list(SCALES))
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (interpret-mode pallas) — smoke only")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--stream", default="bf16x2", choices=["f32", "bf16x2"],
                    help="Pallas feature-stream precision (bf16x2 default — "
                         "the reference's own matmuls run TF32)")
    ap.add_argument("--validate", action="store_true",
                    help="on-device numerics check (pallas vs XLA oracle, "
                         "bf16x2 vs f32) written to .bench_cache/validate_*")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        args.scale = "micro"   # interpret-mode pallas: smoke only

    metric = f"maxk_spgemm_aggregation_{args.scale}_k{args.k}"
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_cache")
    result_cache = os.path.join(cache_dir, f"{metric}.json")

    res = {}
    state = {"phase": "claim"}

    def emit(result):
        print(json.dumps(result), flush=True)

    def rate(r):
        return 2.0 / (1.0 / r["fwd_gedges"] + 1.0 / r["bwd_gedges"])

    def _bail(signum, frame):
        log(f"watchdog: stalled in phase '{state['phase']}'")
        if "pallas" in res:
            # the headline number IS fresh — only the baseline is missing
            out = {"metric": metric, "value": round(rate(res["pallas"]), 4),
                   "unit": "Gedges/s", "vs_baseline": 0.0,
                   "baseline_stale": True}
            if os.path.exists(result_cache):
                with open(result_cache) as f:
                    prev = json.load(f)
                if prev.get("value"):
                    out["vs_baseline"] = round(
                        out["value"] / prev["value"] * prev["vs_baseline"], 3)
            emit(out)
        elif os.path.exists(result_cache):
            with open(result_cache) as f:
                cached = json.load(f)
            recorded = cached.pop("_recorded", "earlier")
            # machine-distinguishable stale marker: consumers must be able to
            # tell a cached fallback from a fresh measurement
            cached["stale"] = True
            cached["recorded"] = recorded
            log(f"watchdog: emitting last successful measurement from "
                f"{result_cache} (recorded {recorded})")
            emit(cached)
        else:
            emit({"metric": metric, "value": 0.0, "unit": "Gedges/s",
                  "vs_baseline": 0.0})
            log("watchdog: no cached measurement exists")
        sys.exit(2)

    signal.signal(signal.SIGALRM, _bail)

    def phase(name, budget):
        state["phase"] = name
        signal.alarm(budget)
        log(f"phase: {name} (budget {budget}s)")

    class _PhaseStall(Exception):
        pass

    def run_with_retry(name, budget, attempts, fn):
        """Run fn() under a per-attempt watchdog that RAISES instead of
        bailing, so transient tunnel stalls get retried (the graph/plan build
        is disk-cached — a retry mostly redoes the host→device transfer,
        the known stall point; VERDICT r3 weak #1). The final attempt runs
        under the emit-cached-fallback handler so a persistent stall still
        produces an artifact."""
        def _raise(signum, frame):
            raise _PhaseStall(name)
        for att in range(attempts - 1):
            state["phase"] = f"{name}-try{att}"
            signal.signal(signal.SIGALRM, _raise)
            signal.alarm(budget)
            log(f"phase: {name} attempt {att + 1}/{attempts} "
                f"(budget {budget}s)")
            try:
                out = fn()
                signal.alarm(0)
                return out
            except _PhaseStall:
                log(f"{name}: stalled after {budget}s; retrying")
            finally:
                signal.alarm(0)
                signal.signal(signal.SIGALRM, _bail)
        phase(name, budget)
        return fn()

    phase("claim", 300)    # device claim can take minutes after unclean exits
    import jax
    t0 = time.perf_counter()
    log(f"devices: {jax.devices()} ({time.perf_counter()-t0:.0f}s)")
    n, e = SCALES[args.scale]

    from spgemm_gnn_tpu.bench import harness
    from spgemm_gnn_tpu.kernels import planned
    planned.DEFAULT_STREAM = args.stream
    log(f"pallas feature stream: {args.stream}")

    # phase budgets scale with edge count past the medium scale (the full
    # 114M-edge graph moves ~8x the device payload and first-compiles at new
    # shapes); medium keeps the tuned 300/200 s budgets exactly
    bf = max(1, min(6, e // 20_000_000 + 1))
    t0 = time.perf_counter()

    def build_inputs():
        out = harness._bench_inputs(n, e, args.dim, args.k, 0, None)
        # pre-stage: force every device transfer (plan arrays + features) to
        # COMPLETE inside this guarded phase, so later phases never stall on
        # a lazy transfer
        jax.block_until_ready(jax.tree_util.tree_leaves((out[1], out[2],
                                                         out[3])))
        return out

    g, pg, xk, ct = run_with_retry("inputs", 300 * bf, 3, build_inputs)
    kind = type(pg.fwd_plan).__name__
    log(f"graph N={g.num_nodes} E={g.num_edges} plan={kind} "
        f"fill={pg.fwd_plan.fill:.2f} RW={pg.fwd_plan.window} "
        f"({time.perf_counter()-t0:.0f}s)")

    if args.validate:
        phase("validate", 240)
        try:
            if g.num_edges > harness.XLA_BASELINE_EDGE_CAP:
                # the XLA-oracle backward materialises an [E, k] gather that
                # lane-pads to [E, 128] — 57 GB at the full scale. Validate
                # the same kernel code on a subsampled graph instead (same
                # cap + rationale as the xla baseline phase below).
                vscale = harness.XLA_BASELINE_EDGE_CAP / e
                vin = harness._bench_inputs(
                    max(int(n * vscale), 1024), harness.XLA_BASELINE_EDGE_CAP,
                    args.dim, args.k, 0, None)
                val = harness.validate_numerics(*vin, args.dim, args.k)
                val["subsampled_edges"] = int(vin[0].num_edges)
            else:
                val = harness.validate_numerics(g, pg, xk, ct,
                                                args.dim, args.k)
            vpath = os.path.join(cache_dir, f"validate_{metric}.json")
            os.makedirs(cache_dir, exist_ok=True)
            with open(vpath, "w") as f:
                json.dump(val, f, indent=1)
            log(f"validate: {val} -> {vpath}")
        except Exception as exc:   # never let validation kill the headline —
            # but record the failure so the emitted artifact shows validation
            # did not complete (ADVICE r2: a log line alone can masquerade as
            # a validated run)
            log(f"validate failed ({type(exc).__name__}: {exc})")
            res["validate_error"] = f"{type(exc).__name__}: {exc}"

    phase("pallas", 200 * min(bf, 3))
    try:  # pallas first: its number must survive a baseline failure
        res["pallas"] = harness.bench_impl(g, pg, xk, ct, args.dim, args.k,
                                           "mean", "pallas", args.iters)
        log(f"pallas: {res['pallas']}")
    except Exception as exc:
        log(f"pallas bench failed ({type(exc).__name__}: {exc})")

    # both baselines are linear-in-E formulations; above the cap they run on
    # a subsampled same-structure graph and report per-edge rates. The build
    # itself stays inside a try: the measured pallas headline must survive
    # ANY baseline failure, including this one.
    phase("baseline-inputs", 300)
    base_in = None
    try:
        if g.num_edges > harness.XLA_BASELINE_EDGE_CAP:
            scale = harness.XLA_BASELINE_EDGE_CAP / e
            base_in = harness._bench_inputs(
                max(int(n * scale), 1024), harness.XLA_BASELINE_EDGE_CAP,
                args.dim, args.k, 0, None)
            log(f"baselines on subsampled graph E={base_in[0].num_edges} "
                f"(linear-in-E formulations; reporting per-edge rates)")
        else:
            base_in = (g, pg, xk, ct)
    except Exception as exc:
        log(f"baseline input build failed ({type(exc).__name__}: {exc})")

    if base_in is not None:
        phase("xla", 200)
        try:
            res["xla"] = harness.bench_impl(*base_in, args.dim, args.k,
                                            "mean", "xla", args.iters)
            log(f"xla: {res['xla']}")
        except Exception as exc:
            log(f"xla bench failed ({type(exc).__name__}: {exc})")

        phase("ell", 240)
        try:   # the repo's own strongest baseline (GNNAdvisor role) — the
            # honest margin VERDICT r2 weak #1 asks for next to vs-XLA
            from spgemm_gnn_tpu.ops.ell import ell_graph
            eg = ell_graph(base_in[0])
            res["ell"] = harness.bench_impl(*base_in, args.dim, args.k,
                                            "mean", "ell", args.iters,
                                            graph_override=eg)
            log(f"ell: {res['ell']}")
        except Exception as exc:
            log(f"ell bench failed ({type(exc).__name__}: {exc})")

    signal.alarm(0)
    log(f"bench done in {time.perf_counter()-t0:.1f}s")

    if "pallas" in res:
        eps = rate(res["pallas"])
        vs = eps / rate(res["xla"]) if "xla" in res else 0.0
    elif "xla" in res:
        eps, vs = rate(res["xla"]), 1.0
    else:
        eps, vs = 0.0, 0.0

    # effective message bandwidth vs the measured gather roofline: the kernel
    # moves E·dim·bytes of messages through VMEM per pass (bf16x2 = 2 B/lane)
    stream_bytes = 2 if args.stream == "bf16x2" else 4
    msg_gbps = eps * 1e9 * args.dim * stream_bytes / 1e9
    log(f"message bandwidth: {msg_gbps:.0f} GB/s "
        f"(gather roofline {ROOFLINE_GATHER_GBPS:.0f} GB/s, elementwise "
        f"{ROOFLINE_ELEMENTWISE_GBPS:.0f} GB/s)")

    result = {"metric": metric, "value": round(eps, 4), "unit": "Gedges/s",
              "vs_baseline": round(vs, 3), "stream": args.stream,
              "msg_gbps": round(msg_gbps, 1),
              "roofline_gather_gbps": ROOFLINE_GATHER_GBPS}
    # MXU utilization: dot-bound time over achieved time, per direction
    # (the fwd/bwd plans can differ in chunk count on directed graphs).
    # Emitted ONLY at the calibrated config — the 62.5 ns/chunk bound was
    # measured at dim 256 / bf16x2 (KERNEL_ABLATE_r04) and would be silently
    # wrong for other dims/streams (code review r5).
    if "pallas" in res and args.dim == 256 and args.stream == "bf16x2":
        utils = []
        for d, plan in (("fwd_s", pg.fwd_plan), ("bwd_s", pg.bwd_plan)):
            t = res["pallas"].get(d)
            if t:
                utils.append(_plan_chunks(plan) * MXU_DOT_NS_PER_CHUNK * 1e-9
                             / t)
        if utils:
            result["mxu_util"] = round(sum(utils) / len(utils), 4)
    if "pallas" in res and "ell" in res:
        result["vs_ell"] = round(rate(res["pallas"]) / rate(res["ell"]), 3)
    if "validate_error" in res:
        result["validate_error"] = res["validate_error"]
    if eps > 0:
        try:   # remember for the stall-watchdog fallback of future runs
            os.makedirs(cache_dir, exist_ok=True)
            with open(result_cache, "w") as f:
                json.dump({**result, "_recorded": time.strftime("%F %T")}, f)
        except OSError:
            pass
    emit(result)


if __name__ == "__main__":
    main()
