"""Phase profile of the explicit-CBSR aggregate pair (VERDICT r2 #4):
where does the mid-dense k=32 path lose to ELL? Times each stage alone —
densify_transpose, planned_spmm on pre-densified input, sample_channels —
plus the composed fwd/bwd for pallas and ell.

  timeout 1800 env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/explicit_profile.py --scale mid-dense --k 32
"""
from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="mid-dense")
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--stream", default="f32", choices=["f32", "bf16x2"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import SCALES
    from spgemm_gnn_tpu.bench.harness import _cached_powerlaw, time_chained
    from spgemm_gnn_tpu.kernels import planned
    from spgemm_gnn_tpu.kernels.api import aggregate_cbsr
    from spgemm_gnn_tpu.kernels.planned import plan_graph
    from spgemm_gnn_tpu.kernels.spgemm_pallas import (
        densify_transpose, planned_spmm, sample_channels)
    from spgemm_gnn_tpu.ops.ell import ell_graph
    from spgemm_gnn_tpu.ops.maxk import maxk, cbsr_from_masked

    planned.DEFAULT_STREAM = args.stream
    n_nodes, n_edges = SCALES[args.scale]
    g = _cached_powerlaw(n_nodes, n_edges // 2, 0)
    pg = plan_graph(g, cache_dir=None)
    eg = ell_graph(g)
    interp = jax.default_backend() != "tpu"
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (g.num_nodes, args.dim), jnp.float32)
    xk = maxk(x0, args.k)
    vals, ch = cbsr_from_masked(xk, args.k)
    ct = jax.random.normal(jax.random.fold_in(key, 1),
                           (g.num_nodes, args.dim), jnp.float32)
    plan = pg.fwd_plan
    rec = {"scale": args.scale, "edges": g.num_edges, "k": args.k,
           "dim": args.dim, "stream": args.stream,
           "plan_kind": type(plan).__name__, "fill": round(float(plan.fill), 3)}

    # --- stages (windowed plans only: densify_transpose/padded_src are the
    # TilePlan pipeline; StreamPlan scales skip straight to the composed
    # pairs). Plan/channel arrays ride as jit ARGUMENTS (CLAUDE.md: closures
    # embed as HLO constants and overflow the remote-compile payload).
    if type(plan).__name__ == "TilePlan":
        f_dens = jax.jit(lambda v, c: densify_transpose(
            v, c, args.dim, plan.padded_src, interpret=interp))
        xt = f_dens(vals, ch)
        rec["densify_ms"] = round(time_chained(
            lambda v: v * (1 + f_dens(v, ch)[0, 0] * 1e-9), vals,
            args.iters) * 1e3, 2)

        f_kern = jax.jit(lambda t, p: planned_spmm(
            p, t, stream=args.stream, interpret=interp))
        rec["kernel_ms"] = round(time_chained(
            lambda t: t * (1 + f_kern(t, plan)[0, 0] * 1e-9), xt,
            args.iters) * 1e3, 2)

        z = jnp.ones((g.num_nodes, args.dim), jnp.float32)
        f_samp = jax.jit(lambda zz, c: sample_channels(zz, c,
                                                       interpret=interp))
        rec["sample_ms"] = round(time_chained(
            lambda zz: zz * (1 + f_samp(zz, ch)[0, 0] * 1e-9), z,
            args.iters) * 1e3, 2)

    # --- composed pairs -------------------------------------------------
    for impl, graph in (("pallas", pg), ("ell", eg)):
        fwd = jax.jit(lambda v, gr: aggregate_cbsr(
            gr, v, ch, args.dim, "mean", impl))
        bwd = jax.jit(jax.grad(lambda v, gr, co: (
            aggregate_cbsr(gr, v, ch, args.dim, "mean", impl) * co).sum()))
        t_f = time_chained(lambda v, _f=fwd, _g=graph:
                           v + _f(v, _g)[:, :args.k] * 1e-9, vals, args.iters)
        t_b = time_chained(lambda v, _b=bwd, _g=graph:
                           v + _b(v, _g, ct) * 1e-9, vals, args.iters)
        rec[f"{impl}_fwd_ms"] = round(t_f * 1e3, 2)
        rec[f"{impl}_bwd_ms"] = round(t_b * 1e3, 2)
        rec[f"{impl}_gedges"] = round(2 * g.num_edges / (t_f + t_b) / 1e9, 4)
    rec["pallas_vs_ell"] = round(rec["pallas_gedges"] / rec["ell_gedges"], 3)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
