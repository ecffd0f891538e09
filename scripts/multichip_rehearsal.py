#!/usr/bin/env python
"""Products-scale multi-chip rehearsal (VERDICT r3 #2/#10): everything
buildable without real multi-chip hardware, at REAL ogbn-products scale
(2,449,029 nodes / ~124M directed edges) on the 8-virtual-device CPU mesh:

1. host build of the 8-shard boundary-halo plan (shard_planned_graph),
   timed — the vectorised boundary analysis + per-round send schedule;
2. comm_stats at the canonical (dim=256, k=32) payload: per-round padding
   ratio (target ≤ 1.5× true boundary rows — was 4.8× in r3), exchange
   bytes vs full all_gather, and the compute/comm headroom model
   (scripts/scaling_model.py assumptions inlined);
3. ONE executed sharded training step at full scale over the XLA collective
   path (interpret-mode Pallas cannot execute 124M edges on CPU — the
   Pallas multi-chip path is execution-certified at reduced scale by
   parallel/dryrun.py::run_sweep and compile-certified here);
4. AOT compile (no execution) of the Pallas multi-chip aggregation for
   2/4/8 shards at full scale, with XLA cost analysis per shard count —
   the day real hardware appears this is a rerun, not a build.

  env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/multichip_rehearsal.py --out MULTICHIP_r04.json
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


# measured single-chip stream-kernel rate at products density (RESULTS.md) and
# a conservative per-chip ICI bandwidth — the scaling_model.py assumptions
KERNEL_GEDGES = 0.128
ICI_GBPS = 100.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="MULTICHIP_r05.json")
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--exec_feat", type=int, default=16)
    ap.add_argument("--scale", type=float, default=1.0)
    args = ap.parse_args()

    import jax
    import numpy as np
    from spgemm_gnn_tpu.bench.harness import _cached_powerlaw
    from spgemm_gnn_tpu.graphs.datasets import SYNTH_SPECS
    from spgemm_gnn_tpu.parallel.mesh import make_mesh
    from spgemm_gnn_tpu.parallel.planned_sharded import shard_planned_graph

    assert jax.device_count() >= 8, "needs the 8-virtual-device CPU mesh"
    spec = SYNTH_SPECS["ogbn-products"]
    n = int(spec["n"] * args.scale)
    e = int(spec["e"] * args.scale) // 2
    t0 = time.perf_counter()
    g = _cached_powerlaw(n, e, 0)
    t_graph = time.perf_counter() - t0
    log(f"graph N={g.num_nodes} E={g.num_edges} ({t_graph:.0f}s)")

    out = {"n": g.num_nodes, "e_directed": g.num_edges, "scale": args.scale}

    # 1+2: 8-shard plan build + comm stats (cold, then the r5 disk cache:
    # cached rebuilds are per-job startup cost at real multi-host scale)
    import tempfile
    mesh = make_mesh(8)
    t0 = time.perf_counter()
    spg = shard_planned_graph(g, mesh)
    out["shard_build_s"] = round(time.perf_counter() - t0, 1)
    cache_dir = tempfile.mkdtemp(prefix="shardcache_")
    try:
        t0 = time.perf_counter()
        shard_planned_graph(g, mesh, cache_dir=cache_dir)
        out["shard_build_save_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        shard_planned_graph(g, mesh, cache_dir=cache_dir)
        out["shard_build_cached_s"] = round(time.perf_counter() - t0, 1)
    finally:
        import shutil
        shutil.rmtree(cache_dir, ignore_errors=True)
    log(f"cached rebuild {out['shard_build_cached_s']}s")
    stats = spg.comm_stats(args.dim, k=args.k)
    out["comm_stats_halo_bf16"] = spg.comm_stats(args.dim, k=args.k,
                                                 value_bytes=2)
    kinds = sorted({type(r).__name__ for r in
                    (spg.fwd_local, spg.bwd_local, spg.fwd_halo, spg.bwd_halo)
                    if r is not None})
    out["plan_kinds"] = kinds
    out["halo_round_sizes"] = list(spg.halo_round_sizes)
    out["comm_stats_dim256_k32"] = stats
    # compute/comm headroom (scaling_model.py): per-layer compute per chip vs
    # the CBSR exchange volume per chip over ICI
    comp_ms = g.num_edges / 8 / (KERNEL_GEDGES * 1e9) * 1e3
    comm_ms = stats["exchange_bytes"] / 8 / (ICI_GBPS * 1e9) * 1e3
    out["model_compute_ms_per_chip"] = round(comp_ms, 2)
    out["model_comm_ms_per_chip"] = round(comm_ms, 2)
    out["model_comm_over_compute"] = round(comm_ms / comp_ms, 4)
    log(f"build {out['shard_build_s']}s; padding_ratio "
        f"{stats['padding_ratio']:.2f}; comm/compute "
        f"{out['model_comm_over_compute']:.3f}")

    # 3: one executed sharded training step at full scale (XLA collective path)
    from spgemm_gnn_tpu.parallel.dryrun import run_dryrun
    t0 = time.perf_counter()
    loss = run_dryrun(8, n_nodes=g.num_nodes, n_edges=g.num_edges,
                      feat=args.exec_feat, hidden=32, classes=16, k=8,
                      layers=2, impl="xla", graph=g)
    out["xla_step_executed_s"] = round(time.perf_counter() - t0, 1)
    out["xla_step_loss"] = float(loss)
    log(f"executed XLA 8-shard step at full scale in "
        f"{out['xla_step_executed_s']}s (loss {loss:.4f})")

    # 3b: multi-epoch sharded-vs-single trajectory match with eval +
    # checkpoint + best-val exercised (VERDICT r4 #5), medium scale on the
    # Pallas halo path (interpret-mode on CPU)
    from spgemm_gnn_tpu.parallel.dryrun import run_trajectory_match
    t0 = time.perf_counter()
    out["trajectory_match"] = run_trajectory_match(8)
    out["trajectory_match"]["wall_s"] = round(time.perf_counter() - t0, 1)
    log(f"trajectory match: {out['trajectory_match']}")

    # 4: AOT-compile the Pallas multi-chip aggregation fwd+bwd per shard count
    import jax.numpy as jnp
    from spgemm_gnn_tpu.parallel.planned_sharded import (
        sharded_planned_aggregate)
    compile_rows = []
    for d in (2, 4, 8):
        mesh_d = make_mesh(d)
        t0 = time.perf_counter()
        spg_d = spg if d == 8 else shard_planned_graph(g, mesh_d)
        t_build = time.perf_counter() - t0
        xs = jax.ShapeDtypeStruct((spg_d.padded_nodes, args.dim), jnp.float32,
                                  sharding=spg_d.node_sharding())
        f = jax.jit(lambda xv, s: jax.grad(
            lambda x2: sharded_planned_aggregate(s, x2, "mean",
                                                 k=args.k).sum())(xv))
        t0 = time.perf_counter()
        compiled = f.lower(xs, spg_d).compile()
        row = {"shards": d, "plan_build_s": round(t_build, 1),
               "compile_s": round(time.perf_counter() - t0, 1),
               **{k2: v for k2, v in (compiled.cost_analysis() or {}).items()
                  if k2 in ("flops", "bytes accessed", "transcendentals")},
               **spg_d.comm_stats(args.dim, k=args.k)}
        compile_rows.append(row)
        log(f"compiled fwd+bwd at {d} shards in {row['compile_s']}s")
    out["pallas_compile"] = compile_rows

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
