#!/usr/bin/env python
"""Multi-chip scaling estimate from the measured single-chip kernel rate and
the halo-exchange comm volume (parallel/planned_sharded.py::comm_stats).

Real multi-chip hardware is unavailable in this environment; this is the
compute/comm model the halo design targets (RESULTS.md §multi-chip): per
layer, each shard aggregates its local+halo edges at the measured kernel rate
while the boundary exchange rides ICI; with overlap the step time is
max(compute, comm) (+ the non-overlapped halo kernel tail).

Usage: env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/scaling_model.py
"""
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=232_965)   # Reddit shape
    ap.add_argument("--edges", type=int, default=23_000_000)
    ap.add_argument("--shards", type=int, nargs="*", default=[2, 4, 8])
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--rate_gedges", type=float, default=0.830,
                    help="measured per-chip aggregation rate (bench.py)")
    ap.add_argument("--ici_gbps", type=float, default=100.0,
                    help="per-chip ICI bandwidth budget (v5e class, "
                         "conservative)")
    args = ap.parse_args()

    from spgemm_gnn_tpu.graphs.synthetic import powerlaw_graph
    from spgemm_gnn_tpu.parallel.mesh import make_mesh
    from spgemm_gnn_tpu.parallel.planned_sharded import shard_planned_graph

    g = powerlaw_graph(args.nodes, args.edges // 2, seed=0)
    t1 = g.num_edges / (args.rate_gedges * 1e9)
    print(f"# graph N={g.num_nodes} E={g.num_edges}; single-chip layer "
          f"{t1*1e3:.1f} ms at {args.rate_gedges} Ge/s")
    for d in args.shards:
        if d > len(__import__('jax').devices()):
            print(f"D={d}: needs {d} virtual devices (set "
                  f"XLA_FLAGS=--xla_force_host_platform_device_count={d})")
            continue
        mesh = make_mesh(d)
        spg = shard_planned_graph(g, mesh)
        stats = spg.comm_stats(args.dim, k=args.k)
        t_comp = (g.num_edges / d) / (args.rate_gedges * 1e9)
        # per-device exchange bytes per layer (send+receive counted once:
        # full-duplex ICI)
        bytes_dev = stats["exchange_bytes"] / d
        t_comm = bytes_dev / (args.ici_gbps * 1e9)
        t_layer = max(t_comp, t_comm)
        eff = t1 / (d * t_layer)
        print(f"D={d}: boundary_rows={stats['boundary_rows']} "
              f"exchange={stats['exchange_bytes']/2**20:.1f} MiB/layer "
              f"(vs full gather {stats['full_gather_bytes']/2**20:.1f} MiB, "
              f"ratio {stats['ratio_vs_full_gather']:.2f}); "
              f"compute {t_comp*1e3:.2f} ms, comm {t_comm*1e3:.2f} ms "
              f"-> efficiency {eff*100:.0f}% "
              f"({'comm' if t_comm > t_comp else 'compute'}-bound)")


if __name__ == "__main__":
    main()
