#!/usr/bin/env python
"""Result plotting — the reference's spgemm_plot.py role (bar chart of SpGEMM
improvement per dataset, /root/reference/spgemm_plot.py:1-132), generalised to
read real benchmark JSON instead of hardcoded numbers.

Usage:
  python scripts/plot_results.py --bench BENCH_r1.json [BENCH_r2.json ...] \
      --out plots/bench.png
  python scripts/plot_results.py --results run/*/results.json --out plots/acc.png
"""
import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", nargs="*", default=[],
                    help="bench JSON lines ({metric, value, unit, vs_baseline})")
    ap.add_argument("--results", nargs="*", default=[],
                    help="training results.json files")
    ap.add_argument("--out", default="plots/results.png")
    args = ap.parse_args()

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; printing tables instead")
        plt = None

    rows = []
    for path in args.bench:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    d = json.loads(line)
                    rows.append((os.path.basename(path), d))
    acc = []
    for path in args.results:
        with open(path) as f:
            d = json.load(f)
        acc.append((os.path.basename(os.path.dirname(path)) or path, d))

    if plt is None:
        for name, d in rows:
            print(f"{name}: {d['metric']} = {d['value']} {d['unit']} "
                  f"({d['vs_baseline']}x vs baseline)")
        for name, d in acc:
            best = d.get("best_test_accuracy", d.get("test_acc"))
            best_s = f"{best:.4f}" if best is not None else "n/a"
            print(f"{name}: best test {best_s} "
                  f"in {d.get('wall_time_s', 0):.0f}s")
        return

    nplots = (1 if rows else 0) + (1 if acc else 0)
    if not nplots:
        print("nothing to plot"); return
    fig, axes = plt.subplots(1, nplots, figsize=(6 * nplots, 4))
    if nplots == 1:
        axes = [axes]
    i = 0
    if rows:
        ax = axes[i]; i += 1
        labels = [d["metric"] for _, d in rows]
        ax.bar(range(len(rows)), [d["vs_baseline"] for _, d in rows],
               color="#4C72B0")
        ax.axhline(1.0, color="gray", ls="--", lw=1)
        ax.set_xticks(range(len(rows)))
        ax.set_xticklabels(labels, rotation=30, ha="right", fontsize=8)
        ax.set_ylabel("speedup vs XLA baseline")
        ax.set_title("MaxK SpGEMM/SSpMM aggregation")
    if acc:
        ax = axes[i]
        labels = [n for n, _ in acc]
        vals = [d.get("best_test_accuracy", d.get("test_acc", 0.0)) or 0.0
                for _, d in acc]
        ax.bar(range(len(acc)), vals, color="#55A868")
        ax.set_xticks(range(len(acc)))
        ax.set_xticklabels(labels, rotation=30, ha="right", fontsize=8)
        ax.set_ylabel("best test accuracy")
        ax.set_title("end-to-end training")
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
