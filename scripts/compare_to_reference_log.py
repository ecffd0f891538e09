#!/usr/bin/env python
"""Accuracy-parity check against the reference's golden training logs.

The reference repo ships per-run logs with the full config echo and per-epoch
accuracies (`/root/reference/log/<dataset>_seed97/<model>_<nonlinear>.txt` —
the de-facto regression record, SURVEY.md §4). This script parses one of those
logs and a run of this framework (`results.json` written by train.py, or a
second reference-format log) and reports the best-test-accuracy delta against
a tolerance (BASELINE.json: accuracy within seed noise, ±0.5%).

Usage:
  python scripts/compare_to_reference_log.py \\
      --reference /root/reference/log/flickr_seed97/sage_relu.txt \\
      --run run/flickr/results.json [--tolerance 0.005]

Exit code 0 iff |Δ best test| ≤ tolerance. (Real-dataset runs require the
npz files — scripts/convert_to_npz.py; this harness is the comparison half,
ready for wherever the data exists.)
"""
import argparse
import json
import re
import sys


def parse_reference_log(path: str) -> dict:
    """Best val/test accuracy + config from a reference-format log."""
    cfg = {}
    best_val = best_test = None
    final_test = None
    epochs = 0
    line_re = re.compile(
        r"Best val\. Accuracy (\d+\.\d+) \| Best test Accuracy (\d+\.\d+)")
    with open(path, errors="replace") as f:
        for line in f:
            if "=" in line and ":" not in line and len(line) < 80:
                k, _, v = line.strip().partition("=")
                if k.isupper():
                    cfg[k.lower()] = v
            m = line_re.search(line)
            if m:
                best_val, best_test = float(m.group(1)), float(m.group(2))
                epochs += 1
            m = re.search(r"Test accuracy ([0-9.]+)", line)
            if m:
                final_test = float(m.group(1))
    if best_test is None and final_test is None:
        raise ValueError(f"no accuracy lines found in {path}")
    return {"config": cfg, "best_val": best_val,
            "best_test": best_test if best_test is not None else final_test,
            "final_test": final_test, "epochs_logged": epochs}


def parse_run(path: str) -> dict:
    """Best accuracies from a train.py results.json or a reference-style log."""
    if path.endswith(".json"):
        with open(path) as f:
            r = json.load(f)
        return {"best_val": r.get("best_val_accuracy"),
                "best_test": r.get("best_test_accuracy")}
    return parse_reference_log(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", required=True,
                    help="reference golden log (.txt)")
    ap.add_argument("--run", required=True,
                    help="this framework's results.json (or a second log)")
    ap.add_argument("--tolerance", type=float, default=0.005,
                    help="max |Δ best test accuracy| (BASELINE.json: ±0.5%%)")
    args = ap.parse_args()

    ref = parse_reference_log(args.reference)
    run = parse_run(args.run)
    delta = run["best_test"] - ref["best_test"]
    out = {
        "reference": args.reference,
        "reference_best_test": ref["best_test"],
        "reference_config": {k: ref["config"][k] for k in
                             ("dataset", "model", "nonlinear", "maxk",
                              "hidden_dim", "hidden_layers", "seed")
                             if k in ref["config"]},
        "run": args.run,
        "run_best_test": run["best_test"],
        "delta": round(delta, 6),
        "tolerance": args.tolerance,
        "pass": abs(delta) <= args.tolerance,
    }
    print(json.dumps(out, indent=2))
    sys.exit(0 if out["pass"] else 1)


if __name__ == "__main__":
    main()
