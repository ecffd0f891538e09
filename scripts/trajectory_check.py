#!/usr/bin/env python
"""Cross-device training-trajectory check: TPU Pallas path vs the CPU XLA
oracle, full per-epoch history.

The CPU test suite already proves xla-vs-pallas trajectory parity in
interpreter mode (tests/test_train.py); this script produces the REAL-HARDWARE
counterpart — the class of bug it exists to catch is on-device numerics that
interpret mode cannot see (e.g. the r1 bf16x2 denormal-flush hazard,
ADVICE.md). It is the trajectory-level analogue of the reference's golden
training logs (`/root/reference/log/<dataset>_seed97/*.txt`, the de-facto
regression record — SURVEY.md §4).

Usage (two processes — the TPU registration is process-wide):
  # on the TPU (axon default env):
  python scripts/trajectory_check.py run --impl pallas --stream bf16x2 \
      --out /tmp/traj_tpu.json
  # CPU oracle:
  env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
      python scripts/trajectory_check.py run --impl xla --out /tmp/traj_cpu.json
  # compare + write the artifact:
  python scripts/trajectory_check.py compare /tmp/traj_cpu.json \
      /tmp/traj_tpu.json --out TRAJ_r02.json
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(args) -> None:
    from spgemm_gnn_tpu.train.config import from_args
    from spgemm_gnn_tpu.train.loop import Trainer
    import jax
    if args.matmul:
        jax.config.update("jax_default_matmul_precision", args.matmul)

    cfg = from_args([
        "--dataset", args.dataset, "--synthetic",
        "--synthetic_scale", str(args.scale),
        "--model", "sage", "--nonlinear", "maxk", "--maxk", "32",
        "--hidden_layers", str(args.hidden_layers),
        "--hidden_dim", str(args.hidden_dim), "--norm",
        "--epochs", str(args.epochs), "--eval_every", "1",
        "--dropout", "0.0",               # determinism across backends
        "--seed", str(args.seed),
        "--impl", args.impl, "--stream", args.stream,
        "--path", "/tmp/traj_run",
    ])
    trainer = Trainer(cfg)
    results = trainer.run()
    out = {
        "backend": jax.default_backend(),
        "dataset": args.dataset,
        "impl": args.impl,
        "stream": args.stream,
        "epochs": args.epochs,
        "scale": args.scale,
        "seed": args.seed,
        "matmul": args.matmul,
        "history": [vars(r) for r in results["history"]],
        "best_test_accuracy": results["best_test_accuracy"],
    }
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"wrote {args.out}: final loss "
          f"{out['history'][-1]['loss']:.6f}, best test "
          f"{out['best_test_accuracy']:.4f}")


def compare(args) -> None:
    a = json.load(open(args.a))
    b = json.load(open(args.b))
    ha, hb = a["history"], b["history"]
    n = min(len(ha), len(hb))
    if n == 0:
        # an empty history means one run produced nothing to compare — fail
        # loudly with an artifact instead of an IndexError (ADVICE r2)
        artifact = {"pass": False,
                    "error": f"empty history (len a={len(ha)}, b={len(hb)})"}
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
        sys.exit(f"FAIL: empty trajectory history -> {args.out}")
    rows, max_rel = [], 0.0
    for ra, rb in zip(ha[:n], hb[:n]):
        rel = abs(ra["loss"] - rb["loss"]) / max(abs(ra["loss"]), 1e-12)
        max_rel = max(max_rel, rel)
        rows.append({"epoch": ra["epoch"], "loss_a": ra["loss"],
                     "loss_b": rb["loss"], "rel": round(rel, 6)})
    acc_delta = abs(a["best_test_accuracy"] - b["best_test_accuracy"])
    # Gate on (1) the first-epoch loss — computed before any optimizer chaos,
    # this bounds the per-step numerical error of the device/kernel path —
    # and (2) final accuracy parity (the reference's cross-seed spread is the
    # yardstick, BASELINE.md). Later-epoch drift is REPORTED, not gated:
    # trajectories of chaotic SGD amplify any float non-associativity, on any
    # two devices.
    ok = rows[0]["rel"] <= args.tol and acc_delta <= args.acc_tol
    artifact = {
        "a": {k: a[k] for k in ("backend", "impl", "stream")},
        "b": {k: b[k] for k in ("backend", "impl", "stream")},
        "epochs_compared": n,
        "first_epoch_loss_rel_diff": rows[0]["rel"],
        "max_loss_rel_diff": max_rel,
        "best_test_acc": [a["best_test_accuracy"], b["best_test_accuracy"]],
        "acc_delta": acc_delta,
        "first_epoch_tol": args.tol, "acc_tol": args.acc_tol,
        "pass": ok,
        "per_epoch": rows,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"{'PASS' if ok else 'FAIL'}: first-epoch loss rel-diff "
          f"{rows[0]['rel']:.2e} (tol {args.tol}), best-test delta "
          f"{acc_delta:.4f} (tol {args.acc_tol}); max drift over {n} epochs "
          f"{max_rel:.2e} (informational) -> {args.out}")
    if not ok:
        sys.exit(1)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("run")
    r.add_argument("--impl", default="pallas")
    r.add_argument("--dataset", default="reddit",
                   help="reddit (CE/accuracy) or yelp (BCE/micro-F1 — the "
                        "multilabel trajectory gate, VERDICT r3 #6)")
    r.add_argument("--hidden_dim", type=int, default=256)
    r.add_argument("--hidden_layers", type=int, default=3)
    r.add_argument("--stream", default="bf16x2", choices=["f32", "bf16x2"])
    r.add_argument("--epochs", type=int, default=40)
    r.add_argument("--scale", type=float, default=0.02)
    r.add_argument("--seed", type=int, default=97)
    r.add_argument("--matmul", default=None,
                   choices=["default", "high", "highest"],
                   help="jax default matmul precision — 'highest' isolates "
                        "kernel numerics from the Dense layers' MXU bf16 "
                        "truncation (the 2e-6-class gate)")
    r.add_argument("--out", required=True)
    c = sub.add_parser("compare")
    c.add_argument("a")
    c.add_argument("b")
    c.add_argument("--out", required=True)
    c.add_argument("--tol", type=float, default=1e-3,
                   help="max FIRST-epoch relative loss difference (pre-chaos "
                        "per-step numerical error bound)")
    c.add_argument("--acc_tol", type=float, default=0.02)
    args = ap.parse_args(argv)
    if args.cmd == "run":
        run(args)
    else:
        compare(args)


if __name__ == "__main__":
    main()
