#!/usr/bin/env python
"""Environment diagnostics — the reference's troubleshoot.py role (7-point
environment check, SURVEY.md §2.2) for the TPU stack.

Usage: python scripts/diagnose.py [--cpu]
"""
import argparse
import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHECKS = []


def check(name):
    def deco(fn):
        CHECKS.append((name, fn))
        return fn
    return deco


@check("python")
def _py():
    return f"{sys.version.split()[0]} ok"


@check("core deps")
def _deps():
    out = []
    for m in ("jax", "jaxlib", "flax", "optax", "numpy"):
        mod = importlib.import_module(m)
        out.append(f"{m}={getattr(mod, '__version__', '?')}")
    return " ".join(out)


@check("optional deps")
def _opt():
    out = []
    for m in ("orbax.checkpoint", "torch", "matplotlib"):
        try:
            importlib.import_module(m)
            out.append(f"{m}:yes")
        except ImportError:
            out.append(f"{m}:no")
    return " ".join(out)


@check("jax devices")
def _dev():
    import jax
    ds = jax.devices()
    return f"{len(ds)} × {ds[0].device_kind} (backend={jax.default_backend()})"


@check("native graphcore")
def _native():
    from spgemm_gnn_tpu.graphs import native
    return "built+loadable" if native.available() else "unavailable (numpy fallback active)"


@check("package imports")
def _pkg():
    import spgemm_gnn_tpu
    from spgemm_gnn_tpu import graphs, ops, kernels, models, train, parallel  # noqa
    return f"spgemm_gnn_tpu {spgemm_gnn_tpu.__version__}"


@check("smoke compute")
def _smoke():
    import jax.numpy as jnp
    import numpy as np
    from spgemm_gnn_tpu.graphs.synthetic import random_graph
    from spgemm_gnn_tpu.ops.spmm import spmm
    from spgemm_gnn_tpu.ops.maxk import maxk
    g = random_graph(64, 256, seed=0)
    x = jnp.ones((64, 8))
    y = spmm(g, maxk(x, 4), "mean")
    assert np.isfinite(np.asarray(y)).all()
    return "maxk+spmm finite ok"


@check("file structure")
def _files():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    need = ["train.py", "bench.py", "__graft_entry__.py",
            "spgemm_gnn_tpu", "tests", "native/graphcore.cpp"]
    missing = [f for f in need if not os.path.exists(os.path.join(root, f))]
    return "complete" if not missing else f"MISSING: {missing}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    failures = 0
    for name, fn in CHECKS:
        try:
            print(f"[ok ] {name}: {fn()}")
        except Exception as exc:
            failures += 1
            print(f"[FAIL] {name}: {type(exc).__name__}: {exc}")
    print(f"\n{len(CHECKS) - failures}/{len(CHECKS)} checks passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
