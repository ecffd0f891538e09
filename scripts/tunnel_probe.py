"""Probe the axon TPU claim + tunnel bandwidth before a big run.

The remote v5e is single-client and its host<->device tunnel degrades to
~1 MB/s on bad days (CLAUDE.md); full-scale training inputs are 0.5-1.3 GB,
so launching a run on a degraded tunnel wastes a device claim and risks a
mid-transfer kill that wedges the chip for 10-30 min. Run this first:

    timeout 300 env PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/tunnel_probe.py [--mb 16]

Prints one JSON line {claim_s, h2d_mbps, d2h_mbps, ok}; `ok` is true when
both directions beat 10 MB/s (a ~1 GB payload then moves in <2 min). Exits
nonzero when degraded. A timeout with no output at all means the chip is
still wedged or claimed by another client.
"""
import argparse
import json
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=16, help="payload size in MB")
    ap.add_argument("--min-mbps", type=float, default=10.0)
    args = ap.parse_args()

    import jax

    t0 = time.time()
    devs = jax.devices()
    claim_s = time.time() - t0

    # Guard against a silent CPU fallback (leaked JAX_PLATFORMS=cpu or a
    # failed axon claim): host-local copies measure at GB/s and would
    # green-light the very run this probe is meant to gate (ADVICE r4).
    platform = devs[0].platform.lower()
    if platform not in ("tpu", "axon"):
        print(json.dumps({"device": str(devs[0]), "claim_s": round(claim_s, 1),
                          "ok": False,
                          "reason": f"resolved platform {platform!r}, not the "
                                    "axon TPU — probe would measure host-local "
                                    "copies"}))
        return 1

    a = np.ones((args.mb * 1024 * 1024 // 4,), np.float32)
    t0 = time.time()
    x = jax.device_put(a)
    x.block_until_ready()
    h2d = args.mb / (time.time() - t0)

    t0 = time.time()
    np.asarray(x)
    d2h = args.mb / (time.time() - t0)

    ok = h2d >= args.min_mbps and d2h >= args.min_mbps
    print(json.dumps({"device": str(devs[0]), "claim_s": round(claim_s, 1),
                      "h2d_mbps": round(h2d, 1), "d2h_mbps": round(d2h, 1),
                      "ok": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
