#!/usr/bin/env python
"""Per-layer activation parity harness — the north-star "per-layer activations
allclose vs the reference DGL+CUDA implementation" check (BASELINE.json).

Workflow:
1. On a machine with the reference installed, dump per-layer activations with
   matching weights:  see the `--dump-template` output for the torch-side
   snippet (hooks on each layer, weights exported to npz).
2. Here, load the same weights into the flax model, run the same input, and
   compare layer by layer:

   python scripts/compare_activations.py --dataset flickr --model sage \
       --weights ref_weights.npz --activations ref_acts.npz

Weight npz keys follow the reference module names (lin_in.weight,
layers.0.fc_self.weight, ...); the mapping below translates them to flax
parameter paths. Activation npz keys: act_0 ... act_{L} (post-layer outputs)
plus logits.
"""
import argparse
import sys

import numpy as np

TEMPLATE = '''
# --- torch side (reference repo) ---
import numpy as np, torch
acts, handles = {}, []
for i, layer in enumerate(model.layers):
    handles.append(layer.register_forward_hook(
        lambda m, inp, out, i=i: acts.__setitem__(f"act_{i}",
                                                  out.detach().cpu().numpy())))
logits = model(g, features)
np.savez("ref_acts.npz", logits=logits.detach().cpu().numpy(), **acts)
np.savez("ref_weights.npz", **{k: v.detach().cpu().numpy()
                               for k, v in model.state_dict().items()})
'''


def torch_to_flax_sage(weights: dict, num_layers: int) -> dict:
    """Map reference SAGE state_dict → flax params pytree."""
    p = {
        "lin_in": {"kernel": weights["lin_in.weight"].T,
                   "bias": weights["lin_in.bias"]},
        "lin_out": {"kernel": weights["lin_out.weight"].T,
                    "bias": weights["lin_out.bias"]},
    }
    for i in range(num_layers):
        layer = {
            "fc_self": {"kernel": weights[f"layers.{i}.fc_self.weight"].T,
                        "bias": weights[f"layers.{i}.fc_self.bias"]},
            "fc_neigh": {"kernel": weights[f"layers.{i}.fc_neigh.weight"].T},
        }
        nk = f"layers.{i}.norm.weight"
        if nk in weights:
            layer["LayerNorm_0"] = {"scale": weights[nk],
                                    "bias": weights[f"layers.{i}.norm.bias"]}
        p[f"layer{i}"] = layer
    return p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=False, default="flickr")
    ap.add_argument("--data_path", default="./data")
    ap.add_argument("--model", default="sage", choices=["sage"])
    ap.add_argument("--weights", help="reference state_dict npz")
    ap.add_argument("--activations", help="reference activations npz")
    ap.add_argument("--hidden_dim", type=int, default=256)
    ap.add_argument("--hidden_layers", type=int, default=3)
    ap.add_argument("--maxk", type=int, default=32)
    ap.add_argument("--nonlinear", default="maxk")
    ap.add_argument("--norm", action="store_true")
    ap.add_argument("--rtol", type=float, default=1e-4)
    ap.add_argument("--atol", type=float, default=1e-5)
    ap.add_argument("--dump-template", action="store_true",
                    help="print the torch-side dump snippet and exit")
    args = ap.parse_args()

    if args.dump_template or not (args.weights and args.activations):
        print(TEMPLATE)
        if not (args.weights and args.activations):
            print("# (pass --weights/--activations to run the comparison)")
        return 0

    import jax
    import jax.numpy as jnp
    from spgemm_gnn_tpu.graphs.datasets import load_dataset
    from spgemm_gnn_tpu.models.models import build_model

    ds = load_dataset(args.dataset, args.data_path)
    ref_w = dict(np.load(args.weights))
    ref_a = dict(np.load(args.activations))

    model = build_model(args.model, hidden_dim=args.hidden_dim,
                        num_layers=args.hidden_layers,
                        out_dim=ds.num_classes, maxk=args.maxk,
                        feat_drop=0.0, use_norm=args.norm,
                        nonlinear=args.nonlinear, impl="xla")
    params = torch_to_flax_sage(ref_w, args.hidden_layers)
    x = jnp.asarray(ds.features)

    # capture per-layer outputs via flax's intermediates collection
    logits, state = model.apply(
        {"params": params}, ds.graph, x, train=False,
        capture_intermediates=lambda mdl, name: name == "__call__",
        mutable=["intermediates"])

    failures = 0
    logits_np = np.asarray(logits)
    if "logits" in ref_a:
        ok = np.allclose(logits_np, ref_a["logits"], rtol=args.rtol,
                         atol=args.atol)
        err = float(np.max(np.abs(logits_np - ref_a["logits"])))
        print(f"logits: {'OK' if ok else 'MISMATCH'} (max abs err {err:.2e})")
        failures += 0 if ok else 1
    # per-layer comparison
    inter = state["intermediates"]
    layer_outs = {}
    for i in range(args.hidden_layers):
        node = inter.get(f"layer{i}", {}).get("__call__")
        if node:
            layer_outs[f"act_{i}"] = np.asarray(node[0])
    for key, ref in ref_a.items():
        if key == "logits":
            continue
        if key not in layer_outs:
            print(f"{key}: not captured on the flax side")
            continue
        got = layer_outs[key]
        ok = np.allclose(got, ref, rtol=args.rtol, atol=args.atol)
        err = float(np.max(np.abs(got - ref)))
        print(f"{key}: {'OK' if ok else 'MISMATCH'} (max abs err {err:.2e})")
        failures += 0 if ok else 1
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
