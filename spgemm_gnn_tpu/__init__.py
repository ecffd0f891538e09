"""spgemm-gnn-tpu: TPU-native GNN message-passing framework for the MaxK-GNN family.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the CUDA reference
(julius-sk/spgemm-gnn, MaxK-GNN ASPLOS'24): MaxK top-k sparse nonlinearity, CBSR
compressed feature layout, SpGEMM forward / SSpMM backward sparse aggregation,
GraphSAGE / GCN / GIN full-graph training, and multi-chip scaling via
`jax.sharding` meshes (which the reference lacks entirely).

Layout
------
- ``graphs``   — CSR graph containers, builders, datasets, tile planning
- ``ops``      — XLA-native reference ops (spmm, maxk, norms): the correctness oracle
- ``kernels``  — Pallas TPU kernels (MaxK→CBSR, SpGEMM fwd, SSpMM bwd) + custom_vjp
- ``models``   — flax.linen models: SAGE, GCN, GIN, GNN_res
- ``train``    — config, losses, metrics, optimizers, training loop, checkpointing
- ``parallel`` — device mesh setup, edge-partitioned multi-chip aggregation
- ``utils``    — logging, timing
"""

__version__ = "0.1.0"

from spgemm_gnn_tpu.graphs.csr import Graph  # noqa: F401
