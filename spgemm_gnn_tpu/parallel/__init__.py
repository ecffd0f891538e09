"""Multi-chip parallelism: device mesh, edge-partitioned graphs, SPMD
aggregation with explicit collectives.

The reference has **no** distributed code (SURVEY.md §2.4 — multi-GPU/NCCL is
listed as future work at README_INTEGRATED.md:382). This package is the
TPU-native capability the north star adds: the graph is partitioned by
destination-node blocks across a 1-D `jax.sharding.Mesh` axis ("graph"); each
device owns a contiguous node block and the in-edges that terminate in it;
aggregation runs under `shard_map` with source features brought in by
collective (all-gather of the compressed CBSR payload on the MaxK path — k
values + k channel ids per node instead of the dense hidden dim, which is the
distributed payoff of the CBSR design).
"""

from spgemm_gnn_tpu.parallel.mesh import make_mesh  # noqa: F401
from spgemm_gnn_tpu.parallel.sharded import ShardedGraph, shard_graph  # noqa: F401
