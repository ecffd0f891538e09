"""Graph containers, builders, synthetic generators, and dataset loading."""

from spgemm_gnn_tpu.graphs.csr import (  # noqa: F401
    Graph, from_edges, add_self_loops, to_undirected,
)
from spgemm_gnn_tpu.graphs.synthetic import random_graph, powerlaw_graph  # noqa: F401
