"""Synthetic graph generators for tests and benchmarks.

The reference benchmarks its kernels on a 24-graph corpus (SURVEY.md §6,
`images/24graphs.png`) that cannot be downloaded in this environment; these
generators reproduce the structural regimes that matter for kernel performance
(size, average degree, power-law skew) so benches are runnable anywhere. The
stats of the five training graphs are mirrored in `datasets.SYNTH_SPECS`.
"""
from __future__ import annotations

import numpy as np

from spgemm_gnn_tpu.graphs.csr import Graph, to_undirected


def random_graph(num_nodes: int, num_edges: int, *, seed: int = 0,
                 symmetric: bool = True) -> Graph:
    """Uniform Erdős–Rényi-style multigraph-free random graph."""
    rng = np.random.default_rng(seed)
    src = rng.integers(0, num_nodes, num_edges, dtype=np.int64)
    dst = rng.integers(0, num_nodes, num_edges, dtype=np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    if symmetric:
        return to_undirected(src, dst, num_nodes)
    from spgemm_gnn_tpu.graphs.csr import from_edges
    return from_edges(src, dst, num_nodes, symmetric=False)


def powerlaw_graph(num_nodes: int, num_edges: int, *, alpha: float = 1.5,
                   seed: int = 0) -> Graph:
    """Power-law degree-skewed symmetric graph (hub-heavy, Reddit-like).

    Endpoints are sampled with probability ∝ rank^(-1/alpha) — larger alpha
    gives milder skew. Duplicate edges are deduped, so the realised edge count is
    slightly below `num_edges` before symmetrisation.
    """
    rng = np.random.default_rng(seed)
    # Zipf-ish endpoint distribution over node ranks, sampled by inverse-CDF
    # (np.random.choice with p is far slower at 10M+ samples)
    p = (np.arange(1, num_nodes + 1, dtype=np.float64)) ** (-1.0 / alpha)
    cdf = np.cumsum(p)
    cdf /= cdf[-1]
    u = rng.random(num_edges)
    src = np.searchsorted(cdf, u).astype(np.int64)
    dst = rng.integers(0, num_nodes, num_edges, dtype=np.int64)
    keep = src != dst
    return to_undirected(src[keep], dst[keep], num_nodes)
