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


def sbm_graph(num_nodes: int, num_edges: int, *, communities: int = 64,
              p_in: float = 0.7, alpha: float = 1.5, seed: int = 0,
              shuffle: bool = True) -> Graph:
    """Degree-skewed stochastic block model: power-law sources (as in
    powerlaw_graph) whose destinations stay inside the source's community
    with probability p_in. Community sizes are power-law too (realistic
    skew). With shuffle=True (default) node ids are randomly permuted, so
    the community structure is LATENT — invisible to contiguous-block
    partitioners and id-locality heuristics until a relabeling recovers it.

    Purpose (VERDICT r4 #2): the uniform power-law stand-ins provably carry
    no latent locality (RESULTS §relabel: permutation-invariant in
    expectation), so kernel-frontier negatives measured on them (relabel,
    per-density window classes, λ-collapse) do not transfer to real graphs
    like Reddit (`/root/reference/README.md:72-78`), whose community
    structure this generator imitates at matched N/E/degree.
    """
    if communities > num_nodes:
        raise ValueError("communities cannot exceed num_nodes")
    rng = np.random.default_rng(seed)
    # power-law community sizes; exact-total correction spreads any deficit
    # over the largest entries (a single sizes[0] += diff can go NEGATIVE
    # when communities is large relative to num_nodes, silently breaking
    # the bounds monotonicity searchsorted depends on)
    w = np.arange(1, communities + 1, dtype=np.float64) ** -0.8
    sizes = np.maximum((w / w.sum() * num_nodes).astype(np.int64), 1)
    diff = num_nodes - int(sizes.sum())
    i = 0
    while diff != 0:
        if diff > 0:
            sizes[i] += diff
            diff = 0
        else:
            take = min(int(sizes[i]) - 1, -diff)
            sizes[i] -= take
            diff += take
            i += 1
    bounds = np.concatenate([[0], np.cumsum(sizes)])
    assert bounds[-1] == num_nodes and (np.diff(bounds) > 0).all()
    # power-law sources (inverse-CDF zipf over ranks, as powerlaw_graph) —
    # degree rank is DECOUPLED from community id by a random rank→node map,
    # so hubs spread across communities (without it the zipf head and
    # community 0 coincide and a plain degree sort "recovers" communities
    # by construction — an unrealistic coupling)
    p = (np.arange(1, num_nodes + 1, dtype=np.float64)) ** (-1.0 / alpha)
    cdf = np.cumsum(p)
    cdf /= cdf[-1]
    rank_to_node = rng.permutation(num_nodes).astype(np.int64)
    src = rank_to_node[np.searchsorted(cdf, rng.random(num_edges))]
    comm = np.searchsorted(bounds, src, side="right") - 1
    lo, hi = bounds[comm], bounds[comm + 1]
    intra = rng.random(num_edges) < p_in
    dst_in = lo + (rng.random(num_edges) * (hi - lo)).astype(np.int64)
    dst_out = rng.integers(0, num_nodes, num_edges, dtype=np.int64)
    dst = np.where(intra, dst_in, dst_out)
    if shuffle:
        perm = rng.permutation(num_nodes).astype(np.int64)
        src, dst = perm[src], perm[dst]
    keep = src != dst
    return to_undirected(src[keep], dst[keep], num_nodes)


def rmat_graph(num_nodes: int, num_edges: int, *, a: float = 0.57,
               b: float = 0.19, c: float = 0.19, seed: int = 0,
               shuffle: bool = True) -> Graph:
    """R-MAT (recursive matrix) generator — self-similar community structure
    + power-law degrees, the classic Graph500 kernel-benchmark family. As in
    sbm_graph, node ids are shuffled by default so the recursive locality is
    latent rather than id-contiguous (VERDICT r4 #2)."""
    rng = np.random.default_rng(seed)
    d = 1.0 - a - b - c
    if d < 0:
        raise ValueError("a + b + c must be <= 1")
    levels = max(int(np.ceil(np.log2(max(num_nodes, 2)))), 1)
    src = np.zeros(num_edges, np.int64)
    dst = np.zeros(num_edges, np.int64)
    for _ in range(levels):
        r1 = rng.random(num_edges)
        r2 = rng.random(num_edges)
        sbit = r1 >= a + b                        # P = c + d
        p_hi = np.where(sbit, d / max(c + d, 1e-12), b / max(a + b, 1e-12))
        dbit = r2 < p_hi
        src = src * 2 + sbit
        dst = dst * 2 + dbit
    keep = (src < num_nodes) & (dst < num_nodes) & (src != dst)
    src, dst = src[keep], dst[keep]
    if shuffle:
        perm = rng.permutation(num_nodes).astype(np.int64)
        src, dst = perm[src], perm[dst]
    return to_undirected(src, dst, num_nodes)


def intra_block_fraction(g: Graph, block: int) -> float:
    """Fraction of edges whose endpoints share an id block of `block` rows —
    the locality quantity the windowed kernel's λ = deg·B/N rides on."""
    src = np.asarray(g.indices, np.int64)
    dst = np.asarray(g.edge_dst, np.int64)
    return float(np.mean(src // block == dst // block))


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
