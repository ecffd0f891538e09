"""Edge-weight normalisations, computed from stored degrees under jit.

Replaces the reference's per-node Python loop that builds mean-aggregation
weights (`/root/reference/utils/maxk_layers.py:147-157`: 1/in_degree, clamped
min 1) and DGL GraphConv's norm='both' symmetric normalisation
(`utils/maxk_layers.py:314-317,373-378`: D_out^-1/2 on the source side,
D_in^-1/2 on the destination side).

All norms are separable per-edge functions w_e = f(src_deg) * g(dst_deg), which
lets the backward pass recompute transpose-order weights directly from the
transpose CSR structure without storing an edge permutation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NORM_SUM = "sum"    # w_e = 1
NORM_MEAN = "mean"  # w_e = 1 / max(in_deg[dst], 1)        (DGL fn.mean / SAGE)
NORM_GCN = "gcn"    # w_e = rsqrt(max(out_deg[src],1)) * rsqrt(max(in_deg[dst],1))


def _clamp1(d: jax.Array) -> jax.Array:
    return jnp.maximum(d, 1).astype(jnp.float32)


def node_factors(g, norm: str) -> tuple[jax.Array | None, jax.Array | None]:
    """Per-node (src_factor, dst_factor) such that w_e = src_f[src] * dst_f[dst].

    Either factor may be None (≡ 1.0).
    """
    if norm == NORM_SUM:
        return None, None
    if norm == NORM_MEAN:
        return None, 1.0 / _clamp1(g.in_degrees)
    if norm == NORM_GCN:
        return (jax.lax.rsqrt(_clamp1(g.out_degrees)),
                jax.lax.rsqrt(_clamp1(g.in_degrees)))
    raise ValueError(f"unknown norm {norm!r}")


def edge_weights(g, norm: str, *, transpose: bool = False) -> jax.Array | None:
    """Per-edge weights in forward (in-CSR) or transpose (out-CSR) edge order.

    In transpose order, edge e' has src = t_edge_dst[e'] (the original source)
    and dst = t_indices[e'] (the original destination).
    """
    src_f, dst_f = node_factors(g, norm)
    if src_f is None and dst_f is None:
        return None
    if not transpose:
        src_ids, dst_ids = g.indices, g.edge_dst
    else:
        src_ids, dst_ids = g.t_edge_dst, g.t_indices
    w = None
    if src_f is not None:
        w = src_f[src_ids]
    if dst_f is not None:
        w = dst_f[dst_ids] if w is None else w * dst_f[dst_ids]
    return w
