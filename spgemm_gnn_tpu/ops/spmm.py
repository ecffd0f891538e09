"""XLA-native sparse aggregation (SpMM) — gather + sorted segment_sum.

This is the cuSPARSE-role baseline (reference `kernels/spmm_cusparse.cu`,
SURVEY.md §2.1): y[v] = Σ_{e=(u→v)} w_e · x[u], computed as a row gather over
edges followed by a sorted segment sum into destinations. Entirely XLA — used as
the ReLU-path aggregation, as the correctness oracle for the Pallas kernels, and
as the fallback on non-TPU backends.

All supported norms factor as w_e = src_f[src]·dst_f[dst], so they are applied
as O(N·dim) pre/post scalings rather than O(E) per-edge multiplies.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from spgemm_gnn_tpu.ops.norms import node_factors


def _scale(x, f):
    return x if f is None else x * f[:, None].astype(x.dtype)


# cap on the materialised [E, dim_slab] message buffer (the gather+segment_sum
# formulation materialises per-edge messages in HBM; at Reddit scale E·dim·4
# bytes would exceed the chip — chunk the feature dim instead)
_MSG_BYTES_CAP = 2 << 30


def _gather_segsum(indices, edge_dst, num_nodes, x):
    e = indices.shape[0]
    dim = x.shape[-1]
    slab = max(int(_MSG_BYTES_CAP // max(e * 4, 1)), 1)
    if slab >= dim:
        msgs = jnp.take(x, indices, axis=0)
        return jax.ops.segment_sum(msgs, edge_dst, num_segments=num_nodes,
                                   indices_are_sorted=True)
    outs = []
    for lo in range(0, dim, slab):
        msgs = jnp.take(x[:, lo:lo + slab], indices, axis=0)
        outs.append(jax.ops.segment_sum(msgs, edge_dst,
                                        num_segments=num_nodes,
                                        indices_are_sorted=True))
    return jnp.concatenate(outs, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _spmm_core(num_nodes, x, src_f, dst_f,
               indices, edge_dst, t_indices, t_edge_dst):
    return _spmm_core_fwd(num_nodes, x, src_f, dst_f, indices, edge_dst,
                          t_indices, t_edge_dst)[0]


def _spmm_core_fwd(num_nodes, x, src_f, dst_f,
                   indices, edge_dst, t_indices, t_edge_dst):
    y = _gather_segsum(indices, edge_dst, num_nodes, _scale(x, src_f))
    return _scale(y, dst_f), (src_f, dst_f, t_indices, t_edge_dst)


def _spmm_core_bwd(num_nodes, res, g_ct):
    # the adjoint is the same gather + SORTED segment_sum on the transpose
    # CSR — without this, autodiff differentiates the forward gather into an
    # unsorted scatter-add, which XLA lowers ~20× slower (RESULTS.md k-sweep)
    src_f, dst_f, t_indices, t_edge_dst = res
    dx = _gather_segsum(t_indices, t_edge_dst, num_nodes,
                        _scale(g_ct, dst_f))
    return (_scale(dx, src_f), None, None, None, None, None, None)


_spmm_core.defvjp(_spmm_core_fwd, _spmm_core_bwd)


def spmm(g, x: jax.Array, norm: str = "sum") -> jax.Array:
    """y[v] = Σ_{in-edges u→v} w_e · x[u] with w from `norm` (sum/mean/gcn)."""
    src_f, dst_f = node_factors(g, norm)
    return _spmm_core(g.num_nodes, x, src_f, dst_f, g.indices, g.edge_dst,
                      g.t_indices, g.t_edge_dst)


def spmm_transpose(g, y: jax.Array, norm: str = "sum") -> jax.Array:
    """z[u] = Σ_{out-edges u→v} w_e · y[v] — the adjoint of `spmm` (same edge
    weights), used by backward passes."""
    src_f, dst_f = node_factors(g, norm)
    z = _gather_segsum(g.t_indices, g.t_edge_dst, g.num_nodes, _scale(y, dst_f))
    return _scale(z, src_f)
