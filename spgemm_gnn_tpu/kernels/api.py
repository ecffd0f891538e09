"""Sparse aggregation with CBSR features: SpGEMM forward + SSpMM backward.

The forward computes y[v] = Σ_{in-edges u→v} w_e · x[u] where x is the MaxK-
sparse feature matrix given in CBSR form (values f32[N,k], channels i32[N,k]).
The backward computes the cotangent only at the k surviving channels per node —
the sampled (output-sparse) SSpMM:

    dvalues[v, j] = src_f[v] · Σ_{out-edges v→u} dst_f[u] · g[u, channels[v, j]]

This mirrors the reference CUDA pair `spmm_kernel_opt2_sparse_v3` /
`spmm_kernel_opt2_sparse_backward_v3` (SURVEY.md §2.1 [bin]) but is wired as a
single differentiable op via `jax.custom_vjp` — fixing the reference's
integration gap where `spgemm_forward` was called outside any autograd.Function
(SURVEY.md §3.2).

Edge weights are separable: w_e = src_f[src] · dst_f[dst] (see ops/norms.py), so
both passes apply node factors as pre/post scalings instead of materialising [E]
weight arrays.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from spgemm_gnn_tpu.ops.maxk import cbsr_to_dense, maxk as _maxk_xla
from spgemm_gnn_tpu.ops.norms import node_factors
from spgemm_gnn_tpu.ops.spmm import spmm as _dense_spmm

IMPLS = ("auto", "xla", "xla_dense", "ell", "pallas")


def maxk_op(x: jax.Array, k: int | None, impl: str = "auto",
            g=None) -> jax.Array:
    """Top-k nonlinearity dispatch (the reference `maxk_forward` binding role,
    utils/maxk_layers.py:16-45).

    The Pallas pivot kernel (kernels/maxk_pallas.py, bit-exact vs the XLA
    oracle, ~3x faster at k=32 — RESULTS.md) serves the hot path: single
    device directly, and on a device mesh per-shard inside `shard_map` when
    `g` carries the mesh (rows are node-sharded, the op is row-local —
    VERDICT r3 #3: the kernel must not silently fall back to the oracle on
    pods). impl="pallas" uses the kernel on any backend (interpret-mode off
    TPU, like the rest of the planned path); impl="auto" uses it on TPU;
    impl="xla" forces the oracle.
    """
    if k is None or k >= x.shape[-1]:
        return x
    use_pallas = (impl == "pallas"
                  or (impl == "auto" and jax.default_backend() == "tpu"))
    if use_pallas:
        from spgemm_gnn_tpu.kernels.maxk_pallas import maxk_pallas
        if jax.device_count() == 1:
            return maxk_pallas(x, k)
        mesh = getattr(g, "mesh", None)
        axis = getattr(g, "axis", None)
        if mesh is not None and axis is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            return shard_map(lambda xb: maxk_pallas(xb, k), mesh=mesh,
                             in_specs=P(axis), out_specs=P(axis),
                             check_vma=False)(x)
        # multi-device without a mesh carrier: x is a sharded global array a
        # pallas_call cannot partition — the oracle is the correct fallback
    return _maxk_xla(x, k)


def _scale(x, f):
    return x if f is None else x * f[:, None].astype(x.dtype)


def _spgemm_forward_xla(dim, values, channels, src_f, dst_f, indices, edge_dst):
    """Dense-reconstruct forward: CBSR → dense rows, gather + segment_sum."""
    num_nodes = values.shape[0]
    x = cbsr_to_dense(values, channels, dim)
    x = _scale(x, src_f)
    msgs = jnp.take(x, indices, axis=0)
    y = jax.ops.segment_sum(msgs, edge_dst, num_segments=num_nodes,
                            indices_are_sorted=True)
    return _scale(y, dst_f)


def _sspmm_backward_xla(g, channels, src_f, dst_f, t_indices, t_edge_dst):
    """Sampled backward: gathers only the k surviving channels per source node.

    g: dense upstream cotangent f32[N, dim]. Returns dvalues f32[N, k].
    """
    num_nodes = channels.shape[0]
    gy = _scale(g, dst_f)
    # per transpose-order edge e': source v = t_edge_dst[e'], dest u = t_indices[e']
    ch_e = jnp.take(channels, t_edge_dst, axis=0)            # [E, k]
    # one fused 2-D gather — never materialises the [E, dim] dense rows
    m = gy[t_indices[:, None], ch_e]                         # [E, k] sampled
    dv = jax.ops.segment_sum(m, t_edge_dst, num_segments=num_nodes,
                             indices_are_sorted=True)
    return _scale(dv, src_f)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _spgemm(dim, impl, values, channels, src_f, dst_f,
            indices, edge_dst, t_indices, t_edge_dst, plans):
    return _spgemm_fwd(dim, impl, values, channels, src_f, dst_f,
                       indices, edge_dst, t_indices, t_edge_dst, plans)[0]


def _spgemm_fwd(dim, impl, values, channels, src_f, dst_f,
                indices, edge_dst, t_indices, t_edge_dst, plans):
    if impl == "pallas":
        from spgemm_gnn_tpu.kernels import planned
        y = planned.spgemm_forward(dim, values, channels, src_f, dst_f, plans)
    elif impl == "ell":
        from spgemm_gnn_tpu.ops import ell
        y = ell.spgemm_forward(dim, values, channels, src_f, dst_f, plans)
    elif impl in ("xla", "xla_dense", "auto"):
        y = _spgemm_forward_xla(dim, values, channels, src_f, dst_f,
                                indices, edge_dst)
    else:
        raise ValueError(f"unknown impl {impl!r}")
    res = (values, channels, src_f, dst_f, t_indices, t_edge_dst, plans)
    return y, res


def _spgemm_bwd(dim, impl, res, g):
    values, channels, src_f, dst_f, t_indices, t_edge_dst, plans = res
    if impl == "pallas":
        from spgemm_gnn_tpu.kernels import planned
        dv = planned.sspmm_backward(g, channels, src_f, dst_f, plans)
    elif impl == "ell":
        from spgemm_gnn_tpu.ops import ell
        dv = ell.sspmm_backward(g, channels, src_f, dst_f, plans)
    elif impl == "xla_dense":
        # oracle path: dense transpose SpMM then sample at channels
        gy = _scale(g, dst_f)
        num_nodes = values.shape[0]
        rows = jnp.take(gy, t_indices, axis=0)
        z = jax.ops.segment_sum(rows, t_edge_dst, num_segments=num_nodes,
                                indices_are_sorted=True)
        z = _scale(z, src_f)
        dv = jnp.take_along_axis(z, channels, axis=-1)
    else:
        dv = _sspmm_backward_xla(g, channels, src_f, dst_f,
                                 t_indices, t_edge_dst)
    # cotangents: only `values` is differentiable; match its dtype (the
    # kernels accumulate in f32 even for bf16 activations — --dtype bfloat16)
    return (dv.astype(values.dtype), None, None, None, None, None, None,
            None, None)


_spgemm.defvjp(_spgemm_fwd, _spgemm_bwd)


def aggregate_cbsr(g, values, channels, dim: int, norm: str = "sum",
                   impl: str = "auto") -> jax.Array:
    """Aggregate CBSR features over the graph: dense y = A_w @ cbsr(values, ch).

    Args:
      g: Graph or PlannedGraph (required for impl="pallas").
      values/channels: CBSR features from `ops.maxk_cbsr` (f32[N,k], i32[N,k]).
      dim: dense output feature dimension (the original hidden dim).
      norm: "sum" | "mean" | "gcn" (ops/norms.py).
      impl: implementation selector; "auto" picks the best available.
    """
    from spgemm_gnn_tpu.kernels.planned import PlannedGraph
    from spgemm_gnn_tpu.ops.ell import ELLGraph
    plans = None
    if isinstance(g, ELLGraph):
        # GNNAdvisor-role neighbor-group baseline (ops/ell.py)
        plans = (g.fwd, g.bwd)
        g = g.graph
        if impl == "auto":
            impl = "ell"
    if impl == "ell" and plans is None:
        raise ValueError("impl='ell' requires an ELLGraph (ops.ell.ell_graph)")
    if isinstance(g, PlannedGraph):
        plans = (g.fwd_plan, g.bwd_plan)
        if impl == "auto":
            # the windowed-matmul kernels only pay off when the tile plan is
            # reasonably dense; sparse plans (low-degree graphs) fall back to
            # the XLA path — matching the reference's >50-avg-degree headline
            # regime (README.md:136)
            fill = min(g.fwd_plan.fill, g.bwd_plan.fill)
            impl = "pallas" if fill >= 0.2 else "xla"
    if impl == "pallas" and plans is None:
        raise ValueError("impl='pallas' requires a PlannedGraph "
                         "(kernels.planned.plan_graph)")
    src_f, dst_f = node_factors(g, norm)
    return _spgemm(dim, impl, values, channels, src_f, dst_f,
                   g.indices, g.edge_dst, g.t_indices, g.t_edge_dst, plans)


def aggregate(g, x: jax.Array, norm: str = "sum", k: int | None = None,
              impl: str = "auto") -> jax.Array:
    """Aggregate node features over the graph.

    If `k` is None, x is treated as dense and routed through the XLA SpMM
    baseline. If `k` is given, x must already be k-sparse per row (MaxK output);
    it is converted to CBSR and routed through the SpGEMM/SSpMM pair.

    The result carries the checkpoint name "agg_out": under `--remat` the
    models use `save_only_these_names("agg_out")`, so rematerialisation
    recomputes the CHEAP per-layer ops (dense matmuls, MaxK) but never
    re-runs the edge-proportional aggregation kernel — its VJP is the
    transpose kernel on the cotangent and needs no forward residuals
    (the op is linear in x). Measured at products scale: full remat re-ran
    the kernel per layer (11.2 → 16.8 s/epoch); this policy keeps the fit
    without that cost (models/models.py).
    """
    from jax.ad_checkpoint import checkpoint_name
    return checkpoint_name(_aggregate_impl(g, x, norm, k, impl), "agg_out")


def _aggregate_impl(g, x, norm, k, impl) -> jax.Array:
    from spgemm_gnn_tpu.parallel.sharded import ShardedGraph, sharded_spmm
    if isinstance(g, ShardedGraph):
        return sharded_spmm(g, x, norm, k=k)
    from spgemm_gnn_tpu.parallel.planned_sharded import (
        ShardedPlannedGraph, sharded_planned_aggregate)
    if isinstance(g, ShardedPlannedGraph):
        return sharded_planned_aggregate(g, x, norm, k=k)
    from spgemm_gnn_tpu.kernels.planned import PlannedGraph, planned_aggregate
    if isinstance(g, PlannedGraph):
        fill = min(g.fwd_plan.fill, g.bwd_plan.fill)
        if impl == "pallas" or (impl == "auto" and fill >= 0.2):
            # fast path: aggregation is linear in x, so fwd/bwd are the plan
            # kernel and its transpose — no CBSR extraction round-trip. MaxK's
            # own VJP applies the top-k mask to the dense cotangent.
            return planned_aggregate(g, x, norm, k=k)
        g = g.graph
    if k is None or k >= x.shape[-1]:
        return _dense_spmm(g, x, norm)
    from spgemm_gnn_tpu.ops.maxk import cbsr_compact
    values, channels = cbsr_compact(x, k)
    return aggregate_cbsr(g, values, channels, x.shape[-1], norm, impl)
