"""PlannedGraph: a Graph bundled with its forward/backward TilePlans, plus the
full XLA↔Pallas glue (densify, transpose, pad, kernel, sample, norm scaling)
used by the "pallas" aggregation impl.

Two entry points:
- `planned_aggregate` (the models' fast path): dense masked activations in,
  fwd = plan kernel, bwd = transpose-plan kernel — no CBSR round-trip on a
  single chip (the op is linear; MaxK's own VJP applies the mask).
- `spgemm_forward` / `sspmm_backward` (the explicit CBSR API, reference
  binding parity): CBSR → Pallas densify_transpose → kernel; backward =
  transpose product sampled at the k channels. The [N, dim] intermediate is
  cheap on TPU — the CUDA reference's output-sparse formulation avoids
  *atomics*, which this design does not have (SURVEY.md §0).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from spgemm_gnn_tpu.graphs.csr import Graph
from spgemm_gnn_tpu.graphs.tiles import TilePlan, plan_for_graph
from spgemm_gnn_tpu.kernels.spgemm_pallas import densify_transpose, planned_spmm


@struct.dataclass
class PlannedGraph:
    """Graph + tile plans. Quacks like Graph for norm/degree computations."""
    graph: Graph
    fwd_plan: TilePlan
    bwd_plan: TilePlan   # built on the transpose CSR

    # -- Graph delegation ---------------------------------------------------
    @property
    def num_nodes(self):
        return self.graph.num_nodes

    @property
    def num_edges(self):
        return self.graph.num_edges

    @property
    def in_degrees(self):
        return self.graph.in_degrees

    @property
    def out_degrees(self):
        return self.graph.out_degrees

    @property
    def indices(self):
        return self.graph.indices

    @property
    def edge_dst(self):
        return self.graph.edge_dst

    @property
    def t_indices(self):
        return self.graph.t_indices

    @property
    def t_edge_dst(self):
        return self.graph.t_edge_dst


def plan_graph(g: Graph, *, tile_slots: int = 1024, src_block: int = 256,
               dst_block: int = 4096,
               window: int | None = None) -> PlannedGraph:
    """Build both plans for a graph (host-side, once; the generate_meta role).

    For symmetric graphs the transpose CSR is the CSR itself, so the backward
    plan aliases the forward plan (halves build time and device transfer)."""
    kw = dict(tile_slots=tile_slots, src_block=src_block, dst_block=dst_block,
              window=window)
    fwd = plan_for_graph(g, transpose=False, **kw)
    bwd = fwd if g.symmetric else plan_for_graph(g, transpose=True, **kw)
    return PlannedGraph(graph=g, fwd_plan=fwd, bwd_plan=bwd)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# feature-stream mode for the planned kernels: "f32" (exact) or "bf16x2"
# (packed half-precision stream — see spgemm_pallas.planned_spmm). Module-level
# so benches/drivers can flip it without threading a parameter through the
# model stack; per-call override via planned_spmm(stream=...).
DEFAULT_STREAM = "f32"


def _scale(x, f):
    return x if f is None else x * f[:, None].astype(x.dtype)


def _planned_dense_spmm(plan: TilePlan, x: jax.Array,
                        stream_dtype) -> jax.Array:
    """A · x over the plan for dense x [N, dim] → [N, dim] (f32)."""
    n = x.shape[0]
    xt = x.astype(stream_dtype).T                    # [dim, N]
    pad = plan.padded_src - n
    if pad:
        xt = jnp.pad(xt, ((0, 0), (0, pad)))
    y = planned_spmm(plan, xt, stream=DEFAULT_STREAM, interpret=_interpret())
    return y[:n]


def spgemm_forward(dim, values, channels, src_f, dst_f, plans,
                   stream_dtype=jnp.float32) -> jax.Array:
    """Full forward: CBSR → transposed dense (Pallas densify) → planned Pallas
    SpGEMM → norm scaling."""
    fwd_plan, _ = plans
    n = values.shape[0]
    v = values if src_f is None else values * src_f[:, None].astype(values.dtype)
    xt = densify_transpose(v, channels, dim, fwd_plan.padded_src,
                           out_dtype=stream_dtype, interpret=_interpret())
    y = planned_spmm(fwd_plan, xt, stream=DEFAULT_STREAM,
                     interpret=_interpret())[:n]
    return _scale(y, dst_f)


def sspmm_backward(g_ct, channels, src_f, dst_f, plans,
                   stream_dtype=jnp.float32) -> jax.Array:
    """Sampled backward: dense transpose product (same kernel, transpose plan)
    then channel sampling. Returns dvalues [N, k]."""
    _, bwd_plan = plans
    gy = _scale(g_ct, dst_f)
    z = _planned_dense_spmm(bwd_plan, gy, stream_dtype)   # [N, dim] = Aᵀ·gy
    dv = jnp.take_along_axis(z, channels, axis=-1)        # sample k channels
    return _scale(dv, src_f)


# ---------------------------------------------------------------------------
# direct dense aggregation (the fast path the models use)
# ---------------------------------------------------------------------------
# When the layer holds the MaxK-masked *dense* activations, the CBSR
# extraction → densify → channel-sampling round-trip is pure overhead on a
# single chip: the aggregation is linear, so its VJP is simply the transpose
# product, and MaxK's own VJP applies the top-k mask to the incoming dense
# cotangent. CBSR stays essential where it pays: the multi-chip collective
# (parallel/sharded.py) and the explicit aggregate_cbsr API.

import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=())
def _planned_aggregate(x, src_f, dst_f, plans):
    return _planned_aggregate_fwd(x, src_f, dst_f, plans)[0]


def _planned_aggregate_fwd(x, src_f, dst_f, plans):
    fwd_plan, _ = plans
    y = _planned_dense_spmm(fwd_plan, _scale(x, src_f), x.dtype)
    return _scale(y, dst_f), (src_f, dst_f, plans)


def _planned_aggregate_bwd(res, g):
    src_f, dst_f, plans = res
    _, bwd_plan = plans
    dx = _planned_dense_spmm(bwd_plan, _scale(g, dst_f), g.dtype)
    return (_scale(dx, src_f), None, None, None)


_planned_aggregate.defvjp(_planned_aggregate_fwd, _planned_aggregate_bwd)


def planned_aggregate(pg: PlannedGraph, x: jax.Array,
                      norm: str = "sum") -> jax.Array:
    """y = A_w · x through the Pallas kernel pair (fwd + transpose-bwd)."""
    from spgemm_gnn_tpu.ops.norms import node_factors
    src_f, dst_f = node_factors(pg, norm)
    return _planned_aggregate(x, src_f, dst_f, (pg.fwd_plan, pg.bwd_plan))
