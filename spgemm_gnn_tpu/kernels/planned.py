"""PlannedGraph: a Graph bundled with its forward/backward TilePlans, plus the
full XLA↔Pallas glue (densify, pad, kernel, unpad, norm scaling) used by the
"pallas" aggregation impl.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from spgemm_gnn_tpu.graphs.csr import Graph
from spgemm_gnn_tpu.graphs.tiles import TilePlan, plan_for_graph
from spgemm_gnn_tpu.kernels.spgemm_pallas import (
    LANES, spgemm_forward_planned, sspmm_backward_planned,
)
from spgemm_gnn_tpu.ops.maxk import cbsr_to_dense


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


def plan_graph(g: Graph, *, block_size: int = 2048, chunk: int | None = None,
               window: int | None = None) -> PlannedGraph:
    """Build both plans for a graph (host-side, once; the generate_meta role)."""
    fwd = plan_for_graph(g, transpose=False, block_size=block_size,
                         chunk=chunk, window=window)
    bwd = plan_for_graph(g, transpose=True, block_size=block_size,
                         chunk=chunk, window=window)
    return PlannedGraph(graph=g, fwd_plan=fwd, bwd_plan=bwd)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_rows(x: jax.Array, rows: int) -> jax.Array:
    n = x.shape[0]
    if n == rows:
        return x
    return jnp.pad(x, ((0, rows - n),) + ((0, 0),) * (x.ndim - 1))


def _scale(x, f):
    return x if f is None else x * f[:, None].astype(x.dtype)


def spgemm_forward(dim, values, channels, src_f, dst_f, plans) -> jax.Array:
    """Full forward: CBSR → dense rows → planned Pallas SpGEMM → norm scaling.

    (The densify step is XLA for now; its cost is O(N·k) scatter vs the
    kernel's O(E) work.)"""
    fwd_plan, _ = plans
    n = values.shape[0]
    x = cbsr_to_dense(values, channels, dim)
    x = _scale(x, src_f)
    x = _pad_rows(x, fwd_plan.padded_src)
    y = spgemm_forward_planned(fwd_plan, x, interpret=_interpret())
    y = y[:n]
    return _scale(y, dst_f)


def sspmm_backward(g_ct, channels, src_f, dst_f, plans) -> jax.Array:
    """Full sampled backward: pad → planned Pallas SSpMM → norm scaling.

    Returns dvalues [N, k]."""
    _, bwd_plan = plans
    n, k = channels.shape
    k_pad = max(LANES, -(-k // LANES) * LANES)
    gy = _scale(g_ct, dst_f)
    gy = _pad_rows(gy, bwd_plan.padded_src)
    ch = jnp.pad(channels, ((0, bwd_plan.padded_dst - n), (0, k_pad - k)))
    dv = sspmm_backward_planned(bwd_plan, gy, ch, interpret=_interpret())
    dv = dv[:n, :k]
    return _scale(dv, src_f)
