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
from spgemm_gnn_tpu.graphs.stream_tiles import (
    StreamPlan, predicted_windowed_fill, stream_plan_for_graph)
from spgemm_gnn_tpu.graphs.tiles import (
    MultiTilePlan, TilePlan, auto_src_block, auto_window,
    build_tile_plan_classes, plan_for_graph)
from spgemm_gnn_tpu.kernels.spgemm_pallas import (
    densify_transpose, planned_spmm, sample_channels)
from spgemm_gnn_tpu.kernels.stream_pallas import stream_spmm

# below this predicted chunk fill the windowed (src-blocked) kernel loses to
# the streaming formulation — switch plan kinds (graphs/stream_tiles.py)
WINDOWED_FILL_CUTOVER = 0.25


@struct.dataclass
class PlannedGraph:
    """Graph + tile plans. Quacks like Graph for norm/degree computations.

    Plans are either windowed TilePlans (dense regime) or StreamPlans
    (low-degree regime) — `plan_graph(kind="auto")` picks per direction."""
    graph: Graph
    fwd_plan: TilePlan | StreamPlan
    bwd_plan: TilePlan | StreamPlan   # built on the transpose CSR

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


def plan_graph(g: Graph, *, tile_slots: int = 1024,
               src_block: int | None = None,
               dst_block: int = 4096, window: int | None = None,
               kind: str = "auto", cache_dir: str | None = None
               ) -> PlannedGraph:
    """Build both plans for a graph (host-side, once; the generate_meta role).

    kind: "windowed" | "stream" | "auto" — auto predicts the windowed chunk
    fill from the degree statistics and switches to the streaming plan below
    WINDOWED_FILL_CUTOVER (the flickr/yelp/products regime).
    src_block: None → auto_src_block picks the smallest B whose chunks stay
    full (measured best in every regime, scripts/plan_tune.py).
    cache_dir: if set, plans are persisted to disk keyed by the CSR content
    fingerprint + parameters (the reference's `64_warp_4/*.warp4` metadata
    amortisation — kernels/generate_meta.py role); second runs skip the build.
    For symmetric graphs the transpose CSR is the CSR itself, so the backward
    plan aliases the forward plan (halves build time and device transfer)."""
    if kind not in ("auto", "windowed", "stream", "windowed_classes"):
        raise ValueError(f"unknown plan kind {kind!r}")
    # the stream-vs-windowed cutover is calibrated at B=256 (KERNEL_SWEEP
    # corpus) — decide the kind there, THEN pick the src block for the
    # windowed branch (auto_src_block's fill target is a windowed-only model)
    kind_b = src_block if src_block is not None else 256
    if src_block is None:
        src_block = auto_src_block(g.num_nodes, g.num_edges)

    def one(transpose: bool):
        k = kind
        if k == "auto":
            rw = window or auto_window(g.num_nodes, g.num_edges, kind_b)
            est = predicted_windowed_fill(g.num_nodes, g.num_edges,
                                          kind_b, g.num_nodes, rw)
            k = "windowed" if est >= WINDOWED_FILL_CUTOVER else "stream"

        def build():
            if k == "windowed":
                return plan_for_graph(g, transpose=transpose,
                                      tile_slots=tile_slots,
                                      src_block=src_block,
                                      dst_block=dst_block, window=window)
            if k == "windowed_classes":
                import numpy as _np
                ip = g.t_indptr if transpose else g.indptr
                ix = g.t_indices if transpose else g.indices
                return build_tile_plan_classes(
                    _np.asarray(ip), _np.asarray(ix), g.num_nodes,
                    tile_slots=tile_slots, src_block=src_block,
                    dst_block=dst_block)
            return stream_plan_for_graph(
                g, transpose=transpose, tile_slots=tile_slots,
                dst_block=dst_block,
                window=window if kind == "stream" else None)

        if not cache_dir:
            return build()
        from spgemm_gnn_tpu.graphs.plan_cache import (
            cached_plan, graph_fingerprint, plan_key)
        ip = g.t_indptr if transpose else g.indptr
        ix = g.t_indices if transpose else g.indices
        key = plan_key(graph_fingerprint(ip, ix),
                       "t" if transpose else "f", k, S=tile_slots,
                       B=src_block, R=dst_block, W=window)
        return cached_plan(cache_dir, key, build)

    fwd = one(False)
    bwd = fwd if g.symmetric else one(True)
    return PlannedGraph(graph=g, fwd_plan=fwd, bwd_plan=bwd)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# feature-stream mode for the planned kernels: "f32" (exact) or "bf16x2"
# (packed half-precision stream — see spgemm_pallas.planned_spmm). Module-level
# so benches/drivers can flip it without threading a parameter through the
# model stack; per-call override via planned_spmm(stream=...).
DEFAULT_STREAM = "f32"

# Per-chunk control flow in the windowed kernel: BOTH variants measured
# NEGATIVE on the v5e (MWPROBE_r04.jsonl, clean idle-host A/B vs the r3-exact
# kernel):
#   - skip_empty (wrap each chunk in @pl.when(idx[0] >= 0)): 0.35x medium /
#     0.44x full — Mosaic predication serialises the vector pipeline, costing
#     far more than the skipped work saves;
#   - multiwindow (span-class dispatch to 64/128/256-row scatter matmuls):
#     0.36x at full scale — on synthetic power-law graphs hub edges spread
#     uniformly over destination rows, so full chunks genuinely span the
#     whole RW window and the branches are pure overhead on top of skip's.
# Lesson recorded in docs/DESIGN.md: this kernel must stay straight-line
# vector code. Both kept behind flags as the measured artifacts; output is
# bit-identical in every mode.
MULTIWINDOW = False
SKIP_EMPTY = False

# software-pipelined chunk schedule (chunk ci+1's slab gather issued between
# chunk ci's MXU dots and its window RMW — straight-line, bit-identical);
# module-level for A/B benching.
PIPELINE = True

# CBSR-edge-gather stream forward: measured NEGATIVE on the v5e (VERDICT r2
# #5, scripts/stream_cbsr_probe.py 2026-08-19): 0.58x the dense-row stream
# at k=8 and 0.29x at k=32 across sparse/deg50/mid-dense — TPU row gathers
# are tile-granular so thin [E, k] rows don't cut gather cost, and the
# k-step in-kernel densify adds pure VPU work. Kept behind this flag as the
# measured artifact; the dense-row stream is the production path.
STREAM_CBSR_FORWARD = False


def _scale(x, f):
    return x if f is None else x * f[:, None].astype(x.dtype)


def _planned_dense_spmm(plan, x: jax.Array, stream_dtype) -> jax.Array:
    """A · x over the plan for dense x [N, dim] → [N, dim] (f32), square case."""
    return _planned_spmm_rows(plan, x.astype(stream_dtype), x.shape[0])


def spgemm_forward(dim, values, channels, src_f, dst_f, plans,
                   stream_dtype=jnp.float32) -> jax.Array:
    """Full forward: CBSR → transposed dense (Pallas densify) → planned Pallas
    SpGEMM → norm scaling."""
    fwd_plan, _ = plans
    n = values.shape[0]
    v = values if src_f is None else values * src_f[:, None].astype(values.dtype)
    if isinstance(fwd_plan, StreamPlan):
        if STREAM_CBSR_FORWARD:   # measured-negative variant (flag above)
            from spgemm_gnn_tpu.kernels.stream_pallas import stream_spmm_cbsr
            from spgemm_gnn_tpu.ops.maxk import pack_channels
            y = stream_spmm_cbsr(fwd_plan, v, pack_channels(channels), dim,
                                 stream=DEFAULT_STREAM,
                                 interpret=_interpret())[:n]
            return _scale(y, dst_f)
        from spgemm_gnn_tpu.kernels.spgemm_pallas import densify_rows
        x = densify_rows(v, channels, dim, out_dtype=stream_dtype,
                         interpret=_interpret())
        y = stream_spmm(fwd_plan, x, stream=DEFAULT_STREAM,
                        interpret=_interpret())[:n]
        return _scale(y, dst_f)
    xt = densify_transpose(v, channels, dim, fwd_plan.padded_src,
                           out_dtype=stream_dtype, interpret=_interpret())
    subs = (fwd_plan.plans if isinstance(fwd_plan, MultiTilePlan)
            else (fwd_plan,))
    y = None
    for p in subs:
        yp = planned_spmm(p, xt, stream=DEFAULT_STREAM,
                          interpret=_interpret(), multiwindow=MULTIWINDOW,
                          skip_empty=SKIP_EMPTY, pipeline=PIPELINE)
        y = yp if y is None else y + yp
    y = y[:n]
    return _scale(y, dst_f)


def sspmm_backward(g_ct, channels, src_f, dst_f, plans,
                   stream_dtype=jnp.float32) -> jax.Array:
    """Sampled backward: dense transpose product (same kernel, transpose plan)
    then channel sampling. Returns dvalues [N, k]."""
    _, bwd_plan = plans
    gy = _scale(g_ct, dst_f)
    z = _planned_dense_spmm(bwd_plan, gy, stream_dtype)   # [N, dim] = Aᵀ·gy
    # sample the k surviving channels in-kernel (an XLA element gather at
    # [N, k] scale dominates the whole backward at low degree)
    dv = sample_channels(z, channels, interpret=_interpret())
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


def _planned_spmm_rows(plan, x, out_rows: int,
                       k_sparse: int | None = None) -> jax.Array:
    """A · x over the plan, output sliced to out_rows (the plan's row space
    may be rectangular: halo plans map [(D-1)·M] sources → [nps] rows).

    Dispatches on the plan kind: windowed TilePlan (transposed features,
    in-kernel slab gather) or StreamPlan (row-major features, XLA gather +
    Pallas windowed reduce). k_sparse asserts x has ≤ k nonzeros per row
    (MaxK output — possibly dropout-thinned); the stream forward then
    compacts on-chip and rides the CBSR-edge-gather kernel (k values + k/4
    packed channel words per edge instead of dim dense lanes), bit-identical
    output."""
    # 16-bit model activations (--dtype bfloat16) keep 16-bit aggregation
    # outputs: the accumulators stay f32 inside the kernels, but the [N, dim]
    # HBM output buffer halves — the products-scale fitting margin
    out_dt = x.dtype if x.dtype.itemsize == 2 else None
    if isinstance(plan, StreamPlan):
        if (STREAM_CBSR_FORWARD and k_sparse is not None
                and k_sparse < x.shape[-1]):   # measured-negative variant
            from spgemm_gnn_tpu.kernels.stream_pallas import stream_spmm_cbsr
            from spgemm_gnn_tpu.ops.maxk import cbsr_compact, pack_channels
            vals, ch = cbsr_compact(x, k_sparse)
            y = stream_spmm_cbsr(plan, vals, pack_channels(ch), x.shape[-1],
                                 stream=DEFAULT_STREAM, out_dtype=out_dt,
                                 interpret=_interpret())
            return y[:out_rows]
        y = stream_spmm(plan, x, stream=DEFAULT_STREAM, out_dtype=out_dt,
                        interpret=_interpret())
        return y[:out_rows]
    xt = x.T                                         # [dim, N]
    pad = plan.padded_src - x.shape[0]
    if pad:
        xt = jnp.pad(xt, ((0, 0), (0, pad)))
    sub_plans = plan.plans if isinstance(plan, MultiTilePlan) else (plan,)
    y = None
    for p in sub_plans:   # per-density window classes (graphs/tiles.py) —
        # one branch-free kernel launch each; partial sums add once per class
        yp = planned_spmm(p, xt, stream=DEFAULT_STREAM,
                          interpret=_interpret(), multiwindow=MULTIWINDOW,
                          skip_empty=SKIP_EMPTY, pipeline=PIPELINE)
        y = yp if y is None else y + yp
    return y[:out_rows] if out_dt is None else y[:out_rows].astype(out_dt)


# static = (shape_io, k_sparse). shape_io: None for the square case (output
# rows = input rows, as in single-chip model aggregation), or a static
# (n_out, n_in) pair for rectangular plan pairs (the multi-chip halo path:
# fwd maps n_in halo sources → n_out local rows; bwd maps n_out rows → n_in
# halo cotangents). k_sparse: the MaxK k when x is known top-k-sparse — the
# stream forward then rides the CBSR-edge-gather kernel; the backward is
# k-agnostic (the incoming cotangent is dense).
@_functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _planned_aggregate(static, x, src_f, dst_f, plans):
    return _planned_aggregate_fwd(static, x, src_f, dst_f, plans)[0]


def _planned_aggregate_fwd(static, x, src_f, dst_f, plans):
    shape_io, k_sparse = static
    fwd_plan, _ = plans
    n_out = x.shape[0] if shape_io is None else shape_io[0]
    y = _planned_spmm_rows(fwd_plan, _scale(x, src_f), n_out,
                           k_sparse=k_sparse)
    # zero-size sentinel carries x's dtype to the backward (the kernels
    # accumulate in f32; a bf16 primal needs a bf16 cotangent back)
    return _scale(y, dst_f), (jnp.zeros((0,), x.dtype), src_f, dst_f, plans)


def _planned_aggregate_bwd(static, res, g):
    shape_io, _ = static
    x_proto, src_f, dst_f, plans = res
    _, bwd_plan = plans
    n_in = g.shape[0] if shape_io is None else shape_io[1]
    dx = _planned_spmm_rows(bwd_plan, _scale(g, dst_f), n_in)
    return (_scale(dx, src_f).astype(x_proto.dtype), None, None, None)


_planned_aggregate.defvjp(_planned_aggregate_fwd, _planned_aggregate_bwd)


def planned_pair_apply(x: jax.Array, plans, n_out: int,
                       src_f=None, dst_f=None) -> jax.Array:
    """y[:n_out] = A_w · x through a (fwd, bwd) plan pair, differentiable.

    Supports rectangular pairs: fwd maps x's rows → n_out rows; bwd (the
    transpose plan) maps n_out rows → x's rows. Used by the multi-chip halo
    path (parallel/planned_sharded.py)."""
    return _planned_aggregate(((n_out, x.shape[0]), None), x, src_f, dst_f,
                              plans)


def planned_aggregate(pg: PlannedGraph, x: jax.Array, norm: str = "sum",
                      k: int | None = None) -> jax.Array:
    """y = A_w · x through the Pallas kernel pair (fwd + transpose-bwd).

    k (optional) asserts x is MaxK top-k sparse per row; stream-plan
    forwards then use the CBSR-edge-gather kernel (bit-identical, ~dim/k×
    less gather traffic)."""
    from spgemm_gnn_tpu.ops.norms import node_factors
    src_f, dst_f = node_factors(pg, norm)
    return _planned_aggregate((None, k), x, src_f, dst_f,
                              (pg.fwd_plan, pg.bwd_plan))
