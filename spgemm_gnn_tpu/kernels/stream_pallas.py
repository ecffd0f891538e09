"""Pallas TPU kernel: streaming windowed segment reduction over a StreamPlan —
the low-degree companion of kernels/spgemm_pallas.py.

Division of labour (see graphs/stream_tiles.py for the why):
- XLA does the per-edge message gather (`jnp.take` row gather from the
  [N, dim] feature matrix using the plan's global source ids), one scan group
  at a time so the [Wg·S, dim] message buffer stays within a fixed budget;
- this kernel does the scatter-free reduction XLA lowers badly: per 128-edge
  chunk, one [RW, 128] one-hot × [128, dim] MXU contraction into the chunk's
  8-aligned destination-row window (same accumulation scheme as the windowed
  kernel — each destination block is owned by consecutive grid steps, no
  atomics, SURVEY.md §5.2).

This serves the same role as the reference CUDA kernels on its low-degree
benchmark graphs (`/root/reference/README.md:72-78`): the regime where
source-block bucketing cannot fill chunks, but dst-sorted chunks are full at
any degree.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spgemm_gnn_tpu.graphs.stream_tiles import StreamPlan
from spgemm_gnn_tpu.graphs.tiles import CHUNK


def _first_visit(i, ws_ref):
    prev = ws_ref[jnp.maximum(i - 1, 0)]
    return jnp.logical_or(i == 0, ws_ref[i] != prev)


def _stream_kernel(ws_ref,                     # scalar prefetch (SMEM)
                   msgs_ref, e_dst_ref,        # VMEM blocks
                   out_ref, *, window: int, acc_dtype, mxu_dtype):
    i = pl.program_id(0)

    @pl.when(_first_visit(i, ws_ref))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    r = out_ref.shape[0]
    slots = e_dst_ref.shape[-1]
    for ci in range(slots // CHUNK):
        lo = ci * CHUNK
        rows = e_dst_ref[0, 0, lo:lo + CHUNK]      # [C]; -1 ⇒ padding
        # 8-aligned chunk window (planner contract), clamped in-bounds; a
        # padding-only chunk has rows[0] = -1 → w0 = 0 and rel < 0 (no match)
        w0 = jnp.maximum(jnp.minimum((rows[0] // 8) * 8, r - window), 0)
        w0 = pl.multiple_of(w0, 8)
        rel = rows - w0                            # [C] in [0, RW) or < 0
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (window, CHUNK), 0)
                  == rel[None, :]).astype(mxu_dtype)
        msgs = msgs_ref[0, lo:lo + CHUNK, :].astype(mxu_dtype)   # [C, dim]
        # f32 messages need full-precision MXU passes (DEFAULT truncates to
        # bf16); the bf16 stream is already exact w.r.t. its own precision
        prec = (jax.lax.Precision.HIGHEST if mxu_dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        contrib = jnp.dot(onehot, msgs, precision=prec,
                          preferred_element_type=acc_dtype)      # [RW, dim]
        cur = out_ref[pl.ds(w0, window), :]
        out_ref[pl.ds(w0, window), :] = cur + contrib.astype(out_ref.dtype)


def _stream_call(ws, msgs, e_dst3, *, gb: int, r: int, window: int,
                 acc_dtype, interpret: bool) -> jax.Array:
    wg, s, dim = msgs.shape
    kernel = functools.partial(_stream_kernel, window=window,
                               acc_dtype=acc_dtype, mxu_dtype=msgs.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(wg,),
        in_specs=[
            pl.BlockSpec((1, s, dim), lambda i, w: (i, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda i, w: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((r, dim), lambda i, w: (w[i], 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((gb * r, dim), acc_dtype),
        interpret=interpret,
    )(ws, msgs, e_dst3)


def _stream_cbsr_kernel(ws_ref,                  # scalar prefetch (SMEM)
                        gv_ref, gp_ref, e_dst_ref,   # VMEM blocks
                        out_ref, msgs_ref, *, window: int, k: int,
                        acc_dtype, mxu_dtype):
    """CBSR-edge-gather variant: per 128-edge chunk, densify the gathered
    [C, k] values + packed channels into [C, dim] messages on the VPU
    (k one-hot select steps — the _densify_rows_kernel pattern), then the
    same one-hot MXU window reduction as _stream_kernel. Padding slots carry
    node 0's real CBSR row; they are neutralised by the dst one-hot (rel < 0
    never matches), exactly as in the dense-row kernel."""
    i = pl.program_id(0)

    @pl.when(_first_visit(i, ws_ref))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    r, dim = out_ref.shape[0], out_ref.shape[1]
    slots = e_dst_ref.shape[-1]
    # densify the WHOLE tile's [S, k] values into the [S, dim] VMEM scratch
    # first (k one-hot steps accumulated IN PLACE — a value-chain version
    # kept slots/128 unrolled select chains live and blew the 16 MB
    # scoped-VMEM stack at k=32)
    vals = gv_ref[0]                              # [S, k_pad]
    pch = gp_ref[0]                               # [S, kp] packed uint8x4
    lane = jax.lax.broadcasted_iota(jnp.int32, (slots, dim), 1)
    msgs_ref[:] = jnp.zeros((slots, dim), mxu_dtype)
    for j in range(k):
        cj = (pch[:, j // 4:j // 4 + 1] >> (8 * (j % 4))) & 0xFF
        vj = vals[:, j:j + 1].astype(mxu_dtype)
        msgs_ref[:] = msgs_ref[:] + (lane == cj).astype(mxu_dtype) * vj
    prec = (jax.lax.Precision.HIGHEST if mxu_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    for ci in range(slots // CHUNK):
        lo = ci * CHUNK
        rows = e_dst_ref[0, 0, lo:lo + CHUNK]
        w0 = jnp.maximum(jnp.minimum((rows[0] // 8) * 8, r - window), 0)
        w0 = pl.multiple_of(w0, 8)
        rel = rows - w0
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (window, CHUNK), 0)
                  == rel[None, :]).astype(mxu_dtype)
        contrib = jnp.dot(onehot, msgs_ref[lo:lo + CHUNK, :], precision=prec,
                          preferred_element_type=acc_dtype)
        cur = out_ref[pl.ds(w0, window), :]
        out_ref[pl.ds(w0, window), :] = cur + contrib.astype(out_ref.dtype)


def stream_spmm_cbsr(plan: StreamPlan, values: jax.Array,
                     pchannels: jax.Array, dim: int, *,
                     acc_dtype=jnp.float32, out_dtype=None,
                     stream: str = "bf16x2",
                     interpret: bool = False) -> jax.Array:
    """y = A @ cbsr(values, channels) over the plan — the edge-gather
    formulation (VERDICT r2 #5): the per-edge gather moves k values + k/4
    packed channel words per edge (~96 B at k=32) instead of dim dense lanes
    (512 B), trading gather/stream HBM traffic for k in-kernel one-hot
    densify steps per chunk.

    values: [N, k] (any float dtype), pchannels: [N, ceil(k/4)] int32 from
    ops.maxk.pack_channels. Returns [plan.padded_dst, dim].
    """
    n, k = values.shape
    if dim > 256:
        # pack_channels stores channel ids as uint8 (4 per int32 lane); the
        # in-kernel unpack sign-extends byte 3 via arithmetic shift, so ids
        # ≥ 256 would silently corrupt output (ADVICE r3)
        raise ValueError(f"stream_spmm_cbsr supports dim <= 256 (uint8 "
                         f"channel ids); got dim={dim}")
    out_dtype = out_dtype or acc_dtype
    vd = values.astype(jnp.bfloat16) if stream in ("bf16", "bf16x2") \
        else values.astype(jnp.float32)
    S, Wg, GB, R = (plan.tile_slots, plan.group_tiles, plan.group_blocks,
                    plan.dst_block)
    kp = pchannels.shape[1]
    span = GB * R
    kernel = functools.partial(_stream_cbsr_kernel, window=plan.window, k=k,
                               acc_dtype=acc_dtype, mxu_dtype=vd.dtype)

    def call(ws, gv, gp, e_dst3):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Wg,),
            in_specs=[
                pl.BlockSpec((1, S, gv.shape[-1]), lambda i, w: (i, 0, 0)),
                pl.BlockSpec((1, S, kp), lambda i, w: (i, 0, 0)),
                pl.BlockSpec((1, 1, S), lambda i, w: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((R, dim), lambda i, w: (w[i], 0)),
            scratch_shapes=[pltpu.VMEM((S, dim), vd.dtype)],
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((GB * R, dim), acc_dtype),
            interpret=interpret,
        )(ws, gv, gp, e_dst3)

    def step(y, grp):
        ws, row0, esrc, edst = grp
        flat = esrc.reshape(-1)
        gv = jnp.take(vd, flat, axis=0).reshape(Wg, S, k)
        gp = jnp.take(pchannels, flat, axis=0).reshape(Wg, S, kp)
        partial = call(ws, gv, gp, edst.astype(jnp.int32).reshape(Wg, 1, S))
        cur = jax.lax.dynamic_slice(y, (row0, 0), (span, dim))
        upd = (cur.astype(acc_dtype) + partial).astype(out_dtype)
        return jax.lax.dynamic_update_slice(y, upd, (row0, 0)), None

    y0 = jnp.zeros((plan.padded_dst, dim), out_dtype)
    if plan.num_groups == 1:
        y, _ = step(y0, (plan.ws_local[0], plan.row0[0],
                         plan.e_src[0], plan.e_dst[0]))
    else:
        y, _ = jax.lax.scan(
            step, y0, (plan.ws_local, plan.row0, plan.e_src, plan.e_dst))
    return y


def stream_spmm(plan: StreamPlan, x: jax.Array, *, acc_dtype=jnp.float32,
                out_dtype=None, stream: str = "f32",
                interpret: bool = False) -> jax.Array:
    """y = A @ x over the plan; x row-major [N_src, dim] (no padding needed —
    the gather clamps). Returns [plan.padded_dst, dim] in out_dtype
    (default acc_dtype); slice to the real row count outside. Node-factor
    norms are applied outside (separable, see ops/norms.py).

    stream: "f32" (exact) or "bf16"/"bf16x2" — messages are gathered and
    contracted in bfloat16 (halves the gather+kernel HBM traffic; there is no
    in-kernel lane gather here, so no bit-packing is needed).

    out_dtype=bf16 keeps the scan-carried [padded_dst, dim] output buffer at
    half size — the single largest HBM temp at products scale (2.34 GB f32).
    Accumulation stays f32: tiles within a group add in the kernel's f32 VMEM
    accumulator; only group-boundary blocks take one extra bf16 rounding on
    the carry add.
    """
    dim = x.shape[-1]
    if dim % 8:
        raise ValueError("dim must be a multiple of 8")
    out_dtype = out_dtype or acc_dtype
    xd = x.astype(jnp.bfloat16) if stream in ("bf16", "bf16x2") \
        else x.astype(jnp.float32)
    S, Wg, GB, R = (plan.tile_slots, plan.group_tiles, plan.group_blocks,
                    plan.dst_block)
    span = GB * R

    def step(y, grp):
        ws, row0, esrc, edst = grp
        msgs = jnp.take(xd, esrc.reshape(-1), axis=0,
                        indices_are_sorted=False).reshape(Wg, S, dim)
        partial = _stream_call(ws, msgs,
                               edst.astype(jnp.int32).reshape(Wg, 1, S),
                               gb=GB, r=R, window=plan.window,
                               acc_dtype=acc_dtype, interpret=interpret)
        cur = jax.lax.dynamic_slice(y, (row0, 0), (span, dim))
        upd = (cur.astype(acc_dtype) + partial).astype(out_dtype)
        return jax.lax.dynamic_update_slice(y, upd, (row0, 0)), None

    y0 = jnp.zeros((plan.padded_dst, dim), out_dtype)
    if plan.num_groups == 1:
        y, _ = step(y0, (plan.ws_local[0], plan.row0[0],
                         plan.e_src[0], plan.e_dst[0]))
    else:
        y, _ = jax.lax.scan(
            step, y0, (plan.ws_local, plan.row0, plan.e_src, plan.e_dst))
    return y
