"""Pallas TPU kernels: SpGEMM forward and SSpMM backward over tile plans.

TPU re-design of the reference CUDA pair (`spmm_kernel_opt2_sparse_v3` /
`spmm_kernel_opt2_sparse_backward_v3`, SURVEY.md §2.1 [bin]) — same math,
completely different machine mapping:

- the CUDA kernels use warp-partitioned edge lists (`.warp4` metadata), CBSR
  gathers from global memory, and atomic accumulation in shared memory;
- here, a host-built TilePlan (graphs/tiles.py) gives a static 1-D grid of edge
  tiles bucketed by (dst block, src block). Per tile the kernel:
    1. receives the source-feature block via the Pallas pipeline (the BlockSpec
       index_map reads the scalar-prefetched `ws_src_block`, so HBM→VMEM DMA is
       double-buffered automatically — the shared-memory staging analogue);
    2. row-gathers the tile's S edge messages with one `dynamic_gather`
       (Mosaic lowers `take_along_axis` along sublanes);
    3. reduces each C-edge chunk into its RW-row destination window with one
       [RW, C] @ [C, dim] MXU matmul (one-hot destination matrix) — no atomics
       anywhere: each destination block is owned by consecutive grid steps
       (segment-reduce semantics, SURVEY.md §5.2);
- the backward kernel additionally lane-gathers (`take_along_axis` along lanes)
  the k surviving channels per destination row, producing the CBSR-shaped
  gradient [N, k] directly — the "sampled" SSpMM.

Accumulation across tiles of one destination block relies on Pallas output
revisiting: the plan is sorted by destination block, the out BlockSpec maps all
its tiles to the same block, and the kernel zeroes it on first visit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spgemm_gnn_tpu.graphs.tiles import TilePlan

LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _first_visit(i, ws_dst_ref):
    prev = ws_dst_ref[jnp.maximum(i - 1, 0)]
    return jnp.logical_or(i == 0, ws_dst_ref[i] != prev)


def _gather_rows(block, idx):
    """Row gather: out[t, :] = block[idx[t], :] via sublane dynamic_gather.

    Mosaic requires indices.shape == operand.shape, hence S == tile size ==
    block size (TilePlan invariant)."""
    idx2d = jnp.broadcast_to(idx[:, None], block.shape)
    return jnp.take_along_axis(block, idx2d, axis=0)


# ----------------------------------------------------------------------------
# forward SpGEMM: dense out[dst] += Σ w · x[src]
# ----------------------------------------------------------------------------

def _fwd_kernel(ws_dst_ref, ws_src_ref,          # scalar prefetch (SMEM)
                x_ref, e_src_ref, e_dst_ref,     # VMEM blocks
                out_ref, *, chunk: int, window: int, acc_dtype):
    i = pl.program_id(0)

    @pl.when(_first_visit(i, ws_dst_ref))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    src_idx = e_src_ref[0, 0, :]                    # [S] i32; -1 ⇒ padding
    block = x_ref[:]                                # [S, dim]
    gathered = _gather_rows(block, jnp.maximum(src_idx, 0))   # [S, dim]
    # padding mask via f32 multiply — bool [:, None] reshapes (i1 minor-dim
    # insertion) don't lower in Mosaic
    mask_f = (src_idx >= 0).astype(gathered.dtype)
    gathered = gathered * mask_f[:, None]

    s = src_idx.shape[0]
    cpt = s // chunk
    for ci in range(cpt):
        lo = ci * chunk
        seg = gathered[lo:lo + chunk, :]            # [C, dim]
        rows = e_dst_ref[0, 0, lo:lo + chunk]       # [C] absolute in block
        # 8-aligned chunk window start (planner contract), clamped in-bounds;
        # rows - w0 stays in [0, RW) either way
        w0 = jnp.minimum((e_dst_ref[0, 0, lo] // 8) * 8, s - window)
        w0 = pl.multiple_of(w0, 8)
        rel = rows - w0                             # [C] in [0, RW)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (window, chunk), 0)
                  == rel[None, :]).astype(seg.dtype)
        contrib = jax.lax.dot_general(
            onehot, seg, (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype)        # [RW, dim]
        cur = out_ref[pl.ds(w0, window), :]
        out_ref[pl.ds(w0, window), :] = cur + contrib.astype(out_ref.dtype)


def spgemm_forward_planned(plan: TilePlan, x_padded: jax.Array,
                           *, acc_dtype=jnp.float32,
                           interpret: bool = False) -> jax.Array:
    """y = A @ x over the plan. x_padded: [plan.padded_src, dim] (source rows,
    any float dtype); returns [plan.padded_dst, dim] in acc_dtype.

    Degree norms are NOT applied here — pre/post scale by node factors outside
    (they are separable, see ops/norms.py)."""
    S, C, RW = plan.block_size, plan.chunk, plan.window
    dim = x_padded.shape[-1]
    if x_padded.shape[0] != plan.padded_src:
        raise ValueError(f"x rows {x_padded.shape[0]} != padded_src "
                         f"{plan.padded_src}")
    if dim % LANES:
        raise ValueError(f"dim must be a multiple of {LANES}")

    kernel = functools.partial(_fwd_kernel, chunk=C, window=RW,
                               acc_dtype=acc_dtype)
    # edge arrays as [W, 1, S]: TPU block specs need the last two block dims
    # (8,128)-aligned or array-equal — a singleton middle dim satisfies that.
    w = plan.num_tiles
    e_src3 = plan.e_src_local.reshape(w, 1, S)
    e_dst3 = plan.e_dst_local.reshape(w, 1, S)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(w,),
        in_specs=[
            pl.BlockSpec((S, dim), lambda i, wd, ws: (ws[i], 0)),
            pl.BlockSpec((1, 1, S), lambda i, wd, ws: (i, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda i, wd, ws: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((S, dim), lambda i, wd, ws: (wd[i], 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.padded_dst, dim), acc_dtype),
        interpret=interpret,
    )(plan.ws_dst_block, plan.ws_src_block, x_padded, e_src3, e_dst3)


# ----------------------------------------------------------------------------
# backward SSpMM: sampled dvalues[v, j] += Σ_{v→u} w · g[u, channels[v, j]]
# ----------------------------------------------------------------------------

def _bwd_kernel(ws_dst_ref, ws_src_ref,
                g_ref, ch_ref, e_src_ref, e_dst_ref,
                out_ref, *, chunk: int, window: int, k_pad: int, acc_dtype):
    i = pl.program_id(0)

    @pl.when(_first_visit(i, ws_dst_ref))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    u_idx = e_src_ref[0, 0, :]                      # [S] — local id of u (dst
    #                                                 of the original edge)
    v_idx = e_dst_ref[0, 0, :]                      # [S] — local id of v

    g_rows = _gather_rows(g_ref[:], jnp.maximum(u_idx, 0))   # [S, dim]
    mask_f = (u_idx >= 0).astype(g_rows.dtype)      # f32: i1 minor-dim
    g_rows = g_rows * mask_f[:, None]               # reshapes don't lower
    ch_rows = _gather_rows(ch_ref[:], v_idx)        # [S, k_pad] channel ids

    dim = g_rows.shape[-1]
    # lane gather: sampled[t, j] = g_rows[t, ch_rows[t, j]] — pad indices to
    # [S, dim] (Mosaic requires idx shape == operand shape), keep first k_pad
    if dim > k_pad:
        ch_idx = jnp.pad(ch_rows, ((0, 0), (0, dim - k_pad)))
    else:
        ch_idx = ch_rows
    sampled = jnp.take_along_axis(g_rows, ch_idx, axis=1)[:, :k_pad]  # [S,k_pad]

    s = u_idx.shape[0]
    cpt = s // chunk
    for ci in range(cpt):
        lo = ci * chunk
        seg = sampled[lo:lo + chunk, :]             # [C, k_pad]
        rows = v_idx[lo:lo + chunk]
        w0 = jnp.minimum((e_dst_ref[0, 0, lo] // 8) * 8, s - window)
        w0 = pl.multiple_of(w0, 8)                  # 8-aligned window start
        rel = rows - w0
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (window, chunk), 0)
                  == rel[None, :]).astype(seg.dtype)
        contrib = jax.lax.dot_general(
            onehot, seg, (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype)        # [RW, k_pad]
        cur = out_ref[pl.ds(w0, window), :]
        out_ref[pl.ds(w0, window), :] = cur + contrib.astype(out_ref.dtype)


def sspmm_backward_planned(plan_t: TilePlan, g_padded: jax.Array,
                           channels_padded: jax.Array,
                           *, acc_dtype=jnp.float32,
                           interpret: bool = False) -> jax.Array:
    """Sampled backward over the TRANSPOSE plan (rows = original source v).

    g_padded: [plan_t.padded_src, dim] upstream cotangent (dst rows u).
    channels_padded: [plan_t.padded_dst, k_pad] int32 CBSR channel ids of v.
    Returns dvalues [plan_t.padded_dst, k_pad] in acc_dtype.
    """
    S, C, RW = plan_t.block_size, plan_t.chunk, plan_t.window
    dim = g_padded.shape[-1]
    k_pad = channels_padded.shape[-1]
    if dim % LANES or k_pad % LANES:
        raise ValueError(f"dim/k_pad must be multiples of {LANES}")
    if g_padded.shape[0] != plan_t.padded_src:
        raise ValueError("g rows mismatch")
    if channels_padded.shape[0] != plan_t.padded_dst:
        raise ValueError("channels rows mismatch")

    kernel = functools.partial(_bwd_kernel, chunk=C, window=RW, k_pad=k_pad,
                               acc_dtype=acc_dtype)
    w = plan_t.num_tiles
    e_src3 = plan_t.e_src_local.reshape(w, 1, S)
    e_dst3 = plan_t.e_dst_local.reshape(w, 1, S)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(w,),
        in_specs=[
            pl.BlockSpec((S, dim), lambda i, wd, ws: (ws[i], 0)),     # g
            pl.BlockSpec((S, k_pad), lambda i, wd, ws: (wd[i], 0)),   # channels
            pl.BlockSpec((1, 1, S), lambda i, wd, ws: (i, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda i, wd, ws: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((S, k_pad), lambda i, wd, ws: (wd[i], 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan_t.padded_dst, k_pad), acc_dtype),
        interpret=interpret,
    )(plan_t.ws_dst_block, plan_t.ws_src_block,
      g_padded, channels_padded, e_src3, e_dst3)
