"""Pallas TPU kernel: windowed sparse-matrix × dense-matrix multiply over a
TilePlan — the compute core of both the SpGEMM forward and the SSpMM backward.

TPU re-design of the reference CUDA pair (`spmm_kernel_opt2_sparse_v3` /
`spmm_kernel_opt2_sparse_backward_v3`, SURVEY.md §2.1 [bin]) — same math,
completely different machine mapping:

- the CUDA kernels use warp-partitioned edge lists (`.warp4` metadata),
  per-edge CBSR gathers from global memory, and atomic accumulation in shared
  memory;
- here a host-built TilePlan (graphs/tiles.py) gives a static 1-D grid of edge
  tiles bucketed by (dst block, src block). Per tile the kernel:
    1. receives the source-feature block via the Pallas pipeline (the BlockSpec
       index_map reads the scalar-prefetched `ws_src_block`, so HBM→VMEM DMA is
       double-buffered automatically — the shared-memory staging analogue).
       Features are stored TRANSPOSED [dim, N]: the per-edge row gather then
       runs along the 128-lane axis;
    2. gathers each 128-edge chunk's messages with a **slab-select gather**:
       Mosaic's `dynamic_gather` only shuffles within one vector register, so
       the [dim, B] block is treated as B/128 lane-slabs — one single-vreg
       `take_along_axis` per slab plus a select on (src_local // 128). Padding
       slots (src_local = -1) match no slab and vanish;
    3. reduces the chunk into its 8-aligned RW-row destination window with one
       [RW, C] × [C, dim] MXU contraction (one-hot destination matrix) — no
       atomics anywhere: each destination block is owned by consecutive grid
       steps (segment-reduce semantics, SURVEY.md §5.2).

The backward needs no second kernel: dvalues = take_along_axis(Aᵀ·g, channels)
(the dense transpose product is this same kernel on the transpose plan; the
[N, dim] intermediate is cheap on TPU, unlike the atomics-bound CUDA case —
see kernels/planned.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spgemm_gnn_tpu.graphs.tiles import CHUNK, TilePlan

LANES = 128


def _first_visit(i, pw_ref, nsrc: int):
    """True on the first grid step of each destination block. pw packs
    (dst_block * nsrc + src_block) in one int32 — one SMEM prefetch array
    instead of two, which doubles the max chunk count before the ~1 MB SMEM
    ceiling (full-Reddit scale needs ~152K chunks = 593 KB packed)."""
    prev = pw_ref[jnp.maximum(i - 1, 0)] // nsrc
    return jnp.logical_or(i == 0, pw_ref[i] // nsrc != prev)


def _slab_gather(xt, idx):
    """msgsT[d, j] = xt[d, idx[j]] for idx in [0, B); -1 gathers nothing.

    xt: [dim, B] (B a multiple of 128); idx: [C=128] int32.
    Returns [dim, C] in xt's dtype. One single-vreg lane gather + select per
    128-wide slab.

    The gather/accumulate runs entirely in the INTEGER domain (bitcast in,
    bitwise OR/AND-mask accumulate, bitcast out): float arithmetic here would
    flush or poison bf16x2 bit-packed words whose f32 interpretation is
    subnormal/NaN (the dominant case for MaxK-sparse features — ADVICE r1),
    and integer bitwise ops are as cheap as the FMA select on the VPU.
    """
    dim, b = xt.shape
    c = idx.shape[0]
    assert c == LANES
    lane = jnp.where(idx >= 0, idx % LANES, 0)
    lane2d = jnp.broadcast_to(lane[None, :], (dim, c))
    slab_id = idx // LANES                       # -1 for padding
    xt_i = jax.lax.bitcast_convert_type(xt, jnp.int32)
    out = jnp.zeros((dim, c), jnp.int32)
    for s in range(b // LANES):
        sub = jnp.take_along_axis(xt_i[:, s * LANES:(s + 1) * LANES], lane2d,
                                  axis=1)        # [dim, C] (bits)
        mask = -((slab_id == s).astype(jnp.int32))   # 0 or 0xFFFFFFFF
        out = out | (sub & mask[None, :])
    return jax.lax.bitcast_convert_type(out, xt.dtype)


def _unpack_bf16x2(packed_f32):
    """[dim/2, C] f32 whose bits hold two bf16 → two f32 planes (low, high).

    bf16's bits are the top 16 of f32, so plane_lo = bitcast(u << 16) and
    plane_hi = bitcast(u & 0xffff0000). All 32-bit ops (Mosaic-safe).
    """
    u = jax.lax.bitcast_convert_type(packed_f32, jnp.uint32)
    lo = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    hi = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)
    return lo, hi


def _spmm_kernel(pw_ref,                         # scalar prefetch (SMEM)
                 xt_ref, e_src_ref, e_dst_ref,   # VMEM blocks
                 out_ref, *, window: int, acc_dtype, mxu_dtype,
                 packed: bool, nsrc: int, branch_windows: tuple,
                 skip_empty: bool, pipeline: bool,
                 debug_variant: str | None = None):
    i = pl.program_id(0)

    @pl.when(_first_visit(i, pw_ref, nsrc))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xt = xt_ref[:]                               # [dim, B] (dim/2 if packed)
    r = out_ref.shape[0]
    slots = e_src_ref.shape[-1]
    # f32 operands at DEFAULT precision get truncated to bf16 on the MXU —
    # the f32 stream must be exact, so request full-precision passes (the
    # slab gather dominates runtime; the extra MXU passes are hidden)
    prec = (jax.lax.Precision.HIGHEST if mxu_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def dots(rows, msgs_t, wc, w0):
        """One chunk's scatter contraction: build the one-hot and issue the
        MXU dot(s) — VPU prep + MXU work, no output access."""
        rel = rows - w0                          # [C] in [0, wc)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (wc, CHUNK), 0)
                  == rel[None, :]).astype(mxu_dtype)
        if packed:
            # bf16x2 stream: one gather serves two dim-halves
            m_lo, m_hi = _unpack_bf16x2(msgs_t)
            return jnp.concatenate([
                jax.lax.dot_general(onehot, m_lo.astype(mxu_dtype),
                                    (((1,), (1,)), ((), ())),
                                    precision=prec,
                                    preferred_element_type=acc_dtype),
                jax.lax.dot_general(onehot, m_hi.astype(mxu_dtype),
                                    (((1,), (1,)), ((), ())),
                                    precision=prec,
                                    preferred_element_type=acc_dtype),
            ], axis=1)                            # [wc, dim]
        return jax.lax.dot_general(
            onehot, msgs_t.astype(mxu_dtype), (((1,), (1,)), ((), ())),
            precision=prec, preferred_element_type=acc_dtype)  # [wc, dim]

    def emit(rows, msgs_t, wc, w0):
        contrib = dots(rows, msgs_t, wc, w0)
        cur = out_ref[pl.ds(w0, wc), :]
        out_ref[pl.ds(w0, wc), :] = cur + contrib.astype(out_ref.dtype)

    if debug_variant is not None:
        # timing-only ablations (WRONG OUTPUT — never on a production path):
        # each removes one per-chunk term so on-chip A/B attributes the cost
        #   no_gather : slab gather → static slice
        #   cheap_onehot : one-hot build → scalar-broadcast compare
        #   no_dot    : MXU dots → reuse msgs (keeps gather + RMW shapes)
        #   static_rmw: window RMW at offset 0 (isolates dynamic addressing)
        #   no_rmw    : overwrite instead of read-add-write
        n_chunks = slots // CHUNK
        for ci in range(n_chunks):
            lo = ci * CHUNK
            idx = e_src_ref[0, 0, lo:lo + CHUNK]
            rows = e_dst_ref[0, 0, lo:lo + CHUNK]
            if debug_variant == "no_gather":
                msgs_t = xt[:, :CHUNK]
            else:
                msgs_t = _slab_gather(xt, idx)
            if debug_variant == "floor":
                # gather + one static store — the irreducible per-chunk floor
                h = msgs_t.shape[0]
                out_ref[pl.ds(0, h), pl.ds(0, CHUNK)] = msgs_t.astype(
                    out_ref.dtype)
                continue
            base = pl.multiple_of((e_dst_ref[0, 0, lo] // 8) * 8, 8)
            w0 = pl.multiple_of(jnp.minimum(base, r - window), 8)
            rel = (jnp.broadcast_to(rows[0] % window, (CHUNK,))
                   if debug_variant == "cheap_onehot" else rows - w0)
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (window, CHUNK), 0)
                      == rel[None, :]).astype(mxu_dtype)
            if debug_variant == "no_dot":
                half = msgs_t.astype(acc_dtype)
                contrib = jnp.concatenate(
                    [jnp.zeros((window - msgs_t.shape[0], CHUNK), acc_dtype),
                     half], axis=0)[:, :out_ref.shape[1]]
                contrib = jnp.pad(contrib,
                                  ((0, 0),
                                   (0, out_ref.shape[1] - contrib.shape[1])))
            elif packed:
                m_lo, m_hi = _unpack_bf16x2(msgs_t)
                contrib = jnp.concatenate([
                    jax.lax.dot_general(onehot, m_lo.astype(mxu_dtype),
                                        (((1,), (1,)), ((), ())),
                                        precision=prec,
                                        preferred_element_type=acc_dtype),
                    jax.lax.dot_general(onehot, m_hi.astype(mxu_dtype),
                                        (((1,), (1,)), ((), ())),
                                        precision=prec,
                                        preferred_element_type=acc_dtype),
                ], axis=1)
            else:
                contrib = jax.lax.dot_general(
                    onehot, msgs_t.astype(mxu_dtype), (((1,), (1,)), ((), ())),
                    precision=prec, preferred_element_type=acc_dtype)
            if debug_variant == "static_rmw":
                cur = out_ref[pl.ds(0, window), :]
                out_ref[pl.ds(0, window), :] = cur + contrib.astype(
                    out_ref.dtype)
            elif debug_variant == "no_rmw":
                out_ref[pl.ds(w0, window), :] = contrib.astype(out_ref.dtype)
            else:
                cur = out_ref[pl.ds(w0, window), :]
                out_ref[pl.ds(w0, window), :] = cur + contrib.astype(
                    out_ref.dtype)
        return

    if pipeline and len(branch_windows) == 1 and not skip_empty:
        # software-pipelined schedule (straight-line — constraint 8 in
        # docs/DESIGN.md forbids per-chunk branches): issue chunk ci+1's
        # slab gather (VPU) BETWEEN chunk ci's MXU dots and its window RMW,
        # so the gather overlaps the matmul instead of serialising behind it
        n_chunks = slots // CHUNK

        def gather_ci(ci):
            lo = ci * CHUNK
            return _slab_gather(xt, e_src_ref[0, 0, lo:lo + CHUNK])

        def w0_of(ci):
            base = (e_dst_ref[0, 0, ci * CHUNK] // 8) * 8
            return pl.multiple_of(jnp.minimum(base, r - window), 8)

        msgs = gather_ci(0)
        for ci in range(n_chunks):
            lo = ci * CHUNK
            rows = e_dst_ref[0, 0, lo:lo + CHUNK]
            w0 = w0_of(ci)
            contrib = dots(rows, msgs, window, w0)
            if ci + 1 < n_chunks:
                msgs = gather_ci(ci + 1)
            cur = out_ref[pl.ds(w0, window), :]
            out_ref[pl.ds(w0, window), :] = cur + contrib.astype(
                out_ref.dtype)
        return

    for ci in range(slots // CHUNK):
        lo = ci * CHUNK
        idx = e_src_ref[0, 0, lo:lo + CHUNK]     # [C]; -1 ⇒ padding

        # fully-padded chunks (first slot is padding ⇒ all are: real edges
        # lead every chunk) contribute nothing — skip their gather + matmul
        def _chunk(idx=idx, lo=lo):
            rows = e_dst_ref[0, 0, lo:lo + CHUNK]  # [C] absolute within block
            msgs_t = _slab_gather(xt, idx)         # [dim(/2), C]
            # 8-aligned chunk window base (planner contract: every row of the
            # chunk lies in [base, base + window))
            base = pl.multiple_of((e_dst_ref[0, 0, lo] // 8) * 8, 8)
            if len(branch_windows) == 1:
                w0 = pl.multiple_of(jnp.minimum(base, r - window), 8)
                emit(rows, msgs_t, window, w0)
            else:
                # span-class dispatch: the static plan window RW is sized for
                # the WORST chunk (λ·RW ≳ C), but hub-dense chunks — where the
                # edge mass is — span far fewer rows. Pay only for the class
                # the chunk actually needs; padding rows replicate the first
                # real row, so max(rows) is the true span top. Classes are
                # monotone (fits in wc ⇒ fits in 2wc since the clamped base
                # moves left by ≤ wc), so "first fitting class" is exact.
                hi = jnp.max(rows)
                prev_fits = None
                for wc in branch_windows:
                    w0c = pl.multiple_of(jnp.minimum(base, r - wc), 8)
                    if wc == branch_windows[-1]:
                        take = jnp.logical_not(prev_fits)
                    else:
                        fits = hi - w0c < wc
                        take = (fits if prev_fits is None else
                                jnp.logical_and(fits,
                                                jnp.logical_not(prev_fits)))
                        prev_fits = fits

                    @pl.when(take)
                    def _(rows=rows, msgs_t=msgs_t, wc=wc, w0c=w0c):
                        emit(rows, msgs_t, wc, w0c)

        if skip_empty:
            pl.when(idx[0] >= 0)(_chunk)
        else:
            _chunk()


def _densify_t_kernel(vals_ref, ch_ref, out_ref, *, k: int):
    """out[d, n] = Σ_j (ch[n, j] == d) · vals[n, j] for one column block."""
    vals = vals_ref[:]                            # [Bn, k_pad]
    ch = ch_ref[:]                                # [Bn, k_pad]
    dim = out_ref.shape[0]
    bn = vals.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (dim, bn), 0)
    # accumulate INTO out_ref per term: a fully-unrolled accumulator
    # expression keeps ~k live [block] temporaries and blows the scoped-VMEM
    # stack at k ≥ 64 (seen on-device)
    out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)
    for j in range(k):
        # static lane slice + reshape (mixed fancy indexing lowers to an
        # unsupported gather in Mosaic)
        ch_j = ch[:, j:j + 1].reshape(1, bn)
        v_j = vals[:, j:j + 1].reshape(1, bn).astype(out_ref.dtype)
        out_ref[:] = out_ref[:] + (iota == ch_j).astype(out_ref.dtype) * v_j


def densify_transpose(values: jax.Array, channels: jax.Array, dim: int,
                      n_cols: int, *, out_dtype=jnp.float32,
                      col_block: int = 512,
                      interpret: bool = False) -> jax.Array:
    """CBSR → transposed dense [dim, n_cols] as a Pallas kernel.

    One pass over the output entirely in VMEM — replaces the XLA scatter
    (ops.cbsr_to_dense) and a k-deep unfused compare-accumulate chain, both of
    which round-trip HBM per term.
    """
    n, k = values.shape
    while n_cols % col_block:
        col_block //= 2
    if col_block < 8:
        raise ValueError(f"n_cols={n_cols} has no usable column block")
    pad = n_cols - n
    if pad:
        values = jnp.pad(values, ((0, pad), (0, 0)))
        channels = jnp.pad(channels, ((0, pad), (0, 0)), constant_values=-1)
    k_pad = -(-k // LANES) * LANES
    if k_pad != k:
        values = jnp.pad(values, ((0, 0), (0, k_pad - k)))
        channels = jnp.pad(channels, ((0, 0), (0, k_pad - k)),
                           constant_values=-1)
    kernel = functools.partial(_densify_t_kernel, k=k)
    return pl.pallas_call(
        kernel,
        grid=(n_cols // col_block,),
        in_specs=[pl.BlockSpec((col_block, k_pad), lambda i: (i, 0)),
                  pl.BlockSpec((col_block, k_pad), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((dim, col_block), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((dim, n_cols), out_dtype),
        interpret=interpret,
    )(values, channels)


def _densify_rows_kernel(vals_ref, ch_ref, out_ref, *, k: int):
    """out[n, d] = Σ_j (ch[n, j] == d) · vals[n, j] for one row block —
    row-major sibling of _densify_t_kernel (the StreamPlan path consumes
    [N, dim] features)."""
    vals = vals_ref[:]                            # [Bn, k_pad]
    ch = ch_ref[:]                                # [Bn, k_pad]
    bn, dim = out_ref.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (bn, dim), 1)
    out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)   # liveness: see
    for j in range(k):                                     # _densify_t_kernel
        ch_j = ch[:, j:j + 1]                     # [Bn, 1]
        v_j = vals[:, j:j + 1].astype(out_ref.dtype)
        out_ref[:] = out_ref[:] + (iota == ch_j).astype(out_ref.dtype) * v_j


def densify_rows(values: jax.Array, channels: jax.Array, dim: int,
                 *, out_dtype=jnp.float32, row_block: int = 256,
                 interpret: bool = False) -> jax.Array:
    """CBSR → dense row-major [N, dim] as a Pallas kernel (one VMEM pass —
    replaces the XLA element scatter of ops.cbsr_to_dense, which dominates
    the explicit-CBSR forward at low degree)."""
    n, k = values.shape
    n_pad = -(-n // row_block) * row_block
    if n_pad != n:
        values = jnp.pad(values, ((0, n_pad - n), (0, 0)))
        channels = jnp.pad(channels, ((0, n_pad - n), (0, 0)),
                           constant_values=-1)
    k_pad = -(-k // LANES) * LANES
    if k_pad != k:
        values = jnp.pad(values, ((0, 0), (0, k_pad - k)))
        channels = jnp.pad(channels, ((0, 0), (0, k_pad - k)),
                           constant_values=-1)
    kernel = functools.partial(_densify_rows_kernel, k=k)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // row_block,),
        in_specs=[pl.BlockSpec((row_block, k_pad), lambda i: (i, 0)),
                  pl.BlockSpec((row_block, k_pad), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((row_block, dim), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, dim), out_dtype),
        interpret=interpret,
    )(values, channels)
    return out[:n]


def _sample_channels_kernel(z_ref, ch_ref, out_ref, *, k: int, k_pad: int):
    """out[n, j] = z[n, ch[n, j]] for one row block — one-hot contraction
    instead of an element gather (Mosaic has no cross-lane row gather)."""
    z = z_ref[:]                                  # [Bn, dim]
    ch = ch_ref[:]                                # [Bn, k_pad]
    bn, dim = z.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (bn, dim), 1)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (bn, k_pad), 1)
    out_ref[:] = jnp.zeros((bn, k_pad), out_ref.dtype)     # liveness: see
    for j in range(k):                                     # _densify_t_kernel
        onehot = (iota == ch[:, j:j + 1]).astype(z.dtype)   # [Bn, dim]
        v = jnp.sum(z * onehot, axis=1, keepdims=True)      # [Bn, 1]
        # place into column j via a column one-hot (lane-dim dynamic slices
        # need 128 alignment in Mosaic)
        out_ref[:] = out_ref[:] + v.astype(out_ref.dtype) * (
            iota_k == j).astype(out_ref.dtype)


def sample_channels(z: jax.Array, channels: jax.Array, *,
                    row_block: int = 256,
                    interpret: bool = False) -> jax.Array:
    """dv[n, j] = z[n, channels[n, j]] as a Pallas kernel — the SSpMM
    channel-sampling step (replaces jnp.take_along_axis, an element gather
    XLA lowers slowly at [N, k] scale)."""
    n, dim = z.shape
    k = channels.shape[1]
    n_pad = -(-n // row_block) * row_block
    if n_pad != n:
        z = jnp.pad(z, ((0, n_pad - n), (0, 0)))
        channels = jnp.pad(channels, ((0, n_pad - n), (0, 0)),
                           constant_values=-1)
    k_pad = -(-k // LANES) * LANES
    ch = channels
    if k_pad != k:
        ch = jnp.pad(channels, ((0, 0), (0, k_pad - k)), constant_values=-1)
    kernel = functools.partial(_sample_channels_kernel, k=k, k_pad=k_pad)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // row_block,),
        in_specs=[pl.BlockSpec((row_block, dim), lambda i: (i, 0)),
                  pl.BlockSpec((row_block, k_pad), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((row_block, k_pad), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, k_pad), z.dtype),
        interpret=interpret,
    )(z, ch)
    return out[:n, :k]


def _pack_bf16x2(xt: jax.Array) -> jax.Array:
    """[dim, N] f32 → [dim/2, N] f32 bit-packing rows (d, d + dim/2) as two
    bf16 in one 32-bit lane. One slab-gather then serves both dim halves."""
    h = xt.shape[0] // 2
    lo = jax.lax.bitcast_convert_type(
        xt[:h].astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    hi = jax.lax.bitcast_convert_type(
        xt[h:].astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type((hi << 16) | lo, jnp.float32)


def branch_windows_for(window: int, multiwindow: bool = True) -> tuple:
    """Span-class windows the kernel dispatches between: powers of two from
    64 up to the plan window. One class (no branching) when RW ≤ 64 — the
    dense-λ regime where every chunk already spans the whole window."""
    if not multiwindow or window <= 64:
        return (window,)
    bw, w = [], 64
    while w < window:
        bw.append(w)
        w *= 2
    bw.append(window)
    return tuple(bw)


def planned_spmm(plan: TilePlan, xt_padded: jax.Array,
                 *, acc_dtype=jnp.float32, mxu_dtype=None,
                 stream: str = "f32", interpret: bool = False,
                 multiwindow: bool = False,
                 skip_empty: bool = False,
                 pipeline: bool = True,
                 debug_variant: str | None = None) -> jax.Array:
    """y = A @ X over the plan, X given transposed.

    xt_padded: [dim, plan.padded_src] (any float dtype). Returns
    [plan.padded_dst, dim] in acc_dtype. Degree norms are NOT applied here —
    pre/post scale by node factors outside (separable, see ops/norms.py).

    stream: "f32" (exact) or "bf16x2" — two bf16 packed per 32-bit lane
    (Mosaic has no 16-bit gather); halves the gather/select work, the VMEM
    stream and the block DMA at bf16 precision.

    multiwindow: dispatch each chunk to the smallest span class that covers
    its rows (64/128/.../RW) instead of always paying the full RW-row one-hot
    matmul — the full-graph regime (large RW from λ collapse) is dominated by
    hub chunks whose true span is small.
    """
    S, B, R, RW = (plan.tile_slots, plan.src_block, plan.dst_block,
                   plan.window)
    dim = xt_padded.shape[0]
    if xt_padded.shape[1] != plan.padded_src:
        raise ValueError(f"xt cols {xt_padded.shape[1]} != padded_src "
                         f"{plan.padded_src}")
    if dim % 8:
        raise ValueError("dim must be a multiple of 8")

    packed = stream == "bf16x2"
    if packed:
        if dim % 16:
            raise ValueError("bf16x2 stream needs dim % 16 == 0")
        xt_padded = _pack_bf16x2(xt_padded.astype(jnp.float32))
        dim_blk = dim // 2
        # the packed planes are exactly representable in bf16 → bf16 MXU
        # operands are lossless relative to the stream
        mxu = mxu_dtype or jnp.bfloat16
    else:
        dim_blk = dim
        # the one-hot left operand is exact in bf16, so mxu_dtype=bf16 halves
        # the MXU passes at the cost of rounding the messages (the reference
        # runs TF32 matmuls — maxk_gnn_dgl.py:30)
        mxu = mxu_dtype or xt_padded.dtype
        if xt_padded.dtype.itemsize != 4:
            # the integer slab select gathers 32-bit lanes; 16-bit inputs
            # (bf16 model activations under --dtype bfloat16) ride as f32
            # while the MXU keeps the input's own precision
            xt_padded = xt_padded.astype(jnp.float32)

    # pack (dst block, src block) into ONE prefetched int32 per chunk —
    # scalar-prefetch arrays live in SMEM (~1 MB), and two separate arrays
    # exceeded it at the 114M-edge scale (151K chunks × 4 B × 2)
    nsrc = plan.padded_src // B
    ndst = plan.padded_dst // R
    if ndst * nsrc > 2**31 - 1:
        raise ValueError(f"packed chunk key overflows int32 "
                         f"({ndst} dst × {nsrc} src blocks)")
    pw = (plan.ws_dst_block.astype(jnp.int32) * nsrc
          + plan.ws_src_block.astype(jnp.int32))
    kernel = functools.partial(_spmm_kernel, window=RW, acc_dtype=acc_dtype,
                               mxu_dtype=mxu, packed=packed, nsrc=nsrc,
                               branch_windows=branch_windows_for(
                                   RW, multiwindow),
                               skip_empty=skip_empty, pipeline=pipeline,
                               debug_variant=debug_variant)
    w = plan.num_tiles
    # edge arrays as [W, 1, S]: TPU block specs need the last two block dims
    # (8,128)-aligned or array-equal — a singleton middle dim satisfies that.
    # Plans store slots as int16 (transfer size); widen to i32 on device.
    e_src3 = plan.e_src_local.astype(jnp.int32).reshape(w, 1, S)
    e_dst3 = plan.e_dst_local.astype(jnp.int32).reshape(w, 1, S)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(w,),
        in_specs=[
            pl.BlockSpec((dim_blk, B), lambda i, pwr: (0, pwr[i] % nsrc)),
            pl.BlockSpec((1, 1, S), lambda i, pwr: (i, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda i, pwr: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((R, dim), lambda i, pwr: (pwr[i] // nsrc, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.padded_dst, dim), acc_dtype),
        interpret=interpret,
    )(pw, xt_padded, e_src3, e_dst3)
