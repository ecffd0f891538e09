"""Pallas MaxK kernel — fused top-k masking without sorting.

TPU re-design of the reference's pivot-based `maxk_kernel`
(kernels/maxk_cuda_kernels.cu, "pivot-based top-k selection in shared memory",
README_INTEGRATED.md:133-135, SURVEY.md §2.1 [bin]). Like the CUDA kernel (and
the reference's `maxk_forward` binding), the forward returns the *dense masked*
output; the backward multiplies by the same mask.

Algorithm (per row, fully vectorised over a row block):
1. map floats to order-preserving uint32 bit patterns;
2. find the k-th largest value by 32-step binary search on the bit pattern
   (each step: one [B, dim] compare + row reduction) — the pivot;
3. resolve ties at the pivot by a 10-step binary search on the channel index,
   keeping the lowest-index ties (torch.topk tie order);
4. emit y = x · mask plus per-row (pivot, tie index bound) so the backward can
   recompute the mask in one pass — no O(N·dim) mask residual.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

MIN_INT = np.int32(-2147483648)  # 0x80000000 (plain scalar — jnp constants
#                                   captured by kernels break pallas_call)


def _ordered_keys(x: jax.Array) -> jax.Array:
    """Map float32 to int32 keys whose *unsigned* order equals float order.

    For f >= 0 the pattern needs the sign bit set; for f < 0 the pattern is
    bitwise-complemented. We keep keys in "unsigned-pattern" form and compare
    via the signed trick a <_u b  ⇔  (a ^ MIN_INT) < (b ^ MIN_INT).
    """
    b = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    return jnp.where(b < 0, ~b, b ^ MIN_INT)


def _u_ge(a: jax.Array, b) -> jax.Array:
    """Unsigned >= on int32 bit patterns."""
    return (a ^ MIN_INT) >= (b ^ MIN_INT)


def _row_mask(keys: jax.Array, k: int) -> jax.Array:
    """Boolean top-k mask per row of `keys` (uint-pattern int32 [B, dim])."""
    bdim = keys.shape
    dim = bdim[-1]

    # step 2: binary search the pivot (k-th largest pattern) bit by bit
    t = jnp.zeros(bdim[:-1] + (1,), jnp.int32)     # [B, 1] candidate pattern
    for bit in range(31, -1, -1):
        cand = t | jnp.int32(1 << bit) if bit < 31 else t | MIN_INT
        cnt = jnp.sum(_u_ge(keys, cand), axis=-1, keepdims=True)
        t = jnp.where(cnt >= k, cand, t)

    greater = ~_u_ge(t, keys)                      # keys >_u t
    g_cnt = jnp.sum(greater, axis=-1, keepdims=True)
    ties = keys == t

    # step 3: tie resolution on channel index (keep lowest indices); the
    # search must span [0, dim] so the bound can include the last channel
    iota = jax.lax.broadcasted_iota(jnp.int32, bdim, len(bdim) - 1)
    c = jnp.zeros_like(t)
    budget = k - g_cnt
    for bit in range(int(dim).bit_length(), -1, -1):
        cand = c | jnp.int32(1 << bit)
        cnt = jnp.sum(ties & (iota < cand), axis=-1, keepdims=True)
        c = jnp.where(cnt <= budget, cand, c)

    return greater | (ties & (iota < c)), t, c


def _maxk_kernel(x_ref, y_ref, meta_ref, *, k: int):
    x = x_ref[:]
    keys = _ordered_keys(x)
    mask, t, c = _row_mask(keys, k)
    y_ref[:] = x * mask.astype(x.dtype)
    b = x.shape[0]
    meta = jnp.concatenate(
        [jnp.broadcast_to(t, (b, 64)), jnp.broadcast_to(c, (b, 64))], axis=-1)
    meta_ref[:] = meta


def _mask_from_meta(x: jax.Array, meta: jax.Array) -> jax.Array:
    """Recompute the forward mask from (pivot, index bound) — one pass."""
    keys = _ordered_keys(x)
    t = meta[:, :1]
    c = meta[:, 64:65]
    greater = ~_u_ge(t, keys)
    ties = keys == t
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return greater | (ties & (iota < c))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def maxk_pallas(x: jax.Array, k: int, block: int = 1024,
                interpret: bool | None = None) -> jax.Array:
    """MaxK via the Pallas kernel: y = x * topk_mask(x). Exact reference
    semantics (utils/models.py:12-26) including lowest-index tie-breaking."""
    return _maxk_fwd(x, k, block, interpret)[0]


def _maxk_call(x, k, block, interpret):
    n, dim = x.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_pad = -(-n // block) * block
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    y, meta = pl.pallas_call(
        functools.partial(_maxk_kernel, k=k),
        grid=(n_pad // block,),
        in_specs=[pl.BlockSpec((block, dim), lambda i: (i, 0))],
        out_specs=(pl.BlockSpec((block, dim), lambda i: (i, 0)),
                   pl.BlockSpec((block, 128), lambda i: (i, 0))),
        out_shape=(jax.ShapeDtypeStruct((n_pad, dim), x.dtype),
                   jax.ShapeDtypeStruct((n_pad, 128), jnp.int32)),
        interpret=interpret,
    )(x)
    return y[:n], meta[:n]


def _maxk_fwd(x, k, block, interpret):
    if k >= x.shape[-1]:
        return x, None
    y, meta = _maxk_call(x, k, block, interpret)
    return y, (x, meta)


def _maxk_bwd(k, block, interpret, res, g):
    if res is None:
        return (g,)
    x, meta = res
    mask = _mask_from_meta(x, meta)
    return (g * mask.astype(g.dtype),)


maxk_pallas.defvjp(_maxk_fwd, _maxk_bwd)


# ---------------------------------------------------------------------------
# CBSR compaction: masked dense [N, dim] → (values [N, k], channels [N, k])
# ---------------------------------------------------------------------------
# The reference's maxk_kernel emits `sp_data` + `sp_index` (CBSR) directly
# (kernels/maxk_cuda_kernels.cu, SURVEY.md §2.1 [bin]); our XLA construction
# `ops.maxk.cbsr_from_masked` instead pays a second lax.top_k (on the nonzero
# indicator) plus sort plus gather per layer. This kernel does the extraction
# as pure compaction — x is already MaxK-masked, so the channels are just the
# nonzero lanes in ascending order:
#
# per row, k iterations of "take the lowest-keyed remaining lane":
#   key = channel            for nonzero lanes
#   key = dim + channel      for zero lanes (pad channels, lowest-index zeros,
#                            same distinct-channel padding as the XLA oracle)
#   c = min(key); emit (channel = c mod dim, value = Σ x·onehot(c)); kill c.
#
# Channel distinctness (each lane selected at most once) is what makes the
# gather VJP a plain scatter — see _cbsr_compact_bwd.

LANES = 128


def _cbsr_compact_kernel(x_ref, val_ref, ch_ref, *, k: int, dim: int,
                         k_pad: int):
    x = x_ref[:]                                        # [B, dim_pad]
    b, dim_pad = x.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, dim_pad), 1)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (b, k_pad), 1)
    # selection keys: nonzero lanes first (ascending channel), then zero lanes
    # (ascending); lane-padding beyond `dim` is never selectable
    key = jnp.where(x != 0, iota, dim + iota)
    if dim_pad != dim:
        key = jnp.where(iota < dim, key, 3 * dim_pad)
    vals = jnp.zeros((b, k_pad), val_ref.dtype)
    chans = jnp.zeros((b, k_pad), jnp.int32)
    for j in range(k):
        c = jnp.min(key, axis=1, keepdims=True)         # [B, 1]
        hit = key == c                                  # [B, dim_pad] one-hot
        v = jnp.sum(jnp.where(hit, x, 0.0), axis=1, keepdims=True)
        key = jnp.where(hit, 3 * dim_pad, key)          # kill the taken lane
        slot = (iota_k == j)
        chans = chans + jnp.where(slot, c - (c >= dim) * dim, 0)
        vals = vals + jnp.where(slot, v.astype(val_ref.dtype), 0.0)
    val_ref[:] = vals
    ch_ref[:] = chans


def _cbsr_compact_call(x, k, block, interpret):
    n, dim = x.shape
    if block is None:
        # scoped-VMEM liveness grows with the unrolled k loop (same hazard as
        # spgemm_pallas._densify_t_kernel); halve the row block past k=32
        block = 512 if k <= 32 else 256
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_pad = -(-n // block) * block
    dim_pad = -(-dim // LANES) * LANES
    if (n_pad, dim_pad) != (n, dim):
        x = jnp.pad(x, ((0, n_pad - n), (0, dim_pad - dim)))
    k_pad = -(-k // LANES) * LANES
    kernel = functools.partial(_cbsr_compact_kernel, k=k, dim=dim,
                               k_pad=k_pad)
    vals, chans = pl.pallas_call(
        kernel,
        grid=(n_pad // block,),
        in_specs=[pl.BlockSpec((block, dim_pad), lambda i: (i, 0))],
        out_specs=(pl.BlockSpec((block, k_pad), lambda i: (i, 0)),
                   pl.BlockSpec((block, k_pad), lambda i: (i, 0))),
        out_shape=(jax.ShapeDtypeStruct((n_pad, k_pad), x.dtype),
                   jax.ShapeDtypeStruct((n_pad, k_pad), jnp.int32)),
        interpret=interpret,
    )(x)
    return vals[:n, :k], chans[:n, :k]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def cbsr_compact_pallas(x: jax.Array, k: int, block: int | None = None,
                        interpret: bool | None = None
                        ) -> tuple[jax.Array, jax.Array]:
    """CBSR of an already-MaxK-masked x — Pallas drop-in for
    `ops.maxk.cbsr_from_masked` (same contract: ≤ k nonzeros per row in, k
    distinct channels out, deficient rows padded with zero-valued channels;
    pad ORDER differs — nonzeros first here, merged-ascending in the oracle —
    which no consumer observes: densify/sample/exchange are order-free).

    Gradient caveat (ADVICE r2): on deficient rows the per-SLOT gradient of
    `values` differs from the oracle's under an order-sensitive cotangent,
    because the pad slots sit at different positions. Gradients are equivalent
    only through order-invariant consumers (any scatter/densify of the slots —
    i.e. everything in this repo); tests/test_maxk_pallas.py asserts grad
    parity through cbsr_to_dense, the contract future callers must keep.
    """
    return _cbsr_compact_fwd(x, k, block, interpret)[0]


def _cbsr_compact_fwd(x, k, block, interpret):
    out = _cbsr_compact_call(x, k, block, interpret)
    return out, (out[1], x.shape[-1])


def _cbsr_compact_bwd(k, block, interpret, res, g):
    channels, dim = res
    dvals = g[0]
    # values = x[rows, channels] with distinct channels ⇒ dx is the scatter of
    # dvals back to those channels (exactly the oracle take_along_axis VJP)
    from spgemm_gnn_tpu.ops.maxk import cbsr_to_dense
    return (cbsr_to_dense(dvals, channels, dim),)


cbsr_compact_pallas.defvjp(_cbsr_compact_fwd, _cbsr_compact_bwd)
