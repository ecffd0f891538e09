"""Optimizers — torch-parity Adam (+L2-in-gradient weight decay) and Lookahead.

The reference uses `torch.optim.Adam(lr, weight_decay)` (which adds wd·p to the
gradient *before* the moment updates — not decoupled AdamW) optionally wrapped
in a Lookahead meta-optimizer with alpha=0.5, k=6
(`/root/reference/utils/general_utils.py:108-157`,
`maxk_gnn_dgl.py:89-91`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def adam_l2(learning_rate: float, weight_decay: float = 0.0,
            b1: float = 0.9, b2: float = 0.999,
            eps: float = 1e-8) -> optax.GradientTransformation:
    """torch.optim.Adam parity: L2 folded into the gradient before moments."""
    txs = []
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    txs.append(optax.scale(-learning_rate))
    return optax.chain(*txs)


class LookaheadState(NamedTuple):
    inner: optax.OptState
    slow: optax.Params
    step: jax.Array


def lookahead(inner: optax.GradientTransformation, alpha: float = 0.5,
              k: int = 6) -> optax.GradientTransformation:
    """Lookahead wrapper operating on ordinary param pytrees.

    Every k steps the slow weights move toward the fast weights by alpha and
    the fast weights are reset to the slow weights — expressed as an extra
    delta folded into the update (no special param container, unlike
    optax.lookahead).
    """

    def init(params):
        # materialise a copy — slow must not alias params (donation safety)
        slow = jax.tree_util.tree_map(lambda p: jnp.array(p, copy=True), params)
        return LookaheadState(inner=inner.init(params), slow=slow,
                              step=jnp.zeros((), jnp.int32))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("lookahead requires params")
        inner_updates, inner_state = inner.update(updates, state.inner, params)
        step = state.step + 1
        sync = (step % k) == 0

        def new_update(fast_p, u, slow_p):
            slow_new = slow_p + alpha * (fast_p + u - slow_p)
            return jnp.where(sync, slow_new - fast_p, u)

        def new_slow(fast_p, u, slow_p):
            slow_new = slow_p + alpha * (fast_p + u - slow_p)
            return jnp.where(sync, slow_new, slow_p)

        tm = jax.tree_util.tree_map
        updates_out = tm(new_update, params, inner_updates, state.slow)
        slow_out = tm(new_slow, params, inner_updates, state.slow)
        return updates_out, LookaheadState(inner=inner_state, slow=slow_out,
                                           step=step)

    return optax.GradientTransformation(init, update)


def build_optimizer(lr: float, weight_decay: float = 0.0,
                    enable_lookahead: bool = False) -> optax.GradientTransformation:
    tx = adam_l2(lr, weight_decay)
    if enable_lookahead:
        tx = lookahead(tx)
    return tx
