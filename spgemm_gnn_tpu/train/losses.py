"""Losses — parity with the reference driver's choices
(`/root/reference/maxk_gnn_dgl.py:84-87`): CrossEntropy for single-label
datasets, BCE-with-logits for yelp / ogbn-proteins (multilabel).

Full-graph training with a boolean train mask is expressed as a masked mean
(identical to indexing `logits[train_mask]` but static-shape / jit-safe).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def masked_softmax_ce(logits: jax.Array, labels: jax.Array,
                      mask: jax.Array) -> jax.Array:
    per_node = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    m = mask.astype(per_node.dtype)
    return jnp.sum(per_node * m) / jnp.maximum(m.sum(), 1.0)


def masked_bce(logits: jax.Array, labels: jax.Array,
               mask: jax.Array) -> jax.Array:
    """Mean over all elements of the masked rows (torch
    binary_cross_entropy_with_logits default reduction)."""
    per_elem = optax.sigmoid_binary_cross_entropy(logits, labels)
    per_node = per_elem.mean(axis=-1)
    m = mask.astype(per_node.dtype)
    return jnp.sum(per_node * m) / jnp.maximum(m.sum(), 1.0)


def loss_fn(multilabel: bool):
    return masked_bce if multilabel else masked_softmax_ce
