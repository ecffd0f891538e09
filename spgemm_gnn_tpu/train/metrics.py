"""Evaluation metrics — parity with the reference (torch/ogb-free).

- `micro_f1`: reference `utils/general_utils.py:79-99` compute_micro_f1 —
  argmax accuracy for single-label (1-D int labels); micro-F1 with
  pred = logits > 0, true = labels > 0.5 for multilabel.
- `rocauc`: reference uses `ogb.Evaluator("rocauc")` for ogbn-proteins
  (`maxk_gnn_dgl.py:41-45`); reimplemented here: per-class ROC-AUC via the
  rank-statistic formulation, averaged over classes that have both positive and
  negative samples (ogb convention).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def micro_f1(logits: jax.Array, labels: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked accuracy (single-label) or micro-F1 (multilabel). jit-safe."""
    if labels.ndim == 1:
        correct = (jnp.argmax(logits, axis=-1) == labels) & mask
        return correct.sum() / jnp.maximum(mask.sum(), 1)
    pred = logits > 0
    true = labels > 0.5
    m = mask[:, None]
    tp = jnp.sum(true & pred & m)
    fp = jnp.sum(~true & pred & m)
    fn = jnp.sum(true & ~pred & m)
    denom = 2 * tp + fp + fn
    return jnp.where(denom > 0, 2 * tp / jnp.maximum(denom, 1), 0.0)


def rocauc(logits: np.ndarray, labels: np.ndarray, mask: np.ndarray) -> float:
    """Per-class ROC-AUC averaged over valid classes (host-side numpy).

    AUC_c = (Σ ranks of positives − P(P+1)/2) / (P·N), with average ranks for
    ties — equivalent to sklearn.roc_auc_score per column.
    """
    logits = np.asarray(logits)[mask]
    labels = np.asarray(labels)[mask]
    if labels.ndim == 1:
        labels = labels[:, None]
        logits = logits[:, None]
    aucs = []
    for c in range(labels.shape[1]):
        y = labels[:, c] > 0.5
        p = int(y.sum())
        n = y.shape[0] - p
        if p == 0 or n == 0:
            continue
        s = logits[:, c]
        # average ranks (ties)
        order = np.argsort(s, kind="mergesort")
        ranks = np.empty_like(order, dtype=np.float64)
        sorted_s = s[order]
        i = 0
        while i < len(sorted_s):
            j = i
            while j + 1 < len(sorted_s) and sorted_s[j + 1] == sorted_s[i]:
                j += 1
            ranks[order[i:j + 1]] = 0.5 * (i + j) + 1.0
            i = j + 1
        auc = (ranks[y].sum() - p * (p + 1) / 2.0) / (p * n)
        aucs.append(auc)
    return float(np.mean(aucs)) if aucs else 0.0


def rocauc_jax(logits: jax.Array, labels: jax.Array,
               mask: jax.Array) -> jax.Array:
    """jit-safe masked per-class ROC-AUC averaged over valid classes.

    Same statistic as `rocauc` (ogb "rocauc" for ogbn-proteins) but computed on
    device with static shapes: excluded rows are pushed to -inf so masked ranks
    are full-array ranks minus the excluded count; tied scores get average
    ranks via left/right searchsorted.
    """
    neg_inf = jnp.array(-jnp.inf, logits.dtype)
    s = jnp.where(mask[:, None], logits, neg_inf)        # [N, C]
    y = (labels > 0.5) & mask[:, None]                   # positives in mask
    n_mask = mask.sum()
    n_excl = s.shape[0] - n_mask

    def per_class(sc, yc):
        srt = jnp.sort(sc)
        left = jnp.searchsorted(srt, sc, side="left")
        right = jnp.searchsorted(srt, sc, side="right")
        avg_rank = (left + 1 + right) / 2.0              # 1-based average rank
        rank_within = avg_rank - n_excl                  # rank among masked
        p = yc.sum()
        n = n_mask - p
        auc = (jnp.sum(jnp.where(yc, rank_within, 0.0)) - p * (p + 1) / 2.0)
        auc = auc / jnp.maximum(p * n, 1)
        valid = (p > 0) & (n > 0)
        return jnp.where(valid, auc, 0.0), valid

    aucs, valid = jax.vmap(per_class, in_axes=(1, 1))(s, y)
    return jnp.sum(aucs) / jnp.maximum(valid.sum(), 1)


def accuracy_topk(logits: np.ndarray, labels: np.ndarray,
                  topk=(1,)) -> list[float]:
    """precision@k (reference utils/general_utils.py:59-77)."""
    maxk = max(topk)
    if labels.ndim > 1:
        labels = labels.argmax(1)
    pred = np.argsort(-logits, axis=1)[:, :maxk]
    correct = pred == labels[:, None]
    return [float(correct[:, :k].any(1).mean()) for k in topk]
