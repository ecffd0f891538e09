"""Metric tests: micro-F1 (single/multi-label), ROC-AUC device vs numpy vs
first-principles, losses, optimizer parity."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from spgemm_gnn_tpu.train.losses import masked_bce, masked_softmax_ce
from spgemm_gnn_tpu.train.metrics import micro_f1, rocauc, rocauc_jax
from spgemm_gnn_tpu.train.optim import adam_l2, build_optimizer, lookahead


def test_micro_f1_single_label(rng):
    logits = jnp.asarray(rng.standard_normal((50, 5)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, 50))
    mask = jnp.asarray(rng.random(50) < 0.5)
    acc = float(micro_f1(logits, labels, mask))
    m = np.asarray(mask)
    expect = (np.asarray(logits).argmax(1) == np.asarray(labels))[m].mean()
    np.testing.assert_allclose(acc, expect, rtol=1e-6)


def test_micro_f1_multilabel(rng):
    logits = rng.standard_normal((60, 8)).astype(np.float32)
    labels = (rng.random((60, 8)) < 0.3).astype(np.float32)
    mask = rng.random(60) < 0.7
    got = float(micro_f1(jnp.asarray(logits), jnp.asarray(labels),
                         jnp.asarray(mask)))
    pred = logits[mask] > 0
    true = labels[mask] > 0.5
    tp = (true & pred).sum(); fp = (~true & pred).sum(); fn = (true & ~pred).sum()
    prec = tp / (tp + fp); rec = tp / (tp + fn)
    np.testing.assert_allclose(got, 2 * prec * rec / (prec + rec), rtol=1e-5)


def test_rocauc_device_matches_numpy(rng):
    logits = rng.standard_normal((80, 6)).astype(np.float32)
    labels = (rng.random((80, 6)) < 0.4).astype(np.float32)
    labels[:, 5] = 0.0  # class with no positives → skipped
    mask = rng.random(80) < 0.6
    a_np = rocauc(logits, labels, mask)
    a_dev = float(rocauc_jax(jnp.asarray(logits), jnp.asarray(labels),
                             jnp.asarray(mask)))
    np.testing.assert_allclose(a_dev, a_np, rtol=1e-5)


def test_rocauc_perfect_and_random():
    # perfectly separable
    logits = np.array([[-2.], [-1.], [1.], [2.]], np.float32)
    labels = np.array([[0.], [0.], [1.], [1.]], np.float32)
    mask = np.ones(4, bool)
    assert rocauc(logits, labels, mask) == 1.0
    assert float(rocauc_jax(jnp.asarray(logits), jnp.asarray(labels),
                            jnp.asarray(mask))) == 1.0
    # with ties everywhere → 0.5
    logits0 = np.zeros_like(logits)
    np.testing.assert_allclose(rocauc(logits0, labels, mask), 0.5)
    np.testing.assert_allclose(
        float(rocauc_jax(jnp.asarray(logits0), jnp.asarray(labels),
                         jnp.asarray(mask))), 0.5, rtol=1e-6)


def test_masked_ce_matches_indexing(rng):
    logits = rng.standard_normal((40, 5)).astype(np.float32)
    labels = rng.integers(0, 5, 40)
    mask = rng.random(40) < 0.5
    got = float(masked_softmax_ce(jnp.asarray(logits), jnp.asarray(labels),
                                  jnp.asarray(mask)))
    sub = optax.softmax_cross_entropy_with_integer_labels(
        jnp.asarray(logits[mask]), jnp.asarray(labels[mask])).mean()
    np.testing.assert_allclose(got, float(sub), rtol=1e-6)


def test_masked_bce_matches_indexing(rng):
    logits = rng.standard_normal((40, 6)).astype(np.float32)
    labels = (rng.random((40, 6)) < 0.5).astype(np.float32)
    mask = rng.random(40) < 0.5
    got = float(masked_bce(jnp.asarray(logits), jnp.asarray(labels),
                           jnp.asarray(mask)))
    sub = optax.sigmoid_binary_cross_entropy(
        jnp.asarray(logits[mask]), jnp.asarray(labels[mask])).mean()
    np.testing.assert_allclose(got, float(sub), rtol=1e-6)


# ---------------- optimizer ----------------

def test_adam_l2_matches_torch_adam():
    """One-param quadratic: compare against torch.optim.Adam trajectories."""
    torch = pytest.importorskip("torch")
    lr, wd, steps = 0.1, 0.01, 12
    x0 = 1.7

    p = torch.nn.Parameter(torch.tensor([x0]))
    opt = torch.optim.Adam([p], lr=lr, weight_decay=wd)
    for _ in range(steps):
        opt.zero_grad()
        (p ** 2).sum().backward()
        opt.step()
    torch_traj = float(p.detach()[0])

    tx = adam_l2(lr, wd)
    params = jnp.array([x0])
    state = tx.init(params)
    for _ in range(steps):
        grads = jax.grad(lambda q: (q ** 2).sum())(params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(float(params[0]), torch_traj, rtol=2e-4)


def test_lookahead_sync():
    """After k steps, params = slow + alpha·(fast−slow) per reference
    Lookahead.update_slow (utils/general_utils.py:126-137)."""
    inner = optax.sgd(0.1)
    tx = lookahead(inner, alpha=0.5, k=3)
    params = jnp.array([1.0])
    state = tx.init(params)
    hist = []
    for _ in range(6):
        grads = jnp.array([1.0])
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        hist.append(float(params[0]))
    # plain SGD would give 0.9, 0.8, 0.7, ...; at step 3 fast=0.7,
    # slow moves 1.0 → 0.85 and fast resets to 0.85
    np.testing.assert_allclose(hist[0], 0.9, rtol=1e-6)
    np.testing.assert_allclose(hist[2], 0.85, rtol=1e-6)   # synced
    np.testing.assert_allclose(hist[3], 0.75, rtol=1e-6)
    np.testing.assert_allclose(hist[5], 0.85 - 0.5 * (0.85 - 0.55), rtol=1e-6)
