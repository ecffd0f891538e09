"""Non-vacuous multilabel learning gates (VERDICT r3 #6): the synthetic
multilabel signal must be RECOVERABLE by the actual models at their canonical
configs, so micro-F1 / ROC-AUC regressions in the BCE path gate loudly.

Strategy-baseline table for the yelp gate (50/50 labels):
  collapse (all-negative): micro-F1 0.0   — the observed failure mode
  random:                  micro-F1 0.50
  all-positive:            micro-F1 0.667 — the one trivial strategy above
                           the gate; it is loss-INCREASING under BCE from any
                           trained state, so no regression reaches it
  trained oracle plateau:  micro-F1 0.655 (150 epochs, scale 0.01)
"""
import numpy as np

from spgemm_gnn_tpu.train.config import from_args
from spgemm_gnn_tpu.train.loop import Trainer


def test_yelp_config_signal_is_recoverable():
    """The yelp-config oracle (SAGE 4x384, MaxK-16, BCE) clears micro-F1 0.55
    on the planted-margin signal — above random (0.50) and far above the
    collapse mode (0.0) that the r1-r3 construction produced."""
    cfg = from_args([
        "--dataset", "yelp", "--synthetic", "--synthetic_scale", "0.004",
        "--model", "sage", "--nonlinear", "maxk", "--maxk", "16",
        "--hidden_layers", "4", "--hidden_dim", "384", "--norm",
        "--dropout", "0.1", "--w_lr", "0.01", "--epochs", "60",
        "--eval_every", "10", "--log_every", "0", "--impl", "xla",
        "--path", "/tmp/gate_yelp"])
    r = Trainer(cfg).run()
    assert r["best_test_accuracy"] >= 0.55, r["best_test_accuracy"]


def test_proteins_config_signal_is_recoverable():
    """The proteins-config oracle (GNN_res 3x256, ReLU, BCE) beats ROC-AUC
    0.62 — well above the 0.50 of any constant/collapsed predictor (AUC is
    threshold-free, so there is no trivial strategy above 0.5)."""
    cfg = from_args([
        "--dataset", "ogbn-proteins", "--synthetic",
        "--synthetic_scale", "0.02",
        "--model", "gnn_res", "--nonlinear", "relu",
        "--hidden_layers", "3", "--hidden_dim", "256", "--norm",
        "--dropout", "0.25", "--w_lr", "0.01", "--epochs", "80",
        "--eval_every", "10", "--log_every", "0", "--impl", "xla",
        "--path", "/tmp/gate_prot"])
    r = Trainer(cfg).run()
    assert r["best_test_accuracy"] >= 0.62, r["best_test_accuracy"]


def test_multilabel_signal_linear_recoverability():
    """Construction sanity independent of any model: a ridge probe on the raw
    features recovers the planted labels (micro-F1 >= 0.85) — the signal is
    in the data; model-side gates above measure the training path."""
    from spgemm_gnn_tpu.graphs.datasets import _synthetic_dataset
    ds = _synthetic_dataset("yelp", scale=0.004, seed=0)
    X, Y, tr, te = ds.features, ds.labels, ds.train_mask, ds.test_mask
    Xt = np.c_[X[tr], np.ones(tr.sum())]
    W = np.linalg.solve(Xt.T @ Xt + 1e-2 * np.eye(Xt.shape[1]),
                        Xt.T @ (Y[tr] * 2 - 1))
    Z = np.c_[X[te], np.ones(te.sum())] @ W
    pred, yt = Z > 0, Y[te] > 0
    f1 = 2 * (pred & yt).sum() / max(pred.sum() + yt.sum(), 1)
    assert f1 >= 0.85, f1
