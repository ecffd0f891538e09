"""End-to-end training smoke tests on tiny synthetic datasets: loss decreases,
accuracy beats chance, best-val protocol, and maxk vs relu paths both run."""
import numpy as np
import pytest

from spgemm_gnn_tpu.graphs.datasets import load_dataset
from spgemm_gnn_tpu.train.config import TrainConfig
from spgemm_gnn_tpu.train.loop import Trainer


def tiny_config(**kw):
    base = dict(dataset="flickr", model="sage", epochs=30, hidden_dim=32,
                hidden_layers=2, maxk=8, dropout=0.1, w_lr=0.01,
                nonlinear="relu", impl="xla", synthetic=True,
                synthetic_scale=0.004, eval_every=5, log_every=0)
    base.update(kw)
    return TrainConfig(**base)


@pytest.mark.parametrize("nonlinear", ["relu", "maxk"])
def test_sage_trains_on_synthetic_flickr(nonlinear):
    # tiny synthetic graphs don't generalise (random split, planted signal
    # destroyed by aggregation) — assert fit capability via train accuracy.
    cfg = tiny_config(nonlinear=nonlinear, epochs=80, dropout=0.0)
    tr = Trainer(cfg)
    res = tr.run()
    hist = res["history"]
    assert len(hist) >= 3
    assert hist[-1].loss < hist[0].loss  # learning happened
    assert hist[-1].train_acc > 0.8      # model can fit the train split
    assert 0 <= res["best_epoch"] < cfg.epochs


@pytest.mark.parametrize("model", ["gcn", "gin", "gnn_res", "sage_integrated"])
def test_other_models_train(model):
    cfg = tiny_config(model=model, nonlinear="maxk", norm=True, epochs=15)
    res = Trainer(cfg).run()
    assert res["history"][-1].loss < res["history"][0].loss


def test_multilabel_yelp_synthetic():
    cfg = tiny_config(dataset="yelp", synthetic_scale=0.0006, epochs=15,
                      nonlinear="maxk")
    tr = Trainer(cfg)
    assert tr.dataset.multilabel
    res = tr.run()
    assert res["best_test_accuracy"] > 0  # micro-F1 positive


def test_lookahead_and_weight_decay_run():
    cfg = tiny_config(enable_lookahead=True, w_weight_decay=1e-4, epochs=10)
    res = Trainer(cfg).run()
    assert np.isfinite(res["history"][-1].loss)


def test_selfloop_flag():
    cfg = tiny_config(selfloop=True, epochs=5)
    tr = Trainer(cfg)
    g = tr.g
    # every node has a self-loop
    import numpy as np
    a_src = np.asarray(g.indices)
    a_dst = np.asarray(g.edge_dst)
    loops = np.zeros(g.num_nodes, bool)
    loops[a_src[a_src == a_dst]] = True
    assert loops.all()


def test_pallas_impl_trains():
    """End-to-end Trainer with the Pallas aggregation path (interpret mode)."""
    cfg = tiny_config(nonlinear="maxk", impl="pallas", epochs=4, eval_every=2,
                      synthetic_scale=0.002, hidden_dim=16, maxk=4)
    from spgemm_gnn_tpu.kernels.planned import PlannedGraph
    tr = Trainer(cfg)
    assert isinstance(tr.g, PlannedGraph)
    res = tr.run()
    assert np.isfinite(res["history"][-1].loss)


def test_impl_trajectory_parity():
    """The Pallas aggregation path reproduces the XLA oracle's full training
    trajectory (same seed/init/data, dropout off): per-epoch losses match to
    float-reordering tolerance — the end-to-end kernel-correctness statement."""
    losses = {}
    for impl in ("xla", "pallas"):
        cfg = tiny_config(nonlinear="maxk", impl=impl, epochs=6, dropout=0.0,
                          eval_every=3, synthetic_scale=0.002, hidden_dim=16,
                          maxk=4)
        res = Trainer(cfg).run()
        losses[impl] = np.array([h.loss for h in res["history"]])
    np.testing.assert_allclose(losses["pallas"], losses["xla"],
                               rtol=2e-3, atol=2e-3)


def test_bf16_dtype_trains():
    cfg = tiny_config(dtype="bfloat16", epochs=6, eval_every=3)
    res = Trainer(cfg).run()
    assert np.isfinite(res["history"][-1].loss)
    assert res["history"][-1].loss < res["history"][0].loss


def test_steps_per_call_identical_trajectory():
    """Epoch batching (lax.scan over K train steps per dispatch, VERDICT r3
    #4) must produce EXACTLY the per-epoch history of unbatched stepping —
    the rng split sequence and eval/checkpoint boundaries are preserved."""
    from spgemm_gnn_tpu.train.config import from_args
    from spgemm_gnn_tpu.train.loop import Trainer
    base = ["--dataset", "flickr", "--synthetic", "--synthetic_scale",
            "0.004", "--model", "sage", "--maxk", "4", "--hidden_dim", "32",
            "--hidden_layers", "2", "--dropout", "0.5", "--epochs", "10",
            "--eval_every", "3", "--log_every", "0", "--path", "/tmp/spc_t"]
    r1 = Trainer(from_args(base + ["--steps_per_call", "1"])).run()
    r4 = Trainer(from_args(base + ["--steps_per_call", "4"])).run()
    h1 = [(r.epoch, r.loss, r.val_acc) for r in r1["history"]]
    h4 = [(r.epoch, r.loss, r.val_acc) for r in r4["history"]]
    assert h1 == h4
    assert r1["best_val_accuracy"] == r4["best_val_accuracy"]


def test_device_inputs_synthetic():
    """--device_inputs synthesizes features/labels on device (no host
    feature transfer — VERDICT r4 #3); the planted signal stays learnable
    and multilabel shapes hold."""
    from spgemm_gnn_tpu.graphs.datasets import device_synthetic_inputs
    from spgemm_gnn_tpu.train.config import TrainConfig
    from spgemm_gnn_tpu.train.loop import Trainer
    feat, labels = device_synthetic_inputs("flickr", 0.01, seed=0)
    assert feat.ndim == 2 and labels.shape == (feat.shape[0],)
    featm, labelsm = device_synthetic_inputs("yelp", 0.005, seed=0)
    assert labelsm.ndim == 2 and labelsm.shape[0] == featm.shape[0]
    cfg = TrainConfig(dataset="flickr", model="sage", epochs=12,
                      hidden_dim=32, hidden_layers=2, maxk=4, dropout=0.0,
                      w_lr=0.01, nonlinear="maxk", synthetic=True,
                      synthetic_scale=0.01, device_inputs=True,
                      eval_every=4, log_every=0)
    res = Trainer(cfg).run()
    assert res["history"][-1].train_acc > 0.5   # signal is learnable
