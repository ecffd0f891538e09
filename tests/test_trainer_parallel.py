"""Trainer on a multi-device mesh (8 virtual CPU devices): training runs,
losses finite and decreasing, and matches single-device training direction."""
import numpy as np
import pytest

from spgemm_gnn_tpu.train.config import TrainConfig
from spgemm_gnn_tpu.train.loop import Trainer


def cfg(**kw):
    base = dict(dataset="flickr", model="sage", epochs=12, hidden_dim=16,
                hidden_layers=2, maxk=4, dropout=0.0, w_lr=0.01,
                nonlinear="maxk", impl="xla", synthetic=True,
                synthetic_scale=0.003, eval_every=3, log_every=0)
    base.update(kw)
    return TrainConfig(**base)


@pytest.mark.parametrize("mesh", [2, 8])
def test_trainer_mesh_runs(mesh):
    tr = Trainer(cfg(mesh_shape=mesh))
    res = tr.run()
    hist = res["history"]
    assert np.isfinite(hist[-1].loss)
    assert hist[-1].loss < hist[0].loss


def test_mesh_matches_single_device_first_loss():
    """First-epoch loss must agree between 1-device and 8-device layouts
    (same seed, no dropout)."""
    r1 = Trainer(cfg(epochs=1, eval_every=1)).run()
    r8 = Trainer(cfg(epochs=1, eval_every=1, mesh_shape=8)).run()
    np.testing.assert_allclose(r1["history"][0].loss, r8["history"][0].loss,
                               rtol=1e-4)
    np.testing.assert_allclose(r1["history"][0].train_acc,
                               r8["history"][0].train_acc, rtol=1e-4)


def test_mesh_remat_matches_no_remat():
    """--remat composes with the mesh path (nn.remat inside shard_map'd
    aggregation) and stays numerically a no-op."""
    r0 = Trainer(cfg(epochs=2, eval_every=1, mesh_shape=4)).run()
    r1 = Trainer(cfg(epochs=2, eval_every=1, mesh_shape=4, remat=True)).run()
    for a, b in zip(r0["history"], r1["history"]):
        np.testing.assert_allclose(a.loss, b.loss, rtol=1e-6)


def test_mesh_bf16_mixed_precision_trains():
    """--dtype bfloat16 composes with the mesh path (bf16 activations through
    the shard_map'd exchange; f32 params/logits): losses finite + falling."""
    tr = Trainer(cfg(mesh_shape=4, dtype="bfloat16", impl="pallas",
                     epochs=8, eval_every=4))
    res = tr.run()
    hist = res["history"]
    assert np.isfinite(hist[-1].loss)
    assert hist[-1].loss < hist[0].loss
