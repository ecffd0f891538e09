"""Checkpoint/resume tests: save→restore roundtrip, resume continues training,
eval-only mode."""
import numpy as np
import pytest

from spgemm_gnn_tpu.train.config import TrainConfig
from spgemm_gnn_tpu.train.loop import Trainer
from spgemm_gnn_tpu.train import checkpoint as ckpt


def cfg(tmp, **kw):
    base = dict(dataset="flickr", model="sage", epochs=10, hidden_dim=16,
                hidden_layers=2, maxk=4, dropout=0.0, w_lr=0.01,
                nonlinear="maxk", impl="xla", synthetic=True,
                synthetic_scale=0.002, eval_every=2, log_every=0,
                path=str(tmp))
    base.update(kw)
    return TrainConfig(**base)


def test_save_restore_roundtrip(tmp_path):
    tr = Trainer(cfg(tmp_path))
    state = tr.init_state()
    p = ckpt.save_checkpoint(str(tmp_path), state, 3)
    restored = ckpt.restore_checkpoint(p, tr.init_state())
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_resume_continues(tmp_path):
    c1 = cfg(tmp_path, epochs=4, checkpoint_every=2)
    Trainer(c1).run()
    assert ckpt.latest_step(str(tmp_path)) == 4
    # resume to 8 epochs
    c2 = cfg(tmp_path, epochs=8, checkpoint_every=2, resume=True)
    res = Trainer(c2).run()
    # only 4 new epochs were run
    epochs_seen = [r.epoch for r in res["history"]]
    assert min(epochs_seen) >= 4
    assert ckpt.latest_step(str(tmp_path)) == 8


def test_best_checkpoint_saved_off_boundary(tmp_path):
    """The 'best' checkpoint must exist even when the best-val epoch does not
    land on a checkpoint_every boundary (ADVICE r1): the loop snapshots the
    state on every val improvement and writes 'best' at the end."""
    import os
    c = cfg(tmp_path, epochs=7, checkpoint_every=7, eval_every=1)
    res = Trainer(c).run()
    best_dir = os.path.join(str(tmp_path), "checkpoints", "best")
    assert res["best_epoch"] >= 0
    assert os.path.isdir(best_dir)


def test_evaluate_checkpoint(tmp_path):
    c = cfg(tmp_path, epochs=4, checkpoint_every=4)
    t = Trainer(c)
    t.run()
    tr_acc, va, te = t.evaluate_checkpoint(str(tmp_path))
    assert 0 <= tr_acc <= 1 and 0 <= va <= 1 and 0 <= te <= 1
