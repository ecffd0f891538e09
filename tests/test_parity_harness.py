"""One-command real-data parity harness (VERDICT r3 #7): exercised end-to-end
in CI on a fabricated mini npz dataset + mini golden log, so the day the real
npz files exist, `scripts/run_parity.sh ./data` is a rerun, not a build."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GOLDEN_TMPL = """DATASET=flickr
MODEL=sage
NONLINEAR=maxk
MAXK=32
HIDDEN_DIM=256
HIDDEN_LAYERS=3
SEED=97
Epoch 0009/0010| Loss 0.5 | Train Accuracy 0.9 | Val Accuracy 0.5 | Test Accuracy 0.5 | Best val. Accuracy {val} | Best test Accuracy {test}
Test accuracy {test}
"""


def _mini_npz(path, n=300, f=32, c=4, seed=0):
    """Fabricate a dataset in the datasets.py npz interchange schema."""
    rng = np.random.default_rng(seed)
    e = 6 * n
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    feat = rng.standard_normal((n, f)).astype(np.float32)
    labels = rng.integers(0, c, n).astype(np.int64)
    feat[:, :8] += 2.5 * rng.standard_normal((c, 8)).astype(np.float32)[labels]
    idx = rng.permutation(n)
    masks = {}
    for name, sl in (("train_mask", slice(0, int(0.6 * n))),
                     ("val_mask", slice(int(0.6 * n), int(0.8 * n))),
                     ("test_mask", slice(int(0.8 * n), n))):
        m = np.zeros(n, bool)
        m[idx[sl]] = True
        masks[name] = m
    np.savez(path, edge_src=src, edge_dst=dst, feat=feat, label=labels,
             num_classes=np.int64(c), **masks)


def test_comparator_detects_mismatch(tmp_path):
    """compare_to_reference_log must FAIL on an out-of-tolerance delta —
    the harness gate is non-vacuous."""
    golden = tmp_path / "golden.txt"
    golden.write_text(GOLDEN_TMPL.format(val=0.9, test=0.9))
    run = tmp_path / "results.json"
    run.write_text(json.dumps({"best_val_accuracy": 0.5,
                               "best_test_accuracy": 0.5}))
    p = subprocess.run(
        [sys.executable, "scripts/compare_to_reference_log.py",
         "--reference", str(golden), "--run", str(run)],
        cwd=REPO, capture_output=True, text=True)
    assert p.returncode == 1, p.stdout + p.stderr
    out = json.loads(p.stdout)
    assert out["pass"] is False and abs(out["delta"] + 0.4) < 1e-6


def test_run_parity_end_to_end(tmp_path):
    """run_parity.sh on the fabricated mini flickr: convert-skip → train at
    the canonical launcher (epochs overridden) → comparator PASS, rc=0."""
    data = tmp_path / "data"
    data.mkdir()
    _mini_npz(data / "flickr.npz")
    golden_dir = tmp_path / "golden"
    golden_dir.mkdir()
    (golden_dir / "flickr.txt").write_text(GOLDEN_TMPL.format(val=0.5,
                                                              test=0.5))
    env = dict(os.environ, PARITY_DATASETS="flickr",
               GOLDEN_DIR=str(golden_dir), TOLERANCE="1.0",
               RUN_ROOT=str(tmp_path / "run"))
    p = subprocess.run(
        ["bash", "scripts/run_parity.sh", str(data),
         "--epochs", "3", "--hidden_dim", "16", "--hidden_layers", "2",
         "--maxk", "4", "--eval_every", "1", "--log_every", "0"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert p.returncode == 0, p.stdout[-3000:] + p.stderr[-3000:]
    assert "flickr: PASS" in p.stdout
    res = json.loads((tmp_path / "run" / "flickr_seed97" /
                      "results.json").read_text())
    assert np.isfinite(res["best_test_accuracy"])


def test_run_parity_skips_missing_data(tmp_path):
    """With no npz present the harness reports SKIP (rc=3: nothing ran) —
    never a false PASS."""
    env = dict(os.environ, PARITY_DATASETS="reddit")
    p = subprocess.run(
        ["bash", "scripts/run_parity.sh", str(tmp_path)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    assert p.returncode == 3, p.stdout + p.stderr
    assert "reddit: SKIP" in p.stdout
