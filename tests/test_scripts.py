"""Tests for the ops-facing scripts (golden-log accuracy comparator)."""
import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


SAMPLE_LOG = """Current process ID: 1
Parameters:
DATASET=flickr
MODEL=sage
NONLINEAR=relu
SEED=97

Training...
Epoch 0000/0002| Loss 2.2 | Train Accuracy 0.42 | Val Accuracy 0.42 | Test Accuracy 0.42 | Best val. Accuracy 0.4222 | Best test Accuracy 0.4211
Epoch 0001/0002| Loss 2.0 | Train Accuracy 0.45 | Val Accuracy 0.44 | Test Accuracy 0.44 | Best val. Accuracy 0.4431 | Best test Accuracy 0.4402
Total training time: 1.0s
Testing...
Test accuracy 0.4721
"""


def test_parse_reference_log(tmp_path):
    mod = _load("compare_to_reference_log")
    p = tmp_path / "ref.txt"
    p.write_text(SAMPLE_LOG)
    r = mod.parse_reference_log(str(p))
    assert r["best_test"] == 0.4402
    assert r["best_val"] == 0.4431
    assert r["final_test"] == 0.4721
    assert r["config"]["dataset"] == "flickr"
    assert r["config"]["seed"] == "97"
    assert r["epochs_logged"] == 2


def test_parse_run_results_json(tmp_path):
    mod = _load("compare_to_reference_log")
    p = tmp_path / "results.json"
    p.write_text(json.dumps({"best_val_accuracy": 0.5,
                             "best_test_accuracy": 0.44}))
    r = mod.parse_run(str(p))
    assert r["best_test"] == 0.44


def test_comparator_against_real_reference_logs():
    """When the reference checkout is present, the parser reproduces the
    SURVEY.md §6 numbers from the actual golden logs."""
    path = "/root/reference/log/flickr_seed97/sage_relu.txt"
    if not os.path.exists(path):
        import pytest
        pytest.skip("reference logs not available")
    mod = _load("compare_to_reference_log")
    r = mod.parse_reference_log(path)
    assert abs(r["best_test"] - 0.5341) < 1e-9   # SURVEY.md §6 flickr row
