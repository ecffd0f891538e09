"""Dataset loader tests: npz roundtrip, proteins edge-feature sum, multilabel
flags, synthetic fallback."""
import numpy as np
import pytest

from spgemm_gnn_tpu.graphs.datasets import (
    DATASETS, MULTILABEL, SYNTH_SPECS, load_dataset,
)


def _write_npz(tmp_path, name, n=50, e=300, f=8, c=5, multilabel=False,
               proteins=False):
    rng = np.random.default_rng(0)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    payload = dict(
        edge_src=src.astype(np.int64), edge_dst=dst.astype(np.int64),
        train_mask=(rng.random(n) < 0.6),
        val_mask=(rng.random(n) < 0.2),
        test_mask=(rng.random(n) < 0.2),
        num_classes=np.int64(c),
    )
    if proteins:
        payload["edge_feat"] = rng.standard_normal((e, 8)).astype(np.float32)
        payload["label"] = (rng.random((n, c)) < 0.5).astype(np.float32)
    else:
        payload["feat"] = rng.standard_normal((n, f)).astype(np.float32)
        if multilabel:
            payload["label"] = (rng.random((n, c)) < 0.5).astype(np.float32)
        else:
            payload["label"] = rng.integers(0, c, n).astype(np.int64)
    path = tmp_path / f"{name.replace('-', '_')}.npz"
    np.savez(path, **payload)
    return payload


def test_npz_roundtrip_single_label(tmp_path):
    p = _write_npz(tmp_path, "flickr")
    ds = load_dataset("flickr", str(tmp_path))
    assert ds.graph.num_nodes == 50 and ds.graph.num_edges == 300
    np.testing.assert_allclose(ds.features, p["feat"])
    assert ds.labels.dtype == np.int64 and ds.labels.ndim == 1
    assert not ds.multilabel and ds.num_classes == 5


def test_npz_yelp_multilabel(tmp_path):
    _write_npz(tmp_path, "yelp", c=7, multilabel=True)
    ds = load_dataset("yelp", str(tmp_path))
    assert ds.multilabel
    assert ds.labels.shape == (50, 7) and ds.labels.dtype == np.float32


def test_proteins_edge_feature_sum(tmp_path):
    """Node features = sum of incident in-edge features (reference
    utils/proteins_loader.py:42-44 semantics)."""
    p = _write_npz(tmp_path, "ogbn-proteins", c=112, proteins=True)
    ds = load_dataset("ogbn-proteins", str(tmp_path))
    assert ds.features.shape == (50, 8)
    expect = np.zeros((50, 8), np.float32)
    np.add.at(expect, p["edge_dst"], p["edge_feat"])
    np.testing.assert_allclose(ds.features, expect, rtol=1e-5)
    assert ds.multilabel


def test_selfloop_transform(tmp_path):
    _write_npz(tmp_path, "flickr")
    ds = load_dataset("flickr", str(tmp_path), self_loop=True)
    src = np.asarray(ds.graph.indices)
    dst = np.asarray(ds.graph.edge_dst)
    loops = np.zeros(ds.num_nodes, bool)
    loops[src[src == dst]] = True
    assert loops.all()


def test_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="convert_to_npz"):
        load_dataset("reddit", str(tmp_path))


def test_unknown_dataset_raises():
    with pytest.raises(ValueError):
        load_dataset("bogus")


@pytest.mark.parametrize("name", ["flickr", "yelp"])
def test_synthetic_fallback(name, tmp_path):
    ds = load_dataset(name, str(tmp_path), allow_synthetic=True,
                      synthetic_scale=0.003)
    assert ds.multilabel == (name in MULTILABEL)
    assert ds.num_classes == SYNTH_SPECS[name]["c"]
    assert ds.features.shape[1] == SYNTH_SPECS[name]["f"]
    assert (ds.train_mask | ds.val_mask | ds.test_mask).all()
