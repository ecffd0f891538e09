"""Feature store tests: correctness of fetches, cache policies, hit/miss stats
(reference cache strategies, maxk_gnn_dgl_new.py:41-389)."""
import numpy as np
import pytest

from spgemm_gnn_tpu.graphs.features import (
    DeviceFeatureStore, HostFeatureStore, make_feature_store,
)


@pytest.fixture
def feats(rng):
    return rng.standard_normal((100, 16)).astype(np.float32)


def test_device_store(feats):
    s = DeviceFeatureStore(feats)
    np.testing.assert_allclose(np.asarray(s.full()), feats, rtol=1e-6)
    ids = np.array([3, 7, 3, 99])
    np.testing.assert_allclose(np.asarray(s.fetch(ids)), feats[ids], rtol=1e-6)


def test_direct_policy_counts_misses(feats):
    s = HostFeatureStore(feats, policy="direct")
    out = s.fetch(np.array([1, 2, 3]))
    np.testing.assert_allclose(np.asarray(out), feats[1:4], rtol=1e-6)
    assert s.stats["misses"] == 3 and s.stats["hits"] == 0


def test_static_outd_policy(feats, rng):
    out_deg = rng.integers(0, 100, 100)
    s = HostFeatureStore(feats, policy="static-outd", cache_ratio=0.1,
                         out_degrees=out_deg)
    top10 = set(np.argsort(-out_deg, kind="stable")[:10].tolist())
    ids = np.arange(30)
    out = s.fetch(ids)
    np.testing.assert_allclose(np.asarray(out), feats[:30], rtol=1e-6)
    expected_hits = len(top10 & set(range(30)))
    assert s.stats["hits"] == expected_hits
    assert s.stats["misses"] == 30 - expected_hits
    # static: repeated fetch → same hit pattern
    s.reset_stats()
    s.fetch(ids)
    assert s.stats["hits"] == expected_hits


def test_fifo_eviction(feats):
    s = HostFeatureStore(feats, policy="fifo", cache_ratio=0.02)  # cap 2
    s.fetch(np.array([0]))       # miss, admit 0
    s.fetch(np.array([1]))       # miss, admit 1
    s.fetch(np.array([0]))       # hit
    assert s.stats["hits"] == 1
    s.fetch(np.array([2]))       # miss, evict 0 (FIFO head)
    s.fetch(np.array([0]))       # miss again
    assert s.stats["misses"] == 4


def test_lru_eviction(feats):
    s = HostFeatureStore(feats, policy="lru", cache_ratio=0.02)   # cap 2
    s.fetch(np.array([0]))
    s.fetch(np.array([1]))
    s.fetch(np.array([0]))       # refresh 0 → LRU order [1, 0]
    s.fetch(np.array([2]))       # evicts 1 (least recent)
    s.fetch(np.array([0]))       # hit (still cached)
    assert s.stats["hits"] == 2


def test_factory(feats, rng):
    assert isinstance(make_feature_store(feats), DeviceFeatureStore)
    s = make_feature_store(feats, policy="lru", cache_ratio=0.1)
    assert isinstance(s, HostFeatureStore)
    with pytest.raises(ValueError):
        HostFeatureStore(feats, policy="bogus")


def test_cache_actually_serves_bytes(feats, rng):
    """VERDICT r1 #6 'Done' criterion: host-gather bytes drop under
    static-outd on a skewed access pattern, and served values stay correct."""
    from spgemm_gnn_tpu.graphs.features import HostFeatureStore
    n, dim = feats.shape
    out_deg = np.arange(n)[::-1].copy()     # node 0 has the highest degree
    hot = np.arange(n // 10)                # = the top out-degree nodes
    rng_l = np.random.default_rng(9)
    # skewed pattern: 90% of accesses hit the hot set
    pattern = [np.where(rng_l.random(64) < 0.9,
                        rng_l.choice(hot, 64),
                        rng_l.integers(0, n, 64)) for _ in range(16)]

    cached = HostFeatureStore(feats, policy="static-outd", cache_ratio=0.1,
                              out_degrees=out_deg)
    direct = HostFeatureStore(feats, policy="direct")
    for ids in pattern:
        got = np.asarray(cached.fetch(ids))
        np.testing.assert_allclose(got, feats[ids], rtol=1e-6)
        direct.fetch(ids)
    assert cached.stats["hit_rate"] > 0.5
    assert cached.stats["bytes_from_host"] < direct.stats["bytes_from_host"]
    # hits must be served from the device buffer: transferred bytes account
    # exactly for the misses
    miss_bytes = cached.stats["misses"] * dim * 4
    assert cached.stats["bytes_from_host"] == miss_bytes


def test_lru_cache_serves_after_admission(feats):
    """A row fetched twice under LRU is transferred once (admit), then served
    from the device buffer."""
    from spgemm_gnn_tpu.graphs.features import HostFeatureStore
    st = HostFeatureStore(feats, policy="lru", cache_ratio=0.5)
    ids = np.array([1, 2, 3])
    st.fetch(ids)
    b0 = st.stats["bytes_from_host"]
    got = np.asarray(st.fetch(ids))
    np.testing.assert_allclose(got, feats[ids], rtol=1e-6)
    assert st.stats["bytes_from_host"] == b0   # pure cache hits: no transfer
    assert st.stats["hits"] >= 3
