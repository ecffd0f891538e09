"""Minibatch inference: L-hop subgraph exactness vs the full-graph forward,
and the feature store actually serving the fetch (VERDICT r1 #6)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spgemm_gnn_tpu.graphs.features import DeviceFeatureStore, HostFeatureStore
from spgemm_gnn_tpu.graphs.synthetic import powerlaw_graph
from spgemm_gnn_tpu.models.models import build_model
from spgemm_gnn_tpu.train.infer import khop_in_subgraph, predict_nodes

N, IN_DIM, HID, OUT, LAYERS = 120, 8, 16, 4, 2


@pytest.fixture(scope="module")
def setup():
    g = powerlaw_graph(N, 700, seed=17)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((N, IN_DIM)).astype(np.float32)
    model = build_model("sage", hidden_dim=HID, num_layers=LAYERS,
                        out_dim=OUT, maxk=4, feat_drop=0.0, use_norm=True,
                        nonlinear="maxk", impl="xla")
    variables = model.init(jax.random.PRNGKey(0), g, jnp.asarray(x),
                           train=False)
    return g, x, model, variables["params"]


@pytest.mark.parametrize("norm_model", ["sage", "gcn"])
def test_subgraph_inference_exact(setup, norm_model):
    """predict_nodes == full-graph forward at the seed rows — including GCN,
    whose symmetric norm needs the GLOBAL degrees carried into the subgraph."""
    g, x, _, _ = setup
    model = build_model(norm_model, hidden_dim=HID, num_layers=LAYERS,
                        out_dim=OUT, maxk=4, feat_drop=0.0, use_norm=True,
                        nonlinear="maxk", impl="xla")
    params = model.init(jax.random.PRNGKey(1), g, jnp.asarray(x),
                        train=False)["params"]
    full = np.asarray(model.apply({"params": params}, g, jnp.asarray(x),
                                  train=False))
    seeds = np.array([3, 40, 77, 101])
    store = DeviceFeatureStore(x)
    got = np.asarray(predict_nodes(model, params, g, store, seeds,
                                   hops=LAYERS))
    np.testing.assert_allclose(got, full[np.unique(seeds)],
                               rtol=1e-4, atol=1e-5)


def test_khop_closure_contains_neighbors(setup):
    g, _, _, _ = setup
    sub, nodes, pos = khop_in_subgraph(g, [5], 2)
    indptr = np.asarray(g.indptr)
    indices = np.asarray(g.indices)
    one_hop = set(indices[indptr[5]:indptr[6]].tolist()) | {5}
    assert one_hop.issubset(set(nodes.tolist()))
    assert nodes[pos[0]] == 5


@pytest.mark.parametrize("symmetric", [True, False])
def test_khop_csr_matches_from_edges(symmetric):
    """The direct CSR construction (VERDICT r2 #8 vectorisation) must equal
    from_edges on the same edge list — both transpose regimes (the filtered
    global-t scan and the argsort fallback) and the hop edge cases."""
    from spgemm_gnn_tpu.graphs.csr import from_edges
    from spgemm_gnn_tpu.graphs.synthetic import random_graph
    g = random_graph(300, 2500, seed=7, symmetric=symmetric)
    seeds = np.random.default_rng(2).choice(300, 25, replace=False)
    for hops in (1, 2, 3, 4):      # 3-4 saturate the closure on this graph
        sub, nodes, pos = khop_in_subgraph(g, seeds, hops)
        assert (nodes[pos] == np.unique(seeds)).all()
        ref = from_edges(np.asarray(sub.indices), np.asarray(sub.edge_dst),
                         sub.num_nodes, symmetric=False)
        for f in ("indptr", "indices", "edge_dst",
                  "t_indptr", "t_indices", "t_edge_dst"):
            a, b = np.asarray(getattr(sub, f)), np.asarray(getattr(ref, f))
            assert a.shape == b.shape and (a == b).all(), (symmetric, hops, f)
    sub0, nodes0, _ = khop_in_subgraph(g, seeds, 0)
    assert sub0.num_edges == 0
    assert (nodes0 == np.unique(seeds)).all()


def test_predict_through_cached_store(setup):
    """The minibatch path exercises the device cache: repeated batches over
    hot nodes transfer less than a direct store."""
    g, x, model, params = setup
    out_deg = np.asarray(g.out_degrees)
    cached = HostFeatureStore(x, policy="static-outd", cache_ratio=0.5,
                              out_degrees=out_deg)
    direct = HostFeatureStore(x, policy="direct")
    full = np.asarray(model.apply({"params": params}, g, jnp.asarray(x),
                                  train=False))
    seeds = np.argsort(-out_deg)[:4]   # hot nodes: neighborhoods mostly cached
    for _ in range(3):
        got = np.asarray(predict_nodes(model, params, g, cached, seeds,
                                       hops=LAYERS))
        np.asarray(predict_nodes(model, params, g, direct, seeds,
                                 hops=LAYERS))
    np.testing.assert_allclose(got, full[np.unique(seeds)], rtol=1e-4,
                               atol=1e-5)
    assert cached.stats["bytes_from_host"] < direct.stats["bytes_from_host"]
    assert cached.stats["hit_rate"] > 0.3


def test_trainer_predict(tmp_path):
    from spgemm_gnn_tpu.train.config import TrainConfig
    from spgemm_gnn_tpu.train.loop import Trainer
    cfg = TrainConfig(dataset="flickr", model="sage", epochs=3, hidden_dim=16,
                      hidden_layers=2, maxk=4, dropout=0.0, w_lr=0.01,
                      nonlinear="maxk", impl="xla", synthetic=True,
                      synthetic_scale=0.002, eval_every=0, log_every=0,
                      cache_strategy="static-outd", cache_size_ratio=0.3,
                      path=str(tmp_path))
    tr = Trainer(cfg)
    res = tr.run()
    logits = np.asarray(tr.predict(res["final_state"], [0, 1, 2]))
    assert logits.shape == (3, tr.dataset.num_classes)
    assert np.isfinite(logits).all()
    assert tr.feature_store.stats["hits"] > 0
