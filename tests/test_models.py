"""Model tests: shapes, param structure, maxk-vs-relu paths, gradient flow,
and maxk(k=dim) ≡ identity-nonlinearity consistency between sparse and dense
aggregation routes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spgemm_gnn_tpu.models.models import build_model, MODELS

HID, LAYERS, OUT, K = 32, 2, 7, 4


def _data(g, rng, feat_dim=12):
    return jnp.asarray(rng.standard_normal((g.num_nodes, feat_dim))
                       .astype(np.float32))


@pytest.mark.parametrize("name", sorted(MODELS))
@pytest.mark.parametrize("nonlinear", ["maxk", "relu"])
def test_forward_shapes(small_graph, rng, name, nonlinear):
    g = small_graph
    x = _data(g, rng)
    model = build_model(name, hidden_dim=HID, num_layers=LAYERS, out_dim=OUT,
                        maxk=K, feat_drop=0.3, use_norm=True,
                        nonlinear=nonlinear, impl="xla")
    variables = model.init(jax.random.PRNGKey(0), g, x, train=False)
    logits = model.apply(variables, g, x, train=False)
    assert logits.shape == (g.num_nodes, OUT)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("name", sorted(MODELS))
def test_train_mode_with_dropout(small_graph, rng, name):
    g = small_graph
    x = _data(g, rng)
    model = build_model(name, hidden_dim=HID, num_layers=LAYERS, out_dim=OUT,
                        maxk=K, feat_drop=0.5, use_norm=True, nonlinear="maxk",
                        impl="xla")
    variables = model.init(jax.random.PRNGKey(0), g, x, train=False)
    if "batch_stats" in variables:
        logits, _ = model.apply(variables, g, x, train=True,
                                rngs={"dropout": jax.random.PRNGKey(1)},
                                mutable=["batch_stats"])
    else:
        logits = model.apply(variables, g, x, train=True,
                             rngs={"dropout": jax.random.PRNGKey(1)})
    assert logits.shape == (g.num_nodes, OUT)


@pytest.mark.parametrize("name", ["sage", "gcn", "gin", "sage_integrated"])
def test_maxk_full_k_matches_dense_route(small_graph, rng, name):
    """With k == hidden_dim the maxk path reduces to identity nonlinearity; the
    sparse (CBSR) and dense aggregation routes must then agree exactly."""
    g = small_graph
    x = _data(g, rng)
    kw = dict(hidden_dim=HID, num_layers=LAYERS, out_dim=OUT, feat_drop=0.0,
              use_norm=False, impl="xla")
    m_maxk = build_model(name, maxk=HID, nonlinear="maxk", **kw)
    variables = m_maxk.init(jax.random.PRNGKey(0), g, x, train=False)
    y1 = m_maxk.apply(variables, g, x, train=False)
    # same params, dense route: k >= dim short-circuits to spmm in aggregate()
    y2 = m_maxk.apply(variables, g, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("name", sorted(MODELS))
def test_gradients_flow(small_graph, rng, name):
    g = small_graph
    x = _data(g, rng)
    model = build_model(name, hidden_dim=HID, num_layers=LAYERS, out_dim=OUT,
                        maxk=K, feat_drop=0.0, use_norm=False,
                        nonlinear="maxk", impl="xla")
    variables = model.init(jax.random.PRNGKey(0), g, x, train=False)

    def loss(params):
        v = dict(variables, params=params)
        return (model.apply(v, g, x, train=False) ** 2).mean()

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at least the input/output projections receive nonzero gradient
    nonzero = [v for v in jax.tree_util.tree_leaves(grads)
               if float(np.abs(np.asarray(v)).max()) > 0]
    assert len(nonzero) >= 2


def test_sage_param_structure(small_graph, rng):
    g = small_graph
    x = _data(g, rng)
    model = build_model("sage", hidden_dim=HID, num_layers=3, out_dim=OUT,
                        maxk=K, nonlinear="maxk", impl="xla")
    variables = model.init(jax.random.PRNGKey(0), g, x, train=False)
    p = variables["params"]
    assert set(p) == {"lin_in", "lin_out", "layer0", "layer1", "layer2"}
    # SAGEConv: fc_neigh bias-free, fc_self biased (DGL parity)
    assert "bias" not in p["layer0"]["fc_neigh"]
    assert "bias" in p["layer0"]["fc_self"]


@pytest.mark.parametrize("name", sorted(MODELS))
def test_remat_matches_no_remat(small_graph, rng, name):
    """--remat is numerically a no-op: identical forward and gradients, only
    the backward's residual set changes (SURVEY.md §7.3 memory trade)."""
    g = small_graph
    x = _data(g, rng)
    outs = []
    for remat in (False, True):
        model = build_model(name, hidden_dim=HID, num_layers=LAYERS,
                            out_dim=OUT, maxk=K, feat_drop=0.0,
                            nonlinear="maxk", remat=remat)
        params = model.init(jax.random.PRNGKey(3), g, x)
        y = model.apply(params, g, x)
        grads = jax.grad(
            lambda p: (model.apply(p, g, x, train=True) ** 2).sum())(params)
        outs.append((np.asarray(y), jax.device_get(grads)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
        outs[0][1], outs[1][1])


@pytest.mark.parametrize("name", sorted(MODELS))
def test_bf16_mixed_precision(small_graph, rng, name):
    """dtype=bf16 (the products-scale memory mode): params stay f32, logits
    come out f32, relu forward tracks the f32 model to bf16 rounding, and
    the maxk path trains (selection flips under bf16 rounding are expected,
    so only finiteness is asserted there)."""
    g = small_graph
    x = _data(g, rng)
    kw = dict(hidden_dim=HID, num_layers=LAYERS, out_dim=OUT, maxk=K,
              feat_drop=0.0, use_norm=True, impl="xla")
    m32 = build_model(name, nonlinear="relu", **kw)
    v = m32.init(jax.random.PRNGKey(1), g, x, train=False)
    m16 = build_model(name, nonlinear="relu", dtype=jnp.bfloat16, **kw)
    # params must be shareable between the two (f32 param_dtype)
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(v["params"]))
    y32 = m32.apply(v, g, x, train=False)
    y16 = m16.apply(v, g, x, train=False)
    assert y16.dtype == jnp.float32          # lin_out stays full precision
    rel = float(jnp.max(jnp.abs(y16 - y32)) / (1e-6 + jnp.max(jnp.abs(y32))))
    assert rel < 0.05, rel
    mk = build_model(name, nonlinear="maxk", dtype=jnp.bfloat16, **kw)
    vk = mk.init(jax.random.PRNGKey(1), g, x, train=False)
    grads = jax.grad(lambda p: (mk.apply(
        p, g, x, train=True, mutable=["batch_stats"])[0] ** 2).sum())(vk)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(grads))
