"""Cross-framework layer-math validation: every model family re-implemented
independently in torch (CPU) from the documented reference semantics
(SURVEY.md §2.2 / §7.3 — DGL mean-agg with raw in-degree clamped ≥1, GCN
symmetric D^-1/2 norms, GIN (1+eps)x + sum, MaxK top-k masking), then compared
against the flax models with identical weights — forward activations AND input
gradients.

Real datasets are unreachable in this environment (no egress, no DGL/OGB), so
this is the accuracy-parity evidence chain: if the layer math matches an
independent implementation of the reference's documented semantics to 1e-5 and
the training protocol matches (losses/optimizer/metrics tested elsewhere),
training curves follow.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from spgemm_gnn_tpu.graphs.synthetic import powerlaw_graph  # noqa: E402
from spgemm_gnn_tpu.models.models import build_model  # noqa: E402

N, IN_DIM, HID, OUT, K, LAYERS = 80, 12, 16, 5, 4, 2


@pytest.fixture(scope="module")
def graph():
    return powerlaw_graph(N, 400, seed=7)


@pytest.fixture(scope="module")
def adj(graph):
    """Dense adjacency + norm matrices (torch, float64-free independent path)."""
    a = torch.zeros(N, N)
    src = np.asarray(graph.indices)
    dst = np.asarray(graph.edge_dst)
    for s, d in zip(src, dst):
        a[d, s] += 1.0
    in_deg = a.sum(1).clamp(min=1.0)
    out_deg = a.sum(0).clamp(min=1.0)
    mean_a = a / in_deg[:, None]
    gcn_a = in_deg.pow(-0.5)[:, None] * a * out_deg.pow(-0.5)[None, :]
    return {"sum": a, "mean": mean_a, "gcn": gcn_a}


def t_maxk(x, k):
    """Reference MaxK semantics (utils/models.py:12-26): top-k of dim 1 kept."""
    _, idx = x.topk(k, dim=1)
    mask = torch.zeros_like(x).scatter_(1, idx, 1.0)
    return x * mask


def _lin(params, name):
    """flax Dense params → torch tensors (kernel is [in, out])."""
    p = params[name]
    w = torch.tensor(np.asarray(p["kernel"]))
    b = torch.tensor(np.asarray(p["bias"])) if "bias" in p else None
    return w, b


def _ln(x, params, name):
    p = params[name]
    scale = torch.tensor(np.asarray(p["scale"]))
    bias = torch.tensor(np.asarray(p["bias"]))
    mu = x.mean(-1, keepdim=True)
    var = x.var(-1, keepdim=True, unbiased=False)
    return (x - mu) / torch.sqrt(var + 1e-5) * scale + bias


def torch_sage(params, adj, x, nonlinear):
    w, b = _lin(params, "lin_in")
    x = x @ w + b
    for i in range(LAYERS):
        x = t_maxk(x, K) if nonlinear == "maxk" else torch.relu(x)
        agg = adj["mean"] @ x
        wn, _ = _lin(params[f"layer{i}"], "fc_neigh")
        ws, bs = _lin(params[f"layer{i}"], "fc_self")
        x = (x @ ws + bs) + agg @ wn
        x = _ln(x, params[f"layer{i}"], "LayerNorm_0")
    w, b = _lin(params, "lin_out")
    return x @ w + b


def torch_gcn(params, adj, x, nonlinear):
    w, b = _lin(params, "lin_in")
    x = torch.relu(x @ w + b)
    for i in range(LAYERS):
        w, b = _lin(params, f"lin{i}")
        x = x @ w + b
        x = t_maxk(x, K) if nonlinear == "maxk" else torch.relu(x)
        x = adj["gcn"] @ x + torch.tensor(
            np.asarray(params[f"conv{i}"]["bias"]))
        x = _ln(x, params, f"norm{i}")
    w, b = _lin(params, "lin_out")
    return x @ w + b


def torch_gin(params, adj, x, nonlinear):
    w, b = _lin(params, "lin_in")
    x = torch.relu(x @ w + b)
    for i in range(LAYERS):
        w, b = _lin(params, f"lin{i}")
        x = x @ w + b
        x = t_maxk(x, K) if nonlinear == "maxk" else torch.relu(x)
        eps = float(np.asarray(params[f"conv{i}"]["eps"]))
        x = (1.0 + eps) * x + adj["sum"] @ x
        x = _ln(x, params, f"norm{i}")
    w, b = _lin(params, "lin_out")
    return x @ w + b


def torch_sage_integrated(params, adj, x, nonlinear):
    w, b = _lin(params, "lin_in")
    x = x @ w + b
    for i in range(LAYERS):
        ws, _ = _lin(params, f"fc_self{i}")
        wn, _ = _lin(params, f"fc_neigh{i}")
        h_self = x @ ws
        h_neigh = x @ wn
        h_neigh = t_maxk(h_neigh, K) if nonlinear == "maxk" \
            else torch.relu(h_neigh)
        x = h_self + adj["mean"] @ h_neigh
        x = _ln(x, params, f"norm{i}")
    w, b = _lin(params, "lin_out")
    return x @ w + b


TORCH_IMPLS = {"sage": torch_sage, "gcn": torch_gcn, "gin": torch_gin,
               "sage_integrated": torch_sage_integrated}


@pytest.mark.parametrize("model", list(TORCH_IMPLS))
@pytest.mark.parametrize("nonlinear", ["maxk", "relu"])
def test_model_matches_independent_torch(graph, adj, model, nonlinear):
    rng = np.random.default_rng(3)
    x_np = rng.standard_normal((N, IN_DIM)).astype(np.float32)
    ct_np = rng.standard_normal((N, OUT)).astype(np.float32)

    m = build_model(model, hidden_dim=HID, num_layers=LAYERS, out_dim=OUT,
                    maxk=K, feat_drop=0.0, use_norm=True,
                    nonlinear=nonlinear, impl="xla")
    variables = m.init({"params": jax.random.PRNGKey(0)}, graph,
                       jnp.asarray(x_np), train=False)
    params = jax.device_get(variables["params"])

    def jax_loss(xv):
        out = m.apply({"params": variables["params"]}, graph, xv, train=False)
        return (out * jnp.asarray(ct_np)).sum(), out

    (loss_j, out_j), grad_j = jax.value_and_grad(jax_loss, has_aux=True)(
        jnp.asarray(x_np))

    xt = torch.tensor(x_np, requires_grad=True)
    out_t = TORCH_IMPLS[model](params, adj, xt, nonlinear)
    loss_t = (out_t * torch.tensor(ct_np)).sum()
    loss_t.backward()

    np.testing.assert_allclose(np.asarray(out_j), out_t.detach().numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(grad_j), xt.grad.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_maxk_semantics_vs_torch(rng):
    """The MaxK op itself: forward mask AND stop-gradient backward mask match
    the reference's torch autograd semantics (utils/models.py:12-26)."""
    from spgemm_gnn_tpu.ops.maxk import maxk
    x_np = rng.standard_normal((50, 32)).astype(np.float32)
    ct = rng.standard_normal((50, 32)).astype(np.float32)
    y_j = np.asarray(maxk(jnp.asarray(x_np), 8))
    g_j = np.asarray(jax.grad(
        lambda v: (maxk(v, 8) * jnp.asarray(ct)).sum())(jnp.asarray(x_np)))

    xt = torch.tensor(x_np, requires_grad=True)
    y_t = t_maxk(xt, 8)
    (y_t * torch.tensor(ct)).sum().backward()
    np.testing.assert_allclose(y_j, y_t.detach().numpy(), rtol=0, atol=0)
    np.testing.assert_allclose(g_j, xt.grad.numpy(), rtol=0, atol=0)
