"""Model families: SAGE / GCN / GIN / GNN_res — parity with the reference's
`utils/models.py` (SAGE:109, GCN:240, GIN:363, GNN_res:486) plus the integrated
kernel-first SAGE variant (`utils/integrated_models.py:8-66`).

All models: lin_in → num_layers × (nonlinearity + message passing) → lin_out,
with `nonlinear` ∈ {"maxk", "relu"}. With maxk, the aggregation input is k-sparse
and routes through the CBSR SpGEMM/SSpMM kernel path.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax


from spgemm_gnn_tpu.kernels.api import aggregate, maxk_op

# --remat checkpoint policy: keep the aggregation outputs (tagged "agg_out"
# in kernels/api.py::aggregate) as residuals, recompute everything else.
# The aggregation is linear (its VJP is the transpose kernel on the
# cotangent — no forward residuals needed), so saving its output costs one
# [N, hidden] buffer per layer while dropping the kernel re-run a
# full-recompute policy pays (products measured: 16.8 vs 11.2 s/epoch).
_REMAT_POLICY = jax.checkpoint_policies.save_only_these_names("agg_out")

from spgemm_gnn_tpu.models.layers import (
    SAGEConv, GraphConvAgg, GINAgg, xavier_uniform, xavier_uniform_relu,
)


class _Base(nn.Module):
    hidden_dim: int = 256
    num_layers: int = 3
    out_dim: int = 1
    maxk: int = 32
    feat_drop: float = 0.5
    use_norm: bool = False
    nonlinear: str = "maxk"   # "maxk" | "relu"
    impl: str = "auto"
    remat: bool = False       # rematerialise per-layer aggregation on backward
    # compute dtype for the hidden stack (flax mixed precision: params stay
    # f32, activations/matmuls run in `dtype`). bf16 halves the [N, hidden]
    # activation footprint — the difference between fitting and OOMing
    # full-scale ogbn-products (2.45M × 256 ≈ 2.5 GB per f32 tensor) in
    # 16 GB HBM. lin_out is left in f32 so logits/loss keep full precision.
    dtype: Any = None

    def _nl(self, x, g=None):
        """The per-layer nonlinearity; returns (activated, k_for_aggregation).
        `g` lets the MaxK kernel run per-shard on a device mesh (api.maxk_op)."""
        if self.nonlinear == "maxk":
            return maxk_op(x, self.maxk, self.impl, g), self.maxk
        return nn.relu(x), None

    def _conv(self, mod, g, x, train, *, nl: bool = False):
        """Apply the message-passing submodule (optionally preceded by the
        nonlinearity), under `nn.remat` when `self.remat` is set.

        Full-graph activations are the memory bound at products scale
        (SURVEY.md §7.3: 2.45M × 256 f32 ≈ 2.5 GB per saved tensor); remat
        drops the aggregation internals + the masked activation from the
        residual set and recomputes them in the backward — the standard
        TPU memory/compute trade. `train` stays a static closure (a traced
        bool would break Dropout's python branch)."""
        def body(m, gg, xx):
            if nl:
                xx, _ = self._nl(xx, gg)
            return m(gg, xx, train=train)
        if self.remat:
            # prevent_cse=True (the jax default) is LOAD-BEARING: without the
            # optimization barriers, XLA CSE merges the recomputed backward
            # ops with the forward ones and silently undoes the remat — the
            # jaxpr recomputes but the lowered HLO does not (measured r5:
            # yelp-f32 peak memory identical with/without remat). The
            # barrier-free variant is only safe under an enclosing lax.scan.
            # Policy: save the aggregation outputs (tagged in kernels/api.py)
            # — the aggregation is linear, its VJP needs no forward rerun,
            # and a full-recompute policy re-ran the edge-proportional
            # kernel per layer (products: 11.2 → 16.8 s/epoch measured).
            return nn.remat(body, policy=_REMAT_POLICY)(mod, g, x)
        return body(mod, g, x)

    def _agg(self, g, x, norm, *, nl: bool = False):
        """Parameter-free (nonlinearity +) aggregate, `jax.checkpoint`-wrapped
        when `self.remat` is set (the integrated models call `aggregate`
        directly rather than through a submodule)."""
        k = self.maxk if self.nonlinear == "maxk" else None

        def body(xx):
            if nl:
                xx, _ = self._nl(xx, g)
            return aggregate(g, xx, norm=norm, k=k, impl=self.impl)
        if self.remat:
            # prevent_cse=True: see _conv — barrier-free remat is CSE'd away
            return jax.checkpoint(body, policy=_REMAT_POLICY)(x)
        return body(x)


class SAGE(_Base):
    """Reference utils/models.py:109-238: lin_in → [MaxK/ReLU → SAGEConv(mean,
    feat_drop, LayerNorm?)] × L → lin_out. (No ReLU after lin_in.)"""

    @nn.compact
    def __call__(self, g, x, *, train: bool = False):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                         kernel_init=xavier_uniform,
                     name="lin_in")(x)
        k = self.maxk if self.nonlinear == "maxk" else None
        for i in range(self.num_layers):
            conv = SAGEConv(self.hidden_dim, feat_drop=self.feat_drop,
                            use_norm=self.use_norm, k_sparse=k,
                            impl=self.impl, dtype=self.dtype,
                            name=f"layer{i}")
            x = self._conv(conv, g, x, train, nl=True)
        return nn.Dense(self.out_dim, kernel_init=xavier_uniform,
                        name="lin_out")(x)


class GCN(_Base):
    """Reference utils/models.py:240-361: relu(lin_in) → [Linear → MaxK/ReLU →
    Dropout → GraphConv(sym-norm, bias) → LayerNorm?] × L → lin_out."""

    @nn.compact
    def __call__(self, g, x, *, train: bool = False):
        x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype,
                         kernel_init=xavier_uniform,
                             name="lin_in")(x))
        for i in range(self.num_layers):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                         kernel_init=xavier_uniform,
                         name=f"lin{i}")(x)
            x, k = self._nl(x, g)
            x = nn.Dropout(self.feat_drop, deterministic=not train)(x)
            x = self._conv(GraphConvAgg(self.hidden_dim, k_sparse=k,
                                        impl=self.impl, name=f"conv{i}"),
                           g, x, train)
            if self.use_norm:
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm{i}")(x)
        return nn.Dense(self.out_dim, kernel_init=xavier_uniform,
                        name="lin_out")(x)


class GIN(_Base):
    """Reference utils/models.py:363-484: same wiring as GCN but with
    GINConv(learn_eps=True) sum aggregation."""

    @nn.compact
    def __call__(self, g, x, *, train: bool = False):
        x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype,
                         kernel_init=xavier_uniform,
                             name="lin_in")(x))
        for i in range(self.num_layers):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                         kernel_init=xavier_uniform,
                         name=f"lin{i}")(x)
            x, k = self._nl(x, g)
            x = nn.Dropout(self.feat_drop, deterministic=not train)(x)
            x = self._conv(GINAgg(k_sparse=k, impl=self.impl,
                                  name=f"conv{i}"), g, x, train)
            if self.use_norm:
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm{i}")(x)
        return nn.Dense(self.out_dim, kernel_init=xavier_uniform,
                        name="lin_out")(x)


class GNNRes(_Base):
    """Residual GCN variant, reference utils/models.py:486-540: per layer —
    res = Linear(x); x = GraphConv(x); BatchNorm?; Linear→ReLU→Drop→Linear;
    x += res; ReLU; Drop. (ReLU-only: the reference ignores `nonlinear` here.)"""

    @nn.compact
    def __call__(self, g, x, *, train: bool = False):
        x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype,
                         kernel_init=xavier_uniform,
                             name="lin_in")(x))
        for i in range(self.num_layers):
            res = nn.Dense(self.hidden_dim, dtype=self.dtype,
                         kernel_init=xavier_uniform,
                           name=f"res{i}")(x)
            x = self._conv(GraphConvAgg(self.hidden_dim, impl=self.impl,
                                        name=f"conv{i}"), g, x, train)
            if self.use_norm:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 dtype=self.dtype,
                                 epsilon=1e-5, name=f"bn{i}")(x)
            x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                         kernel_init=xavier_uniform,
                         name=f"lin1_{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.feat_drop, deterministic=not train)(x)
            x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                         kernel_init=xavier_uniform,
                         name=f"lin2_{i}")(x)
            x = nn.relu(x + res)
            x = nn.Dropout(self.feat_drop, deterministic=not train)(x)
        return nn.Dense(self.out_dim, kernel_init=xavier_uniform,
                        name="lin_out")(x)


class MaxKSAGE(_Base):
    """Integrated kernel-first SAGE (reference utils/integrated_models.py:8-66 +
    utils/maxk_layers.py:47-265): per layer — h_self = fc_self(x);
    h_neigh = fc_neigh(x); MaxK(h_neigh); mean-aggregate (SpGEMM);
    out = h_self + agg; LayerNorm?; Dropout. No fc after aggregation."""

    @nn.compact
    def __call__(self, g, x, *, train: bool = False):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                         kernel_init=xavier_uniform,
                     name="lin_in")(x)
        for i in range(self.num_layers):
            h_self = nn.Dense(self.hidden_dim, use_bias=False, dtype=self.dtype,
                              kernel_init=xavier_uniform_relu,
                              name=f"fc_self{i}")(x)
            h_neigh = nn.Dense(self.hidden_dim, use_bias=False, dtype=self.dtype,
                               kernel_init=xavier_uniform_relu,
                               name=f"fc_neigh{i}")(x)
            agg = self._agg(g, h_neigh, "mean", nl=True)
            x = h_self + agg
            if self.use_norm:
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm{i}")(x)
            x = nn.Dropout(self.feat_drop, deterministic=not train)(x)
        return nn.Dense(self.out_dim, kernel_init=xavier_uniform,
                        name="lin_out")(x)


class MaxKGCN(_Base):
    """Integrated kernel-first GCN (reference utils/integrated_models.py:68-143
    + MaxKGCNConv at utils/maxk_layers.py:267-448): per layer — Linear →
    Dropout → [conv: weight matmul → MaxK → sym-norm aggregate + bias] →
    LayerNorm?."""

    @nn.compact
    def __call__(self, g, x, *, train: bool = False):
        x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype,
                         kernel_init=xavier_uniform,
                             name="lin_in")(x))
        for i in range(self.num_layers):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                         kernel_init=xavier_uniform,
                         name=f"lin{i}")(x)
            x = nn.Dropout(self.feat_drop, deterministic=not train)(x)
            # conv body
            x = nn.Dense(self.hidden_dim, use_bias=False, dtype=self.dtype,
                         kernel_init=xavier_uniform_relu,
                         name=f"conv_w{i}")(x)
            x = self._agg(g, x, "gcn", nl=True)
            bias = self.param(f"conv_b{i}", nn.initializers.zeros,
                              (self.hidden_dim,))
            x = x + bias.astype(x.dtype)
            if self.use_norm:
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm{i}")(x)
        return nn.Dense(self.out_dim, kernel_init=xavier_uniform,
                        name="lin_out")(x)


class MaxKGIN(_Base):
    """Integrated kernel-first GIN (reference utils/integrated_models.py:145-219
    + MaxKGINConv at :221-270): per layer — Linear → Dropout → [conv: MaxK →
    (1+eps)·x + sum-aggregate] → LayerNorm?."""

    @nn.compact
    def __call__(self, g, x, *, train: bool = False):
        x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype,
                         kernel_init=xavier_uniform,
                             name="lin_in")(x))
        for i in range(self.num_layers):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                         kernel_init=xavier_uniform,
                         name=f"lin{i}")(x)
            x = nn.Dropout(self.feat_drop, deterministic=not train)(x)
            x, k = self._nl(x, g)
            eps = self.param(f"eps{i}", nn.initializers.zeros, ())
            # the masked x feeds both terms, so only the aggregate remats
            agg = self._agg(g, x, "sum")
            x = ((1.0 + eps).astype(x.dtype) * x).astype(agg.dtype) + agg
            if self.use_norm:
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm{i}")(x)
        return nn.Dense(self.out_dim, kernel_init=xavier_uniform,
                        name="lin_out")(x)


MODELS = {"sage": SAGE, "gcn": GCN, "gin": GIN, "gnn_res": GNNRes,
          "sage_integrated": MaxKSAGE, "gcn_integrated": MaxKGCN,
          "gin_integrated": MaxKGIN}


def build_model(model: str, *, hidden_dim: int, num_layers: int, out_dim: int,
                maxk: int = 32, feat_drop: float = 0.5, use_norm: bool = False,
                nonlinear: str = "maxk", impl: str = "auto",
                remat: bool = False, dtype: Any = None) -> nn.Module:
    """Factory mirroring the reference driver's model dispatch
    (maxk_gnn_dgl.py:291-298). dtype: compute dtype for the hidden stack
    (None/f32 = exact; bf16 = mixed precision, params stay f32)."""
    if model not in MODELS:
        raise ValueError(f"unknown model {model!r}; expected one of "
                         f"{sorted(MODELS)}")
    import jax.numpy as jnp
    if dtype is not None and jnp.dtype(dtype) == jnp.float32:
        dtype = None     # f32 compute is the flax default; avoid extra casts
    return MODELS[model](hidden_dim=hidden_dim, num_layers=num_layers,
                         out_dim=out_dim, maxk=maxk, feat_drop=feat_drop,
                         use_norm=use_norm, nonlinear=nonlinear, impl=impl,
                         remat=remat, dtype=dtype)
