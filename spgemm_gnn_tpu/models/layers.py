"""Message-passing layers — flax.linen re-designs of the DGL layers the reference
uses (dglnn.SAGEConv / GraphConv / GINConv at `/root/reference/utils/models.py:
140,252,375`) and of its custom kernel-backed layers
(`utils/maxk_layers.py:47-448`).

Each layer takes the Graph plus node features; when `k_sparse` is set the input
is MaxK-sparse and aggregation routes through the CBSR SpGEMM/SSpMM pair,
otherwise through the dense XLA SpMM baseline.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax


from spgemm_gnn_tpu.kernels.api import aggregate

# torch.nn.init.calculate_gain('relu')**2 — DGL SAGEConv.reset_parameters uses
# xavier_uniform_ with relu gain.
xavier_uniform = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")
xavier_uniform_relu = nn.initializers.variance_scaling(2.0, "fan_avg", "uniform")


class SAGEConv(nn.Module):
    """GraphSAGE mean-aggregator layer (DGL SAGEConv parity, aggregator='mean').

    Flow (DGL semantics for in_feats == out_feats, i.e. lin_before_mp=False —
    reference CachedSAGEConv at utils/models.py:64-80 shows the exact path):
    feat_drop(x) → h_neigh = fc_neigh(mean-agg(x)) → fc_self(x) + h_neigh →
    optional LayerNorm. Bias lives on fc_self; fc_neigh is bias-free.
    """
    features: int
    feat_drop: float = 0.0
    use_norm: bool = False
    k_sparse: int | None = None
    impl: str = "auto"
    dtype: Any = None          # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, g, x, *, train: bool = False):
        x = nn.Dropout(self.feat_drop, deterministic=not train)(x)
        agg = aggregate(g, x, norm="mean", k=self.k_sparse, impl=self.impl)
        h_neigh = nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                           kernel_init=xavier_uniform_relu,
                           name="fc_neigh")(agg)
        h_self = nn.Dense(self.features, use_bias=True, dtype=self.dtype,
                          kernel_init=xavier_uniform_relu,
                          name="fc_self")(x)
        out = h_self + h_neigh
        if self.use_norm:
            out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(out)
        return out


class GraphConvAgg(nn.Module):
    """GCN aggregation with symmetric norm — DGL GraphConv(weight=None,
    norm='both', bias=True) parity (reference utils/models.py:252).

    y = D_in^-1/2 · A · D_out^-1/2 · x + b  (degrees clamped ≥ 1).
    """
    features: int
    k_sparse: int | None = None
    impl: str = "auto"

    @nn.compact
    def __call__(self, g, x, *, train: bool = False):
        y = aggregate(g, x, norm="gcn", k=self.k_sparse, impl=self.impl)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # cast keeps bf16 activations bf16 (f32 bias would promote)
        return y + bias.astype(y.dtype)


class GINAgg(nn.Module):
    """GIN aggregation — DGL GINConv(learn_eps=True, apply_func=None) parity
    (reference utils/models.py:375): y = (1 + eps)·x + sum-agg(x)."""
    k_sparse: int | None = None
    impl: str = "auto"

    @nn.compact
    def __call__(self, g, x, *, train: bool = False):
        eps = self.param("eps", nn.initializers.zeros, ())
        agg = aggregate(g, x, norm="sum", k=self.k_sparse, impl=self.impl)
        return ((1.0 + eps).astype(x.dtype) * x).astype(agg.dtype) + agg
