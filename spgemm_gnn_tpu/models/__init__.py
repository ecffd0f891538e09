"""Flax models: SAGE / GCN / GIN / GNN_res with MaxK or ReLU nonlinearity."""

from spgemm_gnn_tpu.models.layers import SAGEConv, GraphConvAgg, GINAgg  # noqa: F401
from spgemm_gnn_tpu.models.models import SAGE, GCN, GIN, GNNRes, build_model  # noqa: F401
