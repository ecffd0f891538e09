"""XLA-native reference ops: the correctness oracle and the dense baseline path.

These play the role cuSPARSE plays in the reference (`kernels/spmm_cusparse.cu`,
see SURVEY.md §2.1): a always-available, always-correct aggregation path that the
Pallas kernels are validated against and benchmarked against.
"""

from spgemm_gnn_tpu.ops.maxk import maxk, maxk_cbsr, cbsr_to_dense  # noqa: F401
from spgemm_gnn_tpu.ops.spmm import spmm, spmm_transpose  # noqa: F401
from spgemm_gnn_tpu.ops.norms import edge_weights, NORM_SUM, NORM_MEAN, NORM_GCN  # noqa: F401
