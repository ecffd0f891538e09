"""TPU kernel layer: CBSR SpGEMM forward / SSpMM backward behind one API.

`aggregate` / `aggregate_cbsr` are the only entry points the models use; the
implementation is selected by `impl` ("xla", "xla_dense", "pallas", "auto").
This replaces the reference's pybind11 binding layer `kernels/maxk_bindings.cpp`
(functions `spgemm_forward` / `spgemm_backward` / `maxk_forward` /
`maxk_backward`, SURVEY.md §2.1) — on TPU the binding is `jax.custom_vjp`.
"""

from spgemm_gnn_tpu.kernels.api import aggregate, aggregate_cbsr  # noqa: F401
