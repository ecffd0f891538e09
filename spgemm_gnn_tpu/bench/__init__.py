"""Benchmark harness — the `maxk_kernel_test` role (reference kernels/main.cu,
SURVEY.md §3.4): sweep aggregation implementations × k × graphs, report
edges/s, GB/s and speedups vs the XLA (cuSPARSE-role) baseline."""

from spgemm_gnn_tpu.bench.harness import (  # noqa: F401
    bench_aggregation, bench_training_step, time_chained,
)
