"""Utilities: logging, timing/instrumentation."""

from spgemm_gnn_tpu.utils.logging import get_logger, AverageMeter  # noqa: F401
