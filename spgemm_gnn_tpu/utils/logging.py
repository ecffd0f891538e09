"""Logging — file + stream logger and AverageMeter, parity with the reference's
`utils/general_utils.py:13-56` (get_logger, AverageMeter)."""
from __future__ import annotations

import logging
import sys


def get_logger(file_path: str | None, name: str = "spgemm_gnn_tpu"):
    logger = logging.getLogger(name)
    logger.handlers.clear()
    formatter = logging.Formatter("%(message)s")
    if file_path:
        fh = logging.FileHandler(file_path)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(formatter)
    logger.addHandler(sh)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    return logger


def param_size(params) -> float:
    """Parameter size in MB (reference utils/general_utils.py:31-36)."""
    import numpy as np
    import jax
    n = sum(np.prod(np.shape(p)) for p in jax.tree_util.tree_leaves(params))
    return float(n) / 1024.0 / 1024.0


class AverageMeter:
    """Running average tracker."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count
