"""Training harness: config, losses, metrics, optimizers, loop, checkpointing."""

from spgemm_gnn_tpu.train.config import TrainConfig  # noqa: F401
from spgemm_gnn_tpu.train.loop import train_and_evaluate, Trainer  # noqa: F401
