#!/usr/bin/env python
"""Training CLI — the `python maxk_gnn_dgl.py --dataset ... --model ...`
equivalent (reference driver at /root/reference/maxk_gnn_dgl.py:199-310).

Examples:
  python train.py --dataset flickr --model sage --nonlinear relu --epochs 400
  python train.py --dataset reddit --model sage --nonlinear maxk --maxk 32 \
      --hidden_layers 4 --hidden_dim 256 --dropout 0.5 --norm --w_lr 0.01
  python train.py --dataset flickr --synthetic --epochs 50   # no data files
"""
import json
import os
import sys


def main(argv=None):
    from spgemm_gnn_tpu.train.config import from_args
    config = from_args(argv)

    if config.multihost or config.coordinator:
        # must run before any other jax call (backend initialisation)
        from spgemm_gnn_tpu.parallel.multihost import (
            initialize_multihost, process_summary)
        initialize_multihost(config.coordinator, config.num_processes,
                             config.process_id)
        print(f"multihost runtime: {process_summary()}")

    os.makedirs(config.path, exist_ok=True)
    from spgemm_gnn_tpu.utils.logging import get_logger
    logger = get_logger(os.path.join(config.path, f"{config.dataset}.log"))
    config.print_params(logger.info)

    writer = None
    if config.tensorboard:
        try:
            from torch.utils.tensorboard import SummaryWriter
            writer = SummaryWriter(log_dir=os.path.join(config.path, "tb"))
            writer.add_text("config", config.as_markdown(), 0)
        except ImportError:
            logger.info("tensorboard unavailable; skipping TB logging")

    from spgemm_gnn_tpu.train.loop import Trainer
    trainer = Trainer(config, logger=logger)

    if config.evaluate:
        # eval-only mode (the reference parses --evaluate but never uses it —
        # utils/config.py:55-56; here it restores the checkpoint and reports)
        tr, va, te = trainer.evaluate_checkpoint(config.evaluate)
        logger.info("Eval-only: train %.4f | val %.4f | test %.4f", tr, va, te)
        with open(os.path.join(config.path, "results.json"), "w") as f:
            json.dump({"train_acc": tr, "val_acc": va, "test_acc": te}, f)
        return {"train_acc": tr, "val_acc": va, "test_acc": te}

    logger.info("Training...")

    def on_epoch(rec):
        if writer is not None:
            writer.add_scalar("train/loss", rec.loss, rec.epoch)
            writer.add_scalar("train/train_acc", rec.train_acc, rec.epoch)
            writer.add_scalar("train/val_acc", rec.val_acc, rec.epoch)
            writer.add_scalar("train/test_acc", rec.test_acc, rec.epoch)

    if config.profile:
        # capture a few steps under the profiler before the real run
        import jax
        state = trainer.init_state()
        rng = jax.random.PRNGKey(0)
        state, _ = trainer.train_step(state, rng)   # compile outside trace
        with jax.profiler.trace(config.profile):
            for i in range(3):
                state, loss = trainer.train_step(
                    state, jax.random.fold_in(rng, i))
            jax.block_until_ready(loss)
        logger.info("profiler trace written to %s", config.profile)

    results = trainer.run(on_epoch=on_epoch)
    logger.info("Best val accuracy: %.4f (epoch %d)",
                results["best_val_accuracy"], results["best_epoch"])
    logger.info("Best test accuracy: %.4f", results["best_test_accuracy"])
    logger.info("Total training time: %.1fs", results["wall_time_s"])

    if config.timing:
        # aggregation share of a training step — the Amdahl stat the reference
        # reports (maxk_gnn_dgl.py:150-153)
        from spgemm_gnn_tpu.utils.timing import measure_aggregation_fraction
        try:
            stats = measure_aggregation_fraction(trainer)
        except Exception as exc:   # the probe allocates fresh [N, dim]+grad
            # buffers on top of the live training state; at products scale
            # that can exhaust HBM — the run's own results must still land
            logger.warning("timing probe failed: %s", exc)
            stats = {"error": f"{type(exc).__name__}: {exc}"[:200]}
        else:
            logger.info("Train step time: %.4fs", stats["step_s"])
            logger.info("Forward+backward aggregation time: %.4fs",
                        stats["aggregation_s"])
            logger.info("Aggregation percentage: %.2f%%",
                        stats["aggregation_pct"])
        results["aggregation_stats"] = stats

    summary = {k: results[k] for k in
               ("best_val_accuracy", "best_test_accuracy", "best_epoch",
                "wall_time_s", "steady_epoch_s")}
    if "aggregation_stats" in results:
        summary["aggregation_stats"] = results["aggregation_stats"]
    with open(os.path.join(config.path, "results.json"), "w") as f:
        json.dump(summary, f, indent=2)
    if writer is not None:
        writer.close()
    return results


if __name__ == "__main__":
    main()
