"""Full-graph training loop — the TPU re-design of the reference driver
(`/root/reference/maxk_gnn_dgl.py:78-153` train(), :39-76 evaluate_masks()).

Differences from the reference, by design (SURVEY.md §7.3/§7.4):
- train step and eval step are separately jitted, buffers donated;
- evaluation cadence is a flag (`eval_every`) instead of a hard-wired second
  full forward every epoch;
- metrics (accuracy / micro-F1 / ROC-AUC) are computed on device;
- timing uses explicit wall timers around blocking device calls, not
  monkey-patched module methods;
- best-val-selects-test protocol is identical (maxk_gnn_dgl.py:135-137).
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from spgemm_gnn_tpu.graphs.datasets import Dataset, load_dataset
from spgemm_gnn_tpu.models.models import build_model
from spgemm_gnn_tpu.train.config import TrainConfig
from spgemm_gnn_tpu.train.losses import loss_fn
from spgemm_gnn_tpu.train.metrics import micro_f1, rocauc_jax
from spgemm_gnn_tpu.train.optim import build_optimizer
from spgemm_gnn_tpu.utils.logging import get_logger


@dataclasses.dataclass
class EpochRecord:
    epoch: int
    loss: float
    train_acc: float
    val_acc: float
    test_acc: float


class Trainer:
    """Owns the jitted train/eval steps for one (config, dataset) pair."""

    def __init__(self, config: TrainConfig, dataset: Dataset | None = None,
                 logger=None):
        self.config = config
        self.logger = logger or get_logger(None)
        # device_inputs applies only to single-chip synthetic runs; warn (and
        # keep the host payload) when it cannot take effect, instead of
        # silently doing the transfer the user asked to avoid
        self._device_inputs = bool(config.device_inputs and config.synthetic
                                   and config.mesh_shape <= 1)
        if config.device_inputs and not self._device_inputs:
            self.logger.warning(
                "--device_inputs ignored: it requires --synthetic and a "
                "single-chip run (mesh_shape <= 1); host features will "
                "transfer as usual")
        if dataset is None:
            dataset = load_dataset(
                config.dataset, config.data_path, self_loop=config.selfloop,
                allow_synthetic=config.synthetic,
                synthetic_scale=config.synthetic_scale, seed=config.seed,
                # skip the host-side 0.5-0.9 GB synthetic feature build when
                # features are synthesized on device (code review r5)
                synthetic_payload=not self._device_inputs)
        self.dataset = dataset
        self.g = dataset.graph
        dtype = jnp.dtype(config.dtype)
        from spgemm_gnn_tpu.kernels import planned
        planned.DEFAULT_STREAM = config.stream   # set unconditionally: the
        # knob is process-global and a previous Trainer may have changed it
        self.mesh = None
        if config.mesh_shape > 1:
            # graph-partition data layout over a 1-D device mesh: node arrays
            # sharded by contiguous blocks, edges co-located with their
            # destination block. impl pallas → per-shard tile-plan kernels
            # (parallel/planned_sharded.py); otherwise the XLA collective path
            # (parallel/sharded.py).
            from spgemm_gnn_tpu.parallel.mesh import make_mesh
            self.mesh = make_mesh(config.mesh_shape)
            if config.impl == "pallas":
                import os
                from spgemm_gnn_tpu.parallel.planned_sharded import (
                    shard_planned_graph)
                # sharded host builds disk-cache next to the data like the
                # single-chip plans (generate_meta.py amortisation)
                cache = (None if config.synthetic
                         else os.path.join(config.data_path, "plans"))
                sg = shard_planned_graph(dataset.graph, self.mesh,
                                         cache_dir=cache)
            else:
                from spgemm_gnn_tpu.parallel.sharded import shard_graph
                sg = shard_graph(dataset.graph, self.mesh)
            self.g = sg
            n_pad = sg.padded_nodes
            node_sh = sg.node_sharding()

            def pad_put(a, fill=0, cast=None):
                # cast BEFORE device_put: the tunnel transfer is the scarce
                # resource (CLAUDE.md), and an f32→bf16 cast on host halves
                # the feature payload vs casting on device afterwards
                a = np.asarray(a)
                if cast is not None:
                    a = a.astype(cast)
                out = np.full((n_pad,) + a.shape[1:], fill, a.dtype)
                out[: a.shape[0]] = a
                return jax.device_put(out, node_sh)

            self.features = pad_put(dataset.features, cast=dtype)
            self.labels = pad_put(dataset.labels)
            self.masks = tuple(pad_put(m, False) for m in
                               (dataset.train_mask, dataset.val_mask,
                                dataset.test_mask))
        elif config.impl in ("pallas", "auto"):
            # single device: attach tile plans so the Pallas kernels engage
            # (the planned kernel accelerates the ReLU-dense path too).
            # Real-dataset plans are disk-cached next to the data (the
            # generate_meta.py amortisation) so reruns skip the build.
            import os
            from spgemm_gnn_tpu.kernels.planned import plan_graph
            cache = (None if config.synthetic
                     else os.path.join(config.data_path, "plans"))
            self.g = plan_graph(dataset.graph, cache_dir=cache)
            self.features, self.labels = self._load_inputs(dataset, dtype)
            self.masks = tuple(jnp.asarray(m) for m in
                               (dataset.train_mask, dataset.val_mask,
                                dataset.test_mask))
        else:
            self.features, self.labels = self._load_inputs(dataset, dtype)
            self.masks = tuple(jnp.asarray(m) for m in
                               (dataset.train_mask, dataset.val_mask,
                                dataset.test_mask))
        self.model = build_model(
            config.model, hidden_dim=config.hidden_dim,
            num_layers=config.hidden_layers, out_dim=dataset.num_classes,
            maxk=config.maxk, feat_drop=config.dropout, use_norm=config.norm,
            nonlinear=config.nonlinear, impl=config.impl, remat=config.remat,
            dtype=dtype)
        self.tx = build_optimizer(config.w_lr, config.w_weight_decay,
                                  config.enable_lookahead)
        self._loss = loss_fn(dataset.multilabel)
        self._use_rocauc = dataset.name == "ogbn-proteins"
        self._build_steps()

    def _load_inputs(self, dataset, dtype):
        """(features, labels) for the single-chip paths. With
        --device_inputs on a synthetic run, both are synthesized ON DEVICE
        (graphs/datasets.py::device_synthetic_inputs) so only graph/plan
        arrays cross the tunnel — the bench.py input pattern applied to the
        Trainer (VERDICT r4 #3: full-scale feature matrices are 0.5-0.9 GB
        and stall degraded-tunnel days)."""
        cfg = self.config
        if self._device_inputs:
            from spgemm_gnn_tpu.graphs.datasets import device_synthetic_inputs
            self.logger.info("device_inputs: synthesizing features/labels "
                             "on device (no host feature transfer)")
            feat, labels = device_synthetic_inputs(
                dataset.name, cfg.synthetic_scale, cfg.seed)
            return feat.astype(dtype), labels
        return (self._load_features(dataset, dtype),
                jnp.asarray(dataset.labels))

    def _load_features(self, dataset, dtype):
        """Features via the configured store (reference --cache-strategy flag,
        utils/config.py:59-63 → graphs/features.py). Full-graph training needs
        every feature each step, so the store serves the complete matrix; the
        policy/stats machinery mirrors the reference's cache subsystem and is
        exercised through `fetch` in minibatch-style use."""
        if self.config.cache_strategy == "none":
            # cast on HOST first so the tunnel moves the narrow dtype
            # (f32→bf16 halves the payload; see pad_put above)
            return jnp.asarray(np.asarray(dataset.features, dtype))
        from spgemm_gnn_tpu.graphs.features import make_feature_store
        self.feature_store = make_feature_store(
            dataset.features, policy=self.config.cache_strategy,
            cache_ratio=self.config.cache_size_ratio,
            out_degrees=np.asarray(dataset.graph.out_degrees), dtype=dtype)
        self.logger.info("Feature store: %s (capacity ratio %.2f)",
                         self.config.cache_strategy,
                         self.config.cache_size_ratio)
        return self.feature_store.full()

    # -- state ---------------------------------------------------------------

    def init_state(self, seed: int | None = None):
        seed = self.config.seed if seed is None else seed
        rng = jax.random.PRNGKey(seed)
        variables = self.model.init({"params": rng}, self.g, self.features,
                                    train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        state = {"params": params, "batch_stats": batch_stats,
                 "opt_state": opt_state, "step": jnp.zeros((), jnp.int32)}
        if self.mesh is not None:   # replicate model state over the mesh
            from jax.sharding import NamedSharding, PartitionSpec as P
            state = jax.device_put(state, NamedSharding(self.mesh, P()))
        return state

    # -- jitted steps --------------------------------------------------------

    def _build_steps(self):
        # NOTE: the graph and data arrays are explicit jit ARGUMENTS, never
        # closures — closed-over arrays get embedded as HLO constants, which
        # bloats (and on the remote-compile TPU path, breaks) compilation.
        model = self.model
        loss_f = self._loss
        use_rocauc = self._use_rocauc
        tx = self.tx

        def train_step(state, dropout_rng, g, features, labels, train_mask):
            def loss_of(params):
                variables = {"params": params}
                if state["batch_stats"]:
                    variables["batch_stats"] = state["batch_stats"]
                    logits, new_vars = model.apply(
                        variables, g, features, train=True,
                        rngs={"dropout": dropout_rng}, mutable=["batch_stats"])
                else:
                    logits = model.apply(variables, g, features, train=True,
                                         rngs={"dropout": dropout_rng})
                    new_vars = {}
                return loss_f(logits, labels, train_mask), new_vars

            (loss, new_vars), grads = jax.value_and_grad(
                loss_of, has_aux=True)(state["params"])
            updates, opt_state = tx.update(grads, state["opt_state"],
                                           state["params"])
            params = optax.apply_updates(state["params"], updates)
            new_state = {
                "params": params,
                "batch_stats": new_vars.get("batch_stats",
                                            state["batch_stats"]),
                "opt_state": opt_state,
                "step": state["step"] + 1,
            }
            return new_state, loss

        def eval_step(params, batch_stats, g, features, labels, masks):
            train_mask, val_mask, test_mask = masks
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            logits = model.apply(variables, g, features, train=False)
            if use_rocauc:
                metric = lambda m: rocauc_jax(logits, labels, m)
            else:
                metric = lambda m: micro_f1(logits, labels, m)
            return metric(train_mask), metric(val_mask), metric(test_mask)

        def train_steps(state, rng, g, features, labels, train_mask,
                        n_steps: int):
            """n_steps consecutive train steps in ONE dispatch via lax.scan
            (VERDICT r3 #4: small graphs are tunnel-dispatch-bound — flickr
            paid a host→device round-trip per 24 ms epoch). The rng split
            sequence matches the one-step-per-call driver exactly, so
            trajectories are identical for any batching factor."""
            def body(carry, _):
                st, r = carry
                r, dr = jax.random.split(r)
                st, loss = train_step(st, dr, g, features, labels, train_mask)
                return (st, r), loss

            (state, rng), losses = jax.lax.scan(body, (state, rng), None,
                                                length=n_steps)
            return state, rng, losses[-1]

        jit_train = jax.jit(train_step, donate_argnums=(0,))
        jit_trains = jax.jit(train_steps, donate_argnums=(0,),
                             static_argnums=(6,))
        jit_eval = jax.jit(eval_step)
        self.train_step = lambda state, rng: jit_train(
            state, rng, self.g, self.features, self.labels, self.masks[0])
        # batched: returns (state, advanced_rng, last_loss)
        self.train_steps = lambda state, rng, n: jit_trains(
            state, rng, self.g, self.features, self.labels, self.masks[0], n)
        self.eval_step = lambda params, batch_stats: jit_eval(
            params, batch_stats, self.g, self.features, self.labels,
            self.masks)

    # -- driver --------------------------------------------------------------

    def predict(self, state, node_ids) -> jax.Array:
        """Minibatch inference for a node batch: L-hop subgraph + feature
        fetch through the configured store (train/infer.py). Cache-policy
        stores serve hot rows from the device buffer."""
        from spgemm_gnn_tpu.graphs.features import DeviceFeatureStore
        from spgemm_gnn_tpu.train.infer import predict_nodes
        store = getattr(self, "feature_store", None)
        if store is None:
            store = DeviceFeatureStore(self.features)
        g = self.dataset.graph
        return predict_nodes(self.model, state["params"], g, store, node_ids,
                             hops=self.config.hidden_layers)

    def evaluate_checkpoint(self, path: str) -> tuple[float, float, float]:
        """Eval-only mode (the reference's unused `--evaluate PATH` flag,
        utils/config.py:55-56 — here it works)."""
        from spgemm_gnn_tpu.train import checkpoint as ckpt
        state = ckpt.restore_checkpoint(path, self.init_state())
        tr, va, te = self.eval_step(state["params"], state["batch_stats"])
        return float(tr), float(va), float(te)

    def run(self, epochs: int | None = None,
            on_epoch: Callable[[EpochRecord], None] | None = None
            ) -> dict[str, Any]:
        from spgemm_gnn_tpu.train import checkpoint as ckpt
        cfg = self.config
        epochs = cfg.epochs if epochs is None else epochs
        state = self.init_state()
        from spgemm_gnn_tpu.utils.logging import param_size
        # shape/size trace at start (reference logs input/per-layer shapes on
        # epoch 0 via forward hooks, maxk_gnn_dgl.py:101-126)
        self.logger.info("Input features shape: %s",
                         tuple(self.features.shape))
        self.logger.info("Hidden: %d x %d layers -> %d classes",
                         cfg.hidden_dim, cfg.hidden_layers,
                         self.dataset.num_classes)
        self.logger.info("Model parameters: %.2f MB",
                         param_size(state["params"]))
        start_epoch = 0
        if cfg.resume:
            last = ckpt.latest_step(cfg.path)
            if last is not None:
                state = ckpt.restore_checkpoint(cfg.path, state)
                start_epoch = int(state["step"])
                self.logger.info("Resumed from step %d", start_epoch)
        rng = jax.random.PRNGKey(cfg.seed + 1)
        best_val, best_test, best_epoch = 0.0, 0.0, -1
        best_state = None   # host snapshot at the best-val epoch
        history: list[EpochRecord] = []
        # Deferred metric fetching (VERDICT r3 #8): eval metrics stay DEVICE
        # scalars and are host-synced in batches of eval_fetch_every — each
        # per-eval float() is a full pipeline drain through the (slow) tunnel,
        # which turned full-Reddit's 1.63 s training epochs into 5.0 s at
        # --eval_every 3. Checkpointing (or a fetch cadence of 1) keeps the
        # old per-eval sync: the best-val state snapshot must be taken AT the
        # best epoch, before params move on.
        pending: list[tuple[int, Any, Any, Any, Any]] = []
        fetch_every = (1 if cfg.checkpoint_every else
                       max(int(getattr(cfg, "eval_fetch_every", 1)), 1))

        def flush():
            nonlocal best_val, best_test, best_epoch, best_state
            if not pending:
                return
            rows = jax.device_get([p[1:] for p in pending])
            for (epoch, *_), (loss, tr, va, te) in zip(pending, rows):
                loss, tr, va, te = float(loss), float(tr), float(va), float(te)
                if va > best_val:
                    best_val, best_test, best_epoch = va, te, epoch
                    if cfg.checkpoint_every:
                        # remember the best-val state (saved at the end) so
                        # the 'best' checkpoint exists regardless of whether
                        # the best epoch lands on a checkpoint_every boundary
                        best_state = jax.device_get(state)
                rec = EpochRecord(epoch, loss, tr, va, te)
                history.append(rec)
                if on_epoch is not None:
                    on_epoch(rec)
                if cfg.log_every and epoch % cfg.log_every == 0:
                    self.logger.info(
                        "Epoch %04d/%04d| Loss %.4f | Train Accuracy %.4f | "
                        "Val Accuracy %.4f | Test Accuracy %.4f | "
                        "Best val. Accuracy %.4f | Best test Accuracy %.4f",
                        epoch, epochs, loss, tr, va, te, best_val, best_test)
            pending.clear()

        # Epoch batching (VERDICT r3 #4): steps_per_call > 1 runs that many
        # consecutive train epochs in ONE dispatch (lax.scan, state donated) —
        # small graphs are tunnel-dispatch-bound, paying a host round-trip per
        # epoch otherwise. Groups never straddle a host-visible boundary (an
        # eval epoch or a checkpoint boundary), and the rng split sequence is
        # identical to unbatched stepping, so results match exactly.
        spc = max(int(getattr(cfg, "steps_per_call", 1)), 1)

        def group_size(e: int) -> int:
            n = min(spc, epochs - e)
            if cfg.eval_every:
                r = e % cfg.eval_every
                to_eval = 1 if r == 0 else cfg.eval_every - r + 1
                n = min(n, to_eval, max(epochs - 1 - e, 0) + 1)
            if cfg.checkpoint_every:
                n = min(n, cfg.checkpoint_every - (e % cfg.checkpoint_every))
            return max(n, 1)

        t_start = time.perf_counter()
        t_steady = None   # wall clock after the first (compiling) group
        steady_from = None
        epoch = start_epoch
        while epoch < epochs:
            n = group_size(epoch)
            if n == 1:
                rng, dr = jax.random.split(rng)
                state, loss = self.train_step(state, dr)
            else:
                state, rng, loss = self.train_steps(state, rng, n)
            epoch += n
            last = epoch - 1    # the epoch whose state we now hold
            if cfg.eval_every and (last % cfg.eval_every == 0
                                   or last == epochs - 1):
                tr, va, te = self.eval_step(state["params"],
                                            state["batch_stats"])
                pending.append((last, loss, tr, va, te))
                if len(pending) >= fetch_every:
                    flush()
            # periodic checkpointing is independent of the eval cadence
            if cfg.checkpoint_every and (last + 1) % cfg.checkpoint_every == 0:
                flush()   # best_epoch must be current for is_best
                ckpt.save_checkpoint(cfg.path, state, last + 1,
                                     is_best=(best_epoch == last))
            if t_steady is None:
                # start the steady-state clock after the FIRST full
                # iteration — train group AND (if the cadence hits it)
                # eval — so neither compile lands in the measured window
                jax.block_until_ready(loss)
                t_steady = time.perf_counter()
                steady_from = epoch
        flush()
        jax.block_until_ready(state["params"])
        wall = time.perf_counter() - t_start
        # steady-state epoch time: everything after the first (compiling)
        # step, eval/checkpoint cadence included — the number RESULTS quotes
        steady = ((time.perf_counter() - t_steady)
                  / max(epochs - steady_from, 1)
                  if t_steady is not None and epochs - steady_from > 0
                  else None)
        if steady is not None:
            self.logger.info("Steady-state epoch time: %.3f s", steady)
        if cfg.checkpoint_every:
            ckpt.save_checkpoint(cfg.path, state, epochs)
            if best_state is not None:
                ckpt.save_checkpoint(cfg.path, best_state, best_epoch + 1,
                                     is_best=True)

        return {
            "best_val_accuracy": best_val,
            "best_test_accuracy": best_test,
            "best_epoch": best_epoch,
            "history": history,
            "wall_time_s": wall,
            "steady_epoch_s": steady,
            "final_state": state,
        }


def train_and_evaluate(config: TrainConfig, dataset: Dataset | None = None,
                       logger=None) -> dict[str, Any]:
    """One-call training run (the `python maxk_gnn_dgl.py ...` equivalent)."""
    trainer = Trainer(config, dataset, logger)
    return trainer.run()
