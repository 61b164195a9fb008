"""Training / prediction drivers (reference flair_hub/tasks/trainers.py,
Lightning Trainer replaced by an explicit jit loop over a device mesh).

Features ported: ModelCheckpoint (monitor val_miou, top-1 + optional last,
weights-only option), EarlyStopping, TensorBoard scalar logging
(tf.summary), BatchNorm/batch-size-1 abort guard, resume-from-safetensors,
final validate pass. Data parallelism: batches sharded over the mesh ``dp``
axis (parallel/mesh.py); gradient all-reduce is compiled by XLA.
"""

from __future__ import annotations

import logging
import math
import os
import sys
from pathlib import Path
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from flair_for_aigle_tpu.models.checkpoint import export_torch_state_dict
from flair_for_aigle_tpu.parallel.dist import is_rank_zero
from flair_for_aigle_tpu.parallel.mesh import (
    make_mesh,
    pad_batch_to,
    replicate_tree,
    shard_batch,
)
from flair_for_aigle_tpu.train.metrics import iou_from_confmat
from flair_for_aigle_tpu.train.optim import make_optimizer, make_scheduler
from flair_for_aigle_tpu.train.task import (
    TrainState,
    _array_batch,
    make_steps,
    set_learning_rate,
)

logger = logging.getLogger(__name__)


def check_batchnorm_and_batch_size(config: Dict[str, Any]) -> None:
    """Reference trainers.py:17-32: abort on batch_size=1 (models carry
    BatchNorm in decoders/UTAE)."""
    if config["hyperparams"]["batch_size"] == 1 and config["tasks"].get("train"):
        logger.info("Warning: BatchNorm layers with batch size 1.")
        logger.info("Aborting training to avoid potential issues.")
        sys.exit(1)


class _TBWriter:
    """TensorBoard scalar writer via tf.summary; no-op if TF unavailable."""

    def __init__(self, logdir: str):
        try:
            import tensorflow as tf  # noqa: PLC0415

            self._tf = tf
            self._writer = tf.summary.create_file_writer(logdir)
        except Exception:  # noqa: BLE001
            self._tf = None
            self._writer = None

    def scalar(self, name: str, value: float, step: int):
        if self._writer is not None:
            with self._writer.as_default():
                self._tf.summary.scalar(name, float(value), step=step)

    def flush(self):
        if self._writer is not None:
            self._writer.flush()


class CheckpointCallback:
    """ModelCheckpoint + EarlyStopping equivalent."""

    def __init__(self, config, out_dir):
        saving = config["saving"]
        self.monitor = saving.get("ckpt_monitor", "val_miou")
        self.mode = saving.get("ckpt_monitor_mode", "max")
        self.save_last = saving.get("ckpt_save_also_last", False)
        self.save_orbax = saving.get("save_full_state_orbax", False)
        self.patience = saving.get("ckpt_earlystopping_patience", 20)
        self.dirpath = Path(out_dir, "checkpoints")
        self.dirpath.mkdir(parents=True, exist_ok=True)
        self.out_model_name = config["paths"]["out_model_name"]
        self.best = -math.inf if self.mode == "max" else math.inf
        self.best_model_path: str | None = None
        self.bad_epochs = 0
        self.should_stop = False

    def _is_better(self, value):
        return value > self.best if self.mode == "max" else value < self.best

    def on_epoch_end(self, epoch, metrics, state) -> None:
        value = metrics.get(self.monitor)
        if value is None:
            return
        if self._is_better(value):
            self.best = value
            self.bad_epochs = 0
            path = self.dirpath / (
                f"ckpt-epoch{epoch:02d}-{self.monitor}{value:.4f}_"
                f"{self.out_model_name}.safetensors"
            )
            if is_rank_zero():
                save_state_safetensors(state, str(path))
                if self.best_model_path and os.path.exists(self.best_model_path):
                    os.remove(self.best_model_path)
            self.best_model_path = str(path)
        else:
            self.bad_epochs += 1
            if self.bad_epochs >= self.patience:
                self.should_stop = True
        if self.save_last and is_rank_zero():
            save_state_safetensors(
                state, str(self.dirpath / f"last_{self.out_model_name}.safetensors")
            )
        if self.save_orbax and is_rank_zero():
            save_orbax_checkpoint(
                state, str(self.dirpath / f"orbax_last_{self.out_model_name}")
            )


def save_state_safetensors(state: TrainState, path: str) -> None:
    """Persist weights in the reference's torch .safetensors layout (so our
    checkpoints interoperate with the PyTorch reference and our loader)."""
    from safetensors.numpy import save_file

    sd = export_torch_state_dict(
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)},
        transpose_conv_prefixes=(".up.0",),
    )
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)


def save_orbax_checkpoint(state: TrainState, path: str) -> None:
    """Full training state (params + batch stats + OPTIMIZER state + step)
    via orbax for exact resume — beyond the reference's weights-only resume
    (trainers.py:94-104). Enable per-epoch saves with the
    ``saving.save_full_state_orbax`` config flag."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.abspath(path),
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats),
         "opt_state": jax.device_get(state.opt_state),
         "step": int(state.step)},
        force=True,
    )
    ckptr.wait_until_finished()


def _epoch_metrics(confmats: Dict[str, np.ndarray], loss_sum, n_batches,
                   prefix: str) -> Dict[str, float]:
    out = {f"{prefix}_loss": float(loss_sum / max(n_batches, 1))}
    mious = []
    for task, cm in confmats.items():
        per_class, weighted = iou_from_confmat(cm)
        out[f"{prefix}_miou_{task.split('-')[-1]}"] = weighted
        for i, v in enumerate(per_class):
            out[f"{prefix}_iou_{task.split('-')[-1]}_{i}"] = float(v)
        mious.append(weighted)
    out[f"{prefix}_miou"] = float(np.mean(mious)) if mious else 0.0
    return out


def train(config: Dict[str, Any], data_module, model, variables,
          out_dir: str, mesh=None, aux_loss_fix: bool = False,
          epoch_hook=None) -> tuple[CheckpointCallback, TrainState]:
    """Fit loop. ``epoch_hook(epoch, metrics)``, if given, runs after each
    epoch's checkpointing — used by tools/train_loop_e2e.py to hard-kill
    the process mid-run for the resume-continuity proof."""
    check_batchnorm_and_batch_size(config)
    hp = config["hyperparams"]
    batch_size = hp["batch_size"]
    if mesh is None:
        # dp size must divide the global batch
        n_dev = len(jax.devices())
        dp = math.gcd(batch_size, n_dev)
        mesh = make_mesh(n_devices=dp)
    num_epochs = hp["num_epochs"]

    data_module.setup("fit")
    train_loader = data_module.train_dataloader()
    val_loader = data_module.val_dataloader()
    steps_per_epoch = max(1, len(train_loader))

    optimizer = make_optimizer(hp)
    opt_state = optimizer.init(variables["params"])
    state = TrainState(
        params=replicate_tree(mesh, variables["params"]),
        batch_stats=replicate_tree(mesh, variables.get("batch_stats", {})),
        opt_state=replicate_tree(mesh, opt_state),
        step=jnp.zeros((), jnp.int32),
    )

    if config["tasks"]["train_tasks"].get("resume_training_from_ckpt"):
        # reference trainers.py:94-104: reload weights then fit
        from flair_for_aigle_tpu.models.checkpoint import load_checkpoint

        v = {"params": state.params, "batch_stats": state.batch_stats}
        v, _ = load_checkpoint(config, v, transpose_conv_prefixes=(".up.0",),
                               exit_on_fail=False)
        state = state._replace(params=replicate_tree(mesh, v["params"]),
                               batch_stats=replicate_tree(mesh, v["batch_stats"]))

    orbax_resume = config["tasks"]["train_tasks"].get(
        "resume_full_state_from_orbax"
    )
    if orbax_resume:
        # full-state resume (params + optimizer + step); the reference's
        # resume is weights-only (trainers.py:94-104) — this is an
        # explicitly opt-in extension, off by default for parity
        state = restore_orbax_checkpoint(orbax_resume, state)
        state = state._replace(
            params=replicate_tree(mesh, state.params),
            batch_stats=replicate_tree(mesh, state.batch_stats),
            opt_state=replicate_tree(mesh, state.opt_state),
        )
        logger.info("Resumed full training state from %s (step %d)",
                    orbax_resume, int(state.step))

    # Schedule horizon AFTER any resume: hp.scheduler_total_steps pins the
    # original run's planned total (exact one_cycle continuity across a
    # kill/resume); otherwise the horizon is restored-step + epochs-to-run
    # — for a fresh run that is just steps_per_epoch*num_epochs, and for a
    # resumed run the schedule continues over the remaining epochs instead
    # of clamping every resumed step to the schedule's final (min) LR.
    total_steps = (hp.get("scheduler_total_steps")
                   or int(state.step) + steps_per_epoch * num_epochs)
    scheduler = make_scheduler(hp, total_steps)
    if int(state.step) and not hp.get("scheduler_total_steps"):
        logger.info(
            "scheduler horizon defaulted to resumed step + %d epochs = %d "
            "steps; set hyperparams.scheduler_total_steps to pin the "
            "original run's schedule instead", num_epochs, total_steps)

    train_step, eval_step, _ = make_steps(model, config, optimizer,
                                          aux_loss_fix=aux_loss_fix)
    ckpt_cb = CheckpointCallback(config, out_dir)
    tb = _TBWriter(os.path.join(
        out_dir, "tensorboard_logs_" + config["paths"]["out_model_name"]
    ))
    rng = jax.random.key(hp.get("seed", 0))
    # Resume continuity: num_epochs means "epochs to run NOW" (a resumed
    # run trains num_epochs more), but the scheduler step, the per-step rng
    # stream (fold_in below — step-keyed, not sequential) and the epoch
    # labels all continue from the restored step, so a killed-and-resumed
    # run retraces the exact trajectory of an uninterrupted one.
    global_step = int(state.step)
    epoch_offset = global_step // steps_per_epoch

    for epoch in range(epoch_offset, epoch_offset + num_epochs):
        # ---- train -----------------------------------------------------
        # accumulate loss/confmats/NaN-count as lazy device arrays: a
        # per-step float() would block on every step and defeat async
        # dispatch (round-1 measured 334 ms/step partly from this); one
        # device_get per epoch instead.
        n_batches = 0
        loss_dev = None
        nonfinite_dev = None
        confmats_dev: Dict[str, Any] = {}
        for batch in train_loader:
            batch = _array_batch(batch)
            batch, _ = pad_batch_to(batch, batch_size)
            batch = shard_batch(mesh, batch)
            lr = scheduler.lr_for_step(global_step)
            state = state._replace(
                opt_state=set_learning_rate(state.opt_state, lr)
            )
            sub = jax.random.fold_in(rng, global_step)
            state, m = train_step(state, batch, sub)
            step_nf = (~jnp.isfinite(m["loss"])).astype(jnp.int32)
            if loss_dev is None:
                loss_dev, nonfinite_dev = m["loss"], step_nf
            else:
                loss_dev = loss_dev + m["loss"]
                nonfinite_dev = nonfinite_dev + step_nf
            for t, cm in m["confmats"].items():
                confmats_dev[t] = (cm if t not in confmats_dev
                                   else confmats_dev[t] + cm)
            n_batches += 1
            global_step += 1
        loss_sum = float(jax.device_get(loss_dev)) if n_batches else 0.0
        n_nonfinite = int(jax.device_get(nonfinite_dev)) if n_batches else 0
        if n_nonfinite:
            # reference tasks_module.py:196-206 logs per step; device-side
            # accumulation reports the epoch count instead
            logger.info("NaN or Inf detected in loss at %d step(s) of epoch %d",
                        n_nonfinite, epoch)
        confmats = {t: np.asarray(jax.device_get(cm))
                    for t, cm in confmats_dev.items()}
        train_metrics = _epoch_metrics(confmats, loss_sum, n_batches, "train")
        tb.scalar("train_loss", train_metrics["train_loss"], epoch)
        tb.scalar("train_miou", train_metrics["train_miou"], epoch)
        tb.scalar("lr", scheduler.lr_for_step(max(global_step - 1, 0)), epoch)

        # ---- validate --------------------------------------------------
        val_metrics = validate(config, val_loader, eval_step, state, mesh,
                               batch_size)
        for k, v in val_metrics.items():
            if k.count("_") <= 2:
                tb.scalar(k, v, epoch)
        scheduler.epoch_end(val_metrics["val_loss"])

        logger.info(
            "epoch %d: train_loss %.4f train_miou %.4f | val_loss %.4f "
            "val_miou %.4f",
            epoch, train_metrics["train_loss"], train_metrics["train_miou"],
            val_metrics["val_loss"], val_metrics["val_miou"],
        )
        ckpt_cb.on_epoch_end(epoch, {**train_metrics, **val_metrics}, state)
        if epoch_hook is not None:
            epoch_hook(epoch, {**train_metrics, **val_metrics})
        if ckpt_cb.should_stop:
            logger.info("Early stopping at epoch %d", epoch)
            break

    # final validate (reference trainers.py:431)
    validate(config, val_loader, eval_step, state, mesh, batch_size)
    tb.flush()
    return ckpt_cb, state


def validate(config, val_loader, eval_step, state, mesh, batch_size
             ) -> Dict[str, float]:
    n_batches = 0
    loss_dev = None
    confmats_dev: Dict[str, Any] = {}
    for batch in val_loader:
        batch = _array_batch(batch)
        batch, _ = pad_batch_to(batch, batch_size)
        batch = shard_batch(mesh, batch)
        m = eval_step(state, batch)
        loss_dev = m["loss"] if loss_dev is None else loss_dev + m["loss"]
        for t, cm in m["confmats"].items():
            confmats_dev[t] = (cm if t not in confmats_dev
                               else confmats_dev[t] + cm)
        n_batches += 1
    loss_sum = float(jax.device_get(loss_dev)) if n_batches else 0.0
    confmats = {t: np.asarray(jax.device_get(cm))
                for t, cm in confmats_dev.items()}
    return _epoch_metrics(confmats, loss_sum, n_batches, "val")


def predict(config: Dict[str, Any], data_module, model, state: TrainState,
            out_dir: str) -> None:
    """Prediction driver with PredictionWriter callback
    (reference trainers.py:436-461)."""
    from flair_for_aigle_tpu.train.task import make_steps
    from flair_for_aigle_tpu.train.optim import make_optimizer
    from flair_for_aigle_tpu.writer.prediction_writer import PredictionWriter

    data_module.setup("predict")
    loader = data_module.predict_dataloader()
    _, _, predict_step = make_steps(
        model, config, make_optimizer(config["hyperparams"])
    )
    writer = PredictionWriter(config, output_dir=out_dir)
    for batch in loader:
        arr = _array_batch(batch)
        preds = predict_step(state, arr)
        preds = {k: np.asarray(v) for k, v in preds.items()}
        writer.write_on_batch_end(preds, batch)
    writer.on_predict_epoch_end()


def restore_orbax_checkpoint(path: str, state: TrainState) -> TrainState:
    """Restore the full state saved by save_orbax_checkpoint (params, batch
    stats, optimizer state, step). Config flag:
    ``tasks.train_tasks.resume_full_state_from_orbax: <path>``."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = {"params": jax.device_get(state.params),
              "batch_stats": jax.device_get(state.batch_stats),
              "opt_state": jax.device_get(state.opt_state),
              "step": 0}
    restored = ckptr.restore(os.path.abspath(path), target)
    return state._replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=jnp.asarray(restored["step"], jnp.int32),
    )
