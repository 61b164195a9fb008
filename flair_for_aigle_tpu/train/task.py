"""Segmentation task step functions (reference SegmentationTask,
flair_hub/tasks/tasks_module.py — the Lightning module becomes pure jit'd
train/eval steps over an explicit TrainState).

Quirk compatibility: the reference's auxiliary loss is dead code (keys
``aux_{mod}_{task}`` never match its ``task in dict_logits_aux`` check —
tasks_module.py:180-184). ``aux_loss_fix=False`` reproduces that (no aux
gradient); ``True`` enables the evidently-intended aux loss with
``aux_loss_weight`` scaling.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from flair_for_aigle_tpu.train.losses import build_loss_weights, weighted_cross_entropy
from flair_for_aigle_tpu.train.metrics import confusion_matrix, per_class_mean_loss


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def _array_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Drop non-array entries (ID strings, python lists) before jit."""
    return {
        k: v for k, v in batch.items()
        if hasattr(v, "dtype") or isinstance(v, (np.ndarray,))
    }


def make_steps(model, config: Dict[str, Any], optimizer,
               aux_loss_fix: bool = False):
    """Build (train_step, eval_step, predict_step) jit'd functions."""
    labels = list(config["labels"])
    nclasses = {
        t: len(config["labels_configs"][t]["value_name"]) for t in labels
    }
    weights = {k: jnp.asarray(v) for k, v in build_loss_weights(config).items()}
    task_weights = {
        t: float(config["labels_configs"][t].get("task_weight", 1.0))
        for t in labels
    }
    aux_weight = config["modalities"].get("aux_loss_weight", 1.0)
    aux_mods = [
        m for m, a in config["modalities"].get("aux_loss", {}).items()
        if a and config["modalities"]["inputs"].get(m, False)
    ]
    mod_dropout = any(
        v > 0 for v in config["modalities"].get("modality_dropout", {}).values()
    )
    compute_dtype = (
        jnp.bfloat16
        if config["hyperparams"].get("compute_dtype") == "bfloat16"
        else None
    )

    def cast_inputs(batch):
        if compute_dtype is None:
            return batch
        out = {}
        for k, v in batch.items():
            if (hasattr(v, "dtype") and v.dtype == jnp.float32
                    and not k.endswith("_DATES") and k not in labels):
                v = v.astype(compute_dtype)
            out[k] = v
        return out

    def compute_loss(logits_tasks, logits_aux, batch):
        loss_sum = 0.0
        preds, targets_out = {}, {}
        for task in labels:
            targets = batch[task]
            if targets.ndim == 4:
                targets = jnp.argmax(targets, axis=1)
            targets = targets.astype(jnp.int32)
            main_loss = weighted_cross_entropy(
                logits_tasks[task], targets, weights[task]
            )
            aux_loss = 0.0
            if aux_loss_fix and aux_mods:
                aux_terms = []
                for mod in aux_mods:
                    key = f"aux_{mod}_{task}"
                    if key in logits_aux:
                        w = aux_weight if not isinstance(aux_weight, dict) else \
                            aux_weight.get(mod, 1.0)
                        aux_terms.append(
                            w * weighted_cross_entropy(
                                logits_aux[key], targets, weights[key]
                            )
                        )
                if aux_terms:
                    aux_loss = jnp.mean(jnp.stack(aux_terms))
            loss_sum = loss_sum + task_weights[task] * (main_loss + aux_loss)
            preds[task] = jnp.argmax(logits_tasks[task], axis=1)
            targets_out[task] = targets
        return loss_sum, (preds, targets_out)

    @jax.jit
    def train_step(state: TrainState, batch: Dict[str, Any], rng):
        rngs = dict(zip(("dropout", "mod_dropout"), jax.random.split(rng)))

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (logits_tasks, logits_aux), mut = model.apply(
                variables, cast_inputs(batch), apply_mod_dropout=mod_dropout,
                train=True, mutable=["batch_stats"], rngs=rngs,
            )
            loss, (preds, targets) = compute_loss(logits_tasks, logits_aux, batch)
            return loss, (mut["batch_stats"], preds, targets)

        (loss, (new_bs, preds, targets)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        import optax

        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_bs, new_opt, state.step + 1)
        confmats = {
            t: confusion_matrix(preds[t], targets[t], nclasses[t])
            for t in labels
        }
        return new_state, {"loss": loss, "confmats": confmats}

    @jax.jit
    def eval_step(state: TrainState, batch: Dict[str, Any]):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        logits_tasks, logits_aux = model.apply(variables, cast_inputs(batch),
                                               train=False)
        loss, (preds, targets) = compute_loss(logits_tasks, logits_aux, batch)
        confmats = {}
        per_class_losses = {}
        for t in labels:
            confmats[t] = confusion_matrix(preds[t], targets[t], nclasses[t])
            per_class_losses[t] = per_class_mean_loss(
                logits_tasks[t], targets[t]
            )
        return {"loss": loss, "confmats": confmats,
                "per_class_loss": per_class_losses}

    @jax.jit
    def predict_step(state: TrainState, batch: Dict[str, Any]):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        logits_tasks, _ = model.apply(variables, batch, train=False)
        return {
            f"preds_{task}": jnp.argmax(
                jax.nn.softmax(logits_tasks[task], axis=1), axis=1
            )
            for task in labels
        }

    return train_step, eval_step, predict_step


def set_learning_rate(opt_state, lr: float):
    """Mutate the injected learning rate (optax.inject_hyperparams)."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state
