"""Multi-task weighted cross-entropy losses (reference FLAIRLosses,
flair_hub/tasks/module_setup.py:119-218).

Class-weight vectors: per task ``value_weights.default`` broadcast +
``default_exceptions`` overrides (zero weight = ignore); aux losses clone
the task weights and apply ``per_modality_exceptions``. The loss itself
matches torch ``nn.CrossEntropyLoss(weight=w)``: sum(w[t] * nll) / sum(w[t]).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def compute_default_weights(task_config: Dict[str, Any]) -> np.ndarray:
    n = len(task_config["value_name"])
    w = np.full(n, float(task_config["value_weights"]["default"]), np.float32)
    exceptions = task_config["value_weights"].get("default_exceptions") or {}
    for k, v in exceptions.items():
        w[int(k)] = float(v)
    return w


def build_loss_weights(config: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """{task: weights} plus {'aux_<mod>_<task>': weights} for active aux."""
    weights: Dict[str, np.ndarray] = {}
    for task in config["labels"]:
        task_cfg = config["labels_configs"][task]
        weights[task] = compute_default_weights(task_cfg)
        for modality, aux_active in config["modalities"].get("aux_loss", {}).items():
            if aux_active and config["modalities"]["inputs"].get(modality, False):
                w = weights[task].copy()
                mod_exc = (task_cfg["value_weights"]
                           .get("per_modality_exceptions", {}) or {}).get(modality)
                if mod_exc:
                    for k, v in mod_exc.items():
                        w[int(k)] = float(v)
                weights[f"aux_{modality}_{task}"] = w
    return weights


def weighted_cross_entropy(logits: jax.Array, targets: jax.Array,
                           weights: jax.Array) -> jax.Array:
    """torch CrossEntropyLoss(weight=w) semantics.

    logits (B, C, H, W) float; targets (B, H, W) int; weights (C,).
    """
    lf = logits.astype(jnp.float32)
    # nll = logsumexp - logit_at_target, with the target pick as a dense
    # one-hot contraction: identical math to log_softmax + take_along_axis,
    # but the backward is the dense (softmax - onehot) instead of a
    # scatter-add into (B, C, H, W) — scatters measured pathological on
    # TPU at the 512x512x19 logit size (tools/exp_train_decomp.py).
    # Targets are clamped into [0, C) first (same policy as jnp's clamped
    # gather, and the same clamp weights[targets] applies below), and the
    # pick uses where() instead of multiply so a -inf logit elsewhere in a
    # pixel's class vector cannot poison the sum with -inf * 0 = NaN.
    lse = jax.scipy.special.logsumexp(lf, axis=1)
    tc = jnp.clip(targets, 0, lf.shape[1] - 1)
    onehot = tc[:, None] == jnp.arange(lf.shape[1])[None, :, None, None]
    picked = jnp.sum(jnp.where(onehot, lf, 0.0), axis=1)
    nll = lse - picked
    w = weights[targets]
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-12)
