"""On-device segmentation metrics.

Confusion matrices are computed with a one-hot bincount inside the jit'd
step; under a data-parallel mesh the reduction is a global sum compiled by
XLA into ICI collectives (replacing the reference's
``torch.distributed.all_gather`` of confmats,
flair_hub/writer/prediction_writer.py:76-82). IoU summaries follow
torchmetrics ``MulticlassJaccardIndex`` (weighted + per-class).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(preds: jax.Array, targets: jax.Array,
                     num_classes: int) -> jax.Array:
    """(..., ) int preds/targets -> (C, C) int32 confusion matrix
    (rows = target, cols = pred; sklearn layout)."""
    idx = targets.reshape(-1) * num_classes + preds.reshape(-1)
    counts = jnp.bincount(idx, length=num_classes * num_classes)
    return counts.reshape(num_classes, num_classes).astype(jnp.int32)


def iou_from_confmat(confmat: np.ndarray):
    """(per_class_iou, weighted_miou) — torchmetrics semantics: classes
    absent from both target and prediction contribute 0; weighting by
    target support."""
    cm = np.asarray(confmat, np.float64)
    inter = np.diag(cm)
    union = cm.sum(0) + cm.sum(1) - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    support = cm.sum(1)
    total = support.sum()
    weighted = float((iou * support).sum() / total) if total > 0 else 0.0
    return iou, weighted


def per_class_mean_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean unweighted CE per class (reference _log_per_class_loss,
    tasks_module.py:280-300) — computed from the SAME forward (the
    reference re-runs a second forward per val step; see SURVEY.md
    quirk list)."""
    n_cls = logits.shape[1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=1)[:, 0]
    onehot = jax.nn.one_hot(targets, n_cls, dtype=jnp.float32)
    per_class_sum = jnp.einsum("bhw,bhwc->c", nll, onehot)
    counts = onehot.sum(axis=(0, 1, 2))
    return jnp.where(counts > 0, per_class_sum / jnp.maximum(counts, 1), 0.0)
