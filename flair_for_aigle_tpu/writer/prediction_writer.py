"""Prediction writer (reference writer/prediction_writer.py).

Per predict batch: writes ``PRED_<name>.tif`` per task (georeferenced from
the source label raster profile, or plain TIFF via PIL) and accumulates a
confusion matrix against the ground truth read from the label raster named
in the batch ID. At epoch end the (already globally-reduced — metrics come
out of the jit'd eval) confusion matrices are persisted on rank zero.
Metrics-only mode recomputes everything from rasters on disk.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict

import numpy as np

from flair_for_aigle_tpu.geo.geotiff import open_raster, write_geotiff
from flair_for_aigle_tpu.parallel.dist import (
    all_sum_host,
    is_rank_zero,
    rank_zero_only,
)
from flair_for_aigle_tpu.writer.metrics_utils import compute_and_save_metrics

logger = logging.getLogger(__name__)


def _sklearn_confmat(target: np.ndarray, pred: np.ndarray, n: int) -> np.ndarray:
    idx = target.astype(np.int64).ravel() * n + pred.astype(np.int64).ravel()
    keep = (target.ravel() >= 0) & (target.ravel() < n) & \
           (pred.ravel() >= 0) & (pred.ravel() < n)
    return np.bincount(idx[keep], minlength=n * n).reshape(n, n)


class PredictionWriter:
    def __init__(self, config: dict, output_dir: str, write_interval="batch"):
        self.config = config
        self.output_dir = output_dir
        self.accumulated_confmats: Dict[str, np.ndarray | None] = {
            task: None for task in config["labels"]
        }

    def write_on_batch_end(self, prediction: Dict[str, np.ndarray],
                           batch: Dict) -> None:
        for task in self.config["labels"]:
            id_in_file = batch[f"ID_{task}"]
            n = len(self.config["labels_configs"][task]["value_name"])
            if self.accumulated_confmats[task] is None:
                self.accumulated_confmats[task] = np.zeros((n, n), dtype=int)

            out_dir = Path(self.output_dir,
                           f"predictions_{self.config['paths']['out_model_name']}",
                           task)
            out_dir.mkdir(exist_ok=True, parents=True)

            preds = np.asarray(prediction[f"preds_{task}"]).astype("uint8")
            channel = self.config["labels_configs"][task].get(
                "label_channel_nomenclature", 1
            )
            src_path = id_in_file[0] if isinstance(id_in_file, list) else id_in_file
            with open_raster(src_path) as src:
                target = np.squeeze(src.read(channel))
                transform, crs = src.transform, src.crs

            if self.config["tasks"].get("write_files", True):
                out_name = f"PRED_{str(src_path).split('/')[-1]}"
                out_file = str(out_dir / out_name)
                if self.config["tasks"].get("georeferencing_output", True):
                    write_geotiff(out_file, preds[0][None], transform, crs,
                                  compress="lzw")
                else:
                    from PIL import Image

                    Image.fromarray(preds[0]).save(out_file,
                                                   compression="tiff_lzw")

            self.accumulated_confmats[task] += _sklearn_confmat(
                target, preds[0], n
            )

    def on_predict_epoch_end(self) -> None:
        for task, confmat in self.accumulated_confmats.items():
            if confmat is None:
                n = len(self.config["labels_configs"][task]["value_name"])
                confmat = np.zeros((n, n), dtype=int)
            # reduce shard-local confmats across processes (reference
            # prediction_writer.py:68-87: all_gather + rank-0 sum)
            confmat = all_sum_host(confmat)
            self.accumulated_confmats[task] = confmat
            if is_rank_zero():
                compute_and_save_metrics(confmat, self.config,
                                         self.output_dir, task, mode="predict")

    @rank_zero_only
    def load_predictions_and_compute_metrics(self) -> None:
        """Metrics-only mode (reference :92-167)."""
        import pandas as pd

        any_found = False
        for task in self.config["labels"]:
            n = len(self.config["labels_configs"][task]["value_name"])
            accum = np.zeros((n, n), dtype=int)
            df = pd.read_csv(Path(self.config["paths"]["test_csv"]))
            gt_paths = df[task].tolist()
            pred_dir = Path(self.output_dir) / (
                f"predictions_{self.config['paths']['out_model_name']}"
            ) / task
            valid = 0
            for gt_path in gt_paths:
                gt_path = Path(gt_path)
                pred_path = pred_dir / f"PRED_{gt_path.name}"
                if not pred_path.exists():
                    continue
                try:
                    channel = self.config["labels_configs"][task].get(
                        "label_channel_nomenclature", 1
                    )
                    with open_raster(str(gt_path)) as src:
                        gt = np.squeeze(src.read(channel))
                    with open_raster(str(pred_path)) as src:
                        pred = np.squeeze(src.read(1))
                    assert gt.shape == pred.shape
                    accum += _sklearn_confmat(gt, pred, n)
                    valid += 1
                except Exception as e:  # noqa: BLE001
                    logger.info("[ERROR] Failed to process %s: %s",
                                gt_path.name, e)
            logger.info("Confmat sum: %d; processed %d/%d", accum.sum(),
                        valid, len(gt_paths))
            if valid > 0:
                self.accumulated_confmats[task] = accum
                compute_and_save_metrics(accum, self.config, self.output_dir,
                                         task, mode="metrics_only")
                any_found = True
        if not any_found:
            logger.info("[ERROR] No predictions found at all. "
                        "Metrics will not be calculated.")
