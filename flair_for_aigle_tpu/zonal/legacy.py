"""Legacy accumulate inference variant (host-side numpy canvas).

Behavioral port of the reference's older ``inference`` entry point
(/root/reference/flair_zonal_detection/inference.py:468-564): sums
int8-converted predictions into a full-raster numpy canvas with safety
clipping; returns (raster_logits, transform). The production path is
``zonal.inference.inference_and_write`` (on-device stitching); this
variant exists for parity with callers of the reference API.
"""

from __future__ import annotations

import logging
from typing import Dict

import jax.numpy as jnp
import numpy as np

from flair_for_aigle_tpu.zonal.postprocess import convert

logger = logging.getLogger(__name__)


def inference(model, variables, dataloader, tiles, config: Dict, raster_img):
    """Legacy accumulate variant (reference inference.py:468-564)."""
    from flair_for_aigle_tpu.zonal.inference import resample_prediction

    margin_px = config["margin"]
    tile_size = config["img_pixels_detection"]
    output_type = config["output_type"]
    ref_res = config["reference_resolution"]
    out_res = config.get("output_px_meters", ref_res)
    needs_rescale = abs(ref_res - out_res) > 1e-6
    image_bounds = config["image_bounds"]
    transform = raster_img.transform

    n_out = 1
    for t in config["tasks"]:
        if t.get("active"):
            n_out = len(t["class_names"]) if output_type == "class_prob" else 1
            break
    img_height = int(round((image_bounds["top"] - image_bounds["bottom"]) / out_res))
    img_width = int(round((image_bounds["right"] - image_bounds["left"]) / out_res))
    raster_logits = np.zeros((n_out, img_height, img_width), dtype=np.int8)

    task0 = config["labels"][0]
    stride4 = bool(getattr(model, "config", {}).get("zonal_stride4_logits"))
    for batch in dataloader:
        valid = batch.pop("valid", None)
        indices = np.asarray(batch["index"]).reshape(-1)
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if isinstance(v, np.ndarray) and k != "index"}
        logits_tasks, _ = model.apply(variables, jb)
        lg = logits_tasks[task0]
        if stride4:
            # model emitted stride-4 NHWC (fused-epilogue contract); this
            # legacy accumulate variant needs the full-res NCHW logits
            from flair_for_aigle_tpu.models.upernet import (
                resize_bilinear_align_corners,
            )

            lg = resize_bilinear_align_corners(
                lg, lg.shape[-3] * 4, lg.shape[-2] * 4
            )
            lg = jnp.transpose(lg, (0, 3, 1, 2))
        logits = np.asarray(lg)
        for i, idx in enumerate(indices):
            if valid is not None and i >= valid:
                continue
            row = tiles[int(idx)]
            patch = logits[i, :, margin_px:tile_size - margin_px,
                           margin_px:tile_size - margin_px]
            if needs_rescale:
                patch = resample_prediction(patch, ref_res / out_res)
            pred = convert(patch, output_type).astype(np.int8)
            left_px = int(round((row["left"] - image_bounds["left"]) / out_res))
            top_px = int(round((image_bounds["top"] - row["top"]) / out_res))
            c, h, w = pred.shape
            x1, y1 = max(0, left_px), max(0, top_px)
            x2 = min(img_width, left_px + w)
            y2 = min(img_height, top_px + h)
            if x2 <= x1 or y2 <= y1:
                logger.warning("[!] Tile %s fully outside raster. Skipping.",
                               row["id"])
                continue
            dx1, dy1 = x1 - left_px, y1 - top_px
            raster_logits[:, y1:y2, x1:x2] += pred[:, dy1:dy1 + (y2 - y1),
                                                   dx1:dx1 + (x2 - x1)]
    return raster_logits, transform
