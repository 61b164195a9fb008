#!/usr/bin/env python
"""Per-phase breakdown of the zonal bench: read/loader vs device vs D2H.

Reuses bench.py's raster+config; prints a JSON dict of phase timings so
regressions in the end-to-end km2/h number can be attributed.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def main():
    import logging

    logging.basicConfig(level=logging.WARNING)
    import jax

    cache_dir = os.path.join(REPO, ".tmp", "jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    work = os.path.join(REPO, ".tmp", "bench")
    os.makedirs(work, exist_ok=True)
    warm_path = os.path.join(work, "warmup.tif")
    big_path = os.path.join(work, "km2.tif")
    if not os.path.exists(warm_path):
        bench.make_raster(warm_path, 2 * bench.PATCH)
    if not os.path.exists(big_path):
        bench.make_raster(big_path, bench.KM2_SIDE_PX)
    out_dir = os.path.join(work, "out")
    os.makedirs(out_dir, exist_ok=True)

    pack, _, _ = bench.run_zonal(bench.make_cfg(warm_path, out_dir))
    model, variables = pack

    # ---- instrumented run on the 1 km2 raster ----------------------------
    from flair_for_aigle_tpu.geo.geotiff import open_raster
    from flair_for_aigle_tpu.zonal.dataset import BatchedLoader
    from flair_for_aigle_tpu.zonal.inference import (
        inference_and_write,
        init_outputs,
        initialize_geometry_and_resolutions,
        prep_dataset,
    )
    from flair_for_aigle_tpu.zonal.model_utils import compute_patch_sizes
    from flair_for_aigle_tpu.zonal.slicing import generate_patches_from_reference

    timings = {}
    cfg = bench.make_cfg(big_path, out_dir)
    t0 = time.time()
    cfg = initialize_geometry_and_resolutions(cfg)
    cfg["labels"] = [t["name"] for t in cfg["tasks"] if t["active"]]
    cfg["labels_configs"] = {
        t["name"]: {"value_name": list(t["class_names"].values())}
        for t in cfg["tasks"] if t["active"]
    }
    tiles = generate_patches_from_reference(cfg)
    timings["slice_s"] = round(time.time() - t0, 3)

    patch_sizes = compute_patch_sizes(cfg)
    t0 = time.time()
    dataset = prep_dataset(cfg, tiles, patch_sizes)  # preload decode happens here
    timings["dataset_open_preload_s"] = round(time.time() - t0, 3)

    # pure host loader throughput (no device)
    loader = BatchedLoader(dataset, batch_size=bench.BATCH,
                           num_workers=cfg.get("num_worker", 1))
    t0 = time.time()
    n = 0
    for b in loader:
        n += b["valid"]
    timings["loader_only_s"] = round(time.time() - t0, 3)
    timings["tiles"] = n

    # pure device throughput: one batch resident, repeated steps
    import jax.numpy as jnp
    from flair_for_aigle_tpu.zonal.inference import make_infer_step

    batch = next(iter(loader))
    batch.pop("valid")
    jb = {k: jnp.asarray(v) for k, v in batch.items()
          if isinstance(v, np.ndarray) and k != "index"}
    ps = cfg["img_pixels_detection"]
    jb["AERIAL_LABEL-COSIA"] = jnp.zeros((bench.BATCH, 1, ps, ps), jnp.float32)
    step = make_infer_step(
        model, "argmax", cfg["margin"], ps, {"AERIAL_LABEL-COSIA": 1},
        1000000, 1000000, compute_dtype=jnp.bfloat16,
        device_norm={"AERIAL_RGBI": (
            cfg["modalities"]["AERIAL_RGBI"]["normalization"]["means"],
            cfg["modalities"]["AERIAL_RGBI"]["normalization"]["stds"])},
    )
    r = step(variables, jb)
    jax.block_until_ready(r)
    t0 = time.time()
    iters = 6
    for _ in range(iters):
        r = step(variables, jb)
    jax.block_until_ready(r)
    dt = time.time() - t0
    timings["device_step_ms"] = round(1000 * dt / iters, 1)
    timings["device_tiles_per_s"] = round(bench.BATCH * iters / dt, 1)

    # H2D of one batch
    t0 = time.time()
    for _ in range(iters):
        jax.block_until_ready(jnp.asarray(batch["AERIAL_RGBI"]))
    timings["h2d_batch_ms"] = round(1000 * (time.time() - t0) / iters, 1)

    # D2H of the full canvas (uint8 5000x5040)
    canvas = jnp.zeros((1, 5000, 5000), jnp.uint8)
    jax.block_until_ready(canvas)
    t0 = time.time()
    _ = np.asarray(canvas)
    timings["d2h_canvas_s"] = round(time.time() - t0, 3)
    timings["d2h_MBps"] = round(25.0 / max(1e-9, timings["d2h_canvas_s"]), 1)

    # full end-to-end again for reference
    ref_img = open_raster(cfg["modalities"]["AERIAL_RGBI"]["input_img_path"])
    output_files, _ = init_outputs(cfg, ref_img)
    loader2 = BatchedLoader(dataset, batch_size=bench.BATCH,
                            num_workers=cfg.get("num_worker", 1))
    t0 = time.time()
    inference_and_write(model, variables, loader2, tiles, cfg, output_files,
                        ref_img)
    timings["end_to_end_s"] = round(time.time() - t0, 3)
    ref_img.close()
    dataset.close()
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
