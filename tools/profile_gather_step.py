"""Time the full resident-path dispatch (gather + forward + epilogue +
canvas scatter) against the bare model step, on the real TPU.

The bench's device timeline is gather_step_and_stitch, not the bare
forward; if the wrapper (vmap'd dynamic_slice gather, canvas scatter
fori_loop, device normalization) costs extra, it shows here.

Usage: python tools/profile_gather_step.py  (PB=<batch>)
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".tmp", "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import bench
from flair_for_aigle_tpu.zonal.inference import make_infer_step
from flair_for_aigle_tpu.zonal.model_utils import (
    build_inference_model,
    compute_patch_sizes,
)
from flair_for_aigle_tpu.zonal.inference import initialize_geometry_and_resolutions

B = int(os.getenv("PB", "16"))
SIDE = 5000
MARGIN = 40
TILE = 512


def main():
    work = os.path.join(REPO, ".tmp", "bench")
    os.makedirs(work, exist_ok=True)
    warm = os.path.join(work, "warmup.tif")
    if not os.path.exists(warm):
        bench.make_raster(warm, 2 * TILE)
    cfg = bench.make_cfg(warm, work)
    cfg = initialize_geometry_and_resolutions(cfg)
    cfg["labels"] = [t["name"] for t in cfg["tasks"] if t["active"]]
    cfg["labels_configs"] = {
        t["name"]: {"value_name": list(t["class_names"].values())}
        for t in cfg["tasks"] if t["active"]
    }
    model, variables, _ = build_inference_model(
        cfg, compute_patch_sizes(cfg), B)

    norm = {"AERIAL_RGBI": ("custom", [105.66, 111.35, 102.18],
                            [52.23, 45.62, 44.30])}
    step = make_infer_step(model, "argmax", MARGIN, TILE,
                           {"AERIAL_LABEL-COSIA": 19}, 1, 1,
                           jnp.bfloat16, norm, None)

    pad = SIDE + 2 * MARGIN
    raster = jnp.zeros((3, pad, pad), jnp.uint8)
    canvases = {"AERIAL_LABEL-COSIA": jnp.zeros((1, SIDE, SIDE), jnp.uint8)}
    extras = {"AERIAL_LABEL-COSIA": jnp.zeros((B, 1, TILE, TILE), jnp.float32)}
    rng = np.random.default_rng(0)
    n_batches = int(os.getenv("NB", "9"))

    offs_all = [
        (jnp.asarray(rng.integers(0, SIDE - TILE, (B, 2)).astype(np.int32)),
         jnp.asarray((rng.integers(0, SIDE - 432, (B, 2))).astype(np.int32)))
        for _ in range(n_batches)
    ]

    def run():
        nonlocal canvases
        for in_o, out_o in offs_all:
            canvases = step.gather_step_and_stitch(
                variables, {"AERIAL_RGBI": raster},
                extras, {"AERIAL_RGBI": in_o}, out_o, canvases)
        # sync on one scalar
        return int(jnp.sum(canvases["AERIAL_LABEL-COSIA"][0, 0, :8]))

    print("built; compiling/warming ...", flush=True)
    t0 = time.perf_counter()
    run()  # compile + warm
    print(f"warm done in {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    run()
    t_all = time.perf_counter() - t0
    per_batch = t_all / n_batches
    print(json.dumps({
        "gather_step_ms_per_batch": round(per_batch * 1e3, 1),
        "tiles_per_s": round(B / per_batch, 1),
        "n_batches": n_batches,
        "device_s_per_km2": round(144 / (B / per_batch), 2),
    }))


if __name__ == "__main__":
    main()
