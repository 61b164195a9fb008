"""Aigle-CLI end-to-end smoke on the real TPU with a .jp2 input raster
(VERDICT r4 ask #7): the production aerial format
(reference scripts/run_fast_aigle_segmentation.py:88) through native
jp2io -> zonal inference -> polygonize -> GPKG + SQL export.

The bench covers GeoTIFF/LZW only; this measures jp2 decode throughput on
this host next to it. Geometry mirrors the bench: 1 km² of 20 cm imagery
(5000x5000 px), swin-base@512/margin 40, batch 16, bf16, biased head
(argmax == class 6 "plan d'eau") so the postprocess/export path carries
real detections.

Usage: python tools/aigle_jp2_e2e.py   (SIDE= px, PATCH=, BATCH=)
Writes phase timings JSON to stdout; artifacts under .tmp/aigle_jp2_e2e/.
"""
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIDE = int(os.getenv("SIDE", "5000"))
PATCH = int(os.getenv("PATCH", "512"))
MARGIN = int(os.getenv("MARGIN", "40"))
BATCH = int(os.getenv("BATCH", "16"))
RES = 0.2
N_CLASSES = 19
ARCH = os.getenv("ARCH", "swin_base_patch4_window12_384-upernet")
OUT = os.path.join(REPO, ".tmp", "aigle_jp2_e2e")


def biased_checkpoint(path):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from safetensors.numpy import save_file

    from flair_for_aigle_tpu.models.checkpoint import export_torch_state_dict
    from flair_for_aigle_tpu.models.flair_model import FlairHubModel
    from flair_for_aigle_tpu.zonal.model_utils import (
        example_batch_for,
        prepare_model_config,
    )

    cfg = {
        "monotemp_arch": ARCH,
        "model_weights": "",
        "modalities": {
            "inputs": {"AERIAL_RGBI": True, "AERIAL-RLT_PAN": False,
                       "DEM_ELEV": False, "SPOT_RGBI": False,
                       "SENTINEL2_TS": False, "SENTINEL1-ASC_TS": False,
                       "SENTINEL1-DESC_TS": False},
            "AERIAL_RGBI": {"input_img_path": "", "channels": [1, 2, 3]},
        },
        "tasks": [{"name": "AERIAL_LABEL-COSIA", "active": True,
                   "class_names": {i: f"c{i}" for i in range(N_CLASSES)}}],
    }
    mc = prepare_model_config(cfg)
    model = FlairHubModel(config=mc)
    batch = example_batch_for(mc, {"AERIAL_RGBI": PATCH}, 1)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = dict(jax.jit(model.init)(jax.random.key(0), batch))
    head = variables["params"]["main_decoders.AERIAL_LABEL-COSIA.seg_model"][
        "segmentation_head"]["0"]
    bias = np.zeros(N_CLASSES, np.float32)
    bias[6] = 50.0
    head["bias"] = jnp.asarray(bias)
    sd = export_torch_state_dict(
        {"params": jax.device_get(variables["params"]),
         "batch_stats": jax.device_get(variables.get("batch_stats", {}))}
    )
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)


def main():
    import numpy as np
    import yaml
    from PIL import Image

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".tmp", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    os.environ.setdefault("FLAIR_ZONAL_TIMING", "1")

    from flair_for_aigle_tpu.aigle.config import ArgsObject
    from flair_for_aigle_tpu.geo.jp2 import append_geojp2_box
    from flair_for_aigle_tpu.geo.gpkg import read_gpkg
    from flair_for_aigle_tpu.geo.windows import from_origin

    shutil.rmtree(OUT, ignore_errors=True)
    data = os.path.join(OUT, "data")
    runs = os.path.join(OUT, "runs")
    os.environ["DATA_FOLDER"] = data
    os.environ["RUN_FOLDER"] = runs
    image_set = "aigle_aerial_yolo_jp2zone_v1"
    img_dir = os.path.join(data, image_set, "raw-img")
    os.makedirs(img_dir, exist_ok=True)

    timings = {}
    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (SIDE, SIDE, 3)).astype(np.uint8)
    jp2_path = os.path.join(img_dir, "zone_0.jp2")
    Image.fromarray(arr).save(jp2_path)
    append_geojp2_box(jp2_path, from_origin(700000.0, 6600000.0, RES, RES),
                      "EPSG:2154")
    timings["jp2_encode_s"] = round(time.perf_counter() - t0, 2)
    timings["jp2_bytes"] = os.path.getsize(jp2_path)

    model_dir = os.path.join(runs, "models", "7")
    os.makedirs(model_dir, exist_ok=True)
    t0 = time.perf_counter()
    biased_checkpoint(os.path.join(model_dir, "model.safetensors"))
    timings["checkpoint_build_s"] = round(time.perf_counter() - t0, 1)

    # standalone decode benchmark: full-raster native jp2 read
    from flair_for_aigle_tpu.geo.geotiff import open_raster

    t0 = time.perf_counter()
    with open_raster(jp2_path) as r:
        full = r.read()
    timings["jp2_full_decode_s"] = round(time.perf_counter() - t0, 2)
    km2 = (SIDE * RES / 1000.0) ** 2
    timings["jp2_decode_s_per_km2"] = round(timings["jp2_full_decode_s"] / km2, 2)
    assert full.shape == (3, SIDE, SIDE), full.shape
    del full

    zonal_yaml = {
        "output_path": os.path.join(runs, "unused"),
        "output_name": "aigle_zonal",
        "write_dataframe": False,
        "output_type": "argmax",
        "cog_conversion": False,
        "model_weights": "overridden",
        "batch_size": BATCH,
        "num_worker": 1,
        "img_pixels_detection": PATCH,
        "margin": MARGIN,
        "output_px_meters": RES,
        "monotemp_arch": ARCH,
        "multitemp_model_ref_date": "05-15",
        "compute_dtype": "bfloat16",
        "modalities": {
            "inputs": {"AERIAL_RGBI": True, "AERIAL-RLT_PAN": False,
                       "DEM_ELEV": False, "SPOT_RGBI": False,
                       "SENTINEL2_TS": False, "SENTINEL1-ASC_TS": False,
                       "SENTINEL1-DESC_TS": False},
            "AERIAL_RGBI": {
                "input_img_path": jp2_path,
                "channels": [1, 2, 3],
                "normalization": {"type": "custom",
                                  "means": [105.0, 111.0, 102.0],
                                  "stds": [52.0, 45.0, 44.0]},
            },
        },
        "tasks": [{"name": "AERIAL_LABEL-COSIA", "active": True,
                   "class_names": {i: f"c{i}" for i in range(N_CLASSES)}}],
    }
    cfg_path = os.path.join(OUT, "zonal.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(zonal_yaml, f)

    from flair_for_aigle_tpu.aigle.run_fast_aigle_segmentation import (
        run_fast_aigle_segmentation,
    )

    args = ArgsObject(
        debug_mode=True, images_type="aerial", tile_size_px=PATCH,
        geozones_codes="all", input_crs="EPSG:2154", target_crs="EPSG:4326",
        export_sql=True, dataset_type="yolo", images_folders=None,
        db_sources=os.path.join(OUT, "db"), s3_bucket_name=None,
        s3_aerial_archive_source_folder=None,
        s3_db_topo_archive_source_file=None, s3_run_folder_path=None,
        model_id=7, model_config=cfg_path, testset_name="jp2zone",
        version="v1", run_progression_filepath=None, run_id="jp2e2e",
    )
    t0 = time.perf_counter()
    run_fast_aigle_segmentation(args)
    timings["aigle_run_s"] = round(time.perf_counter() - t0, 1)
    timings["km2_per_h"] = round(km2 / (timings["aigle_run_s"] / 3600.0), 1)

    result_folder = os.path.join(runs, image_set, "results")
    batch_gpkg = os.path.join(result_folder,
                              f"batch_segmentations_{image_set}.gpkg")
    sql_file = os.path.join(result_folder,
                            f"batch_segmentations_{image_set}.sql")
    assert os.path.exists(batch_gpkg), os.listdir(result_folder)
    assert os.path.exists(sql_file)
    recs, crs = read_gpkg(batch_gpkg)
    assert crs == "EPSG:4326"
    assert recs and all(r["object_type"] == "plan d eau" for r in recs)
    sql = open(sql_file).read()
    assert "INSERT INTO detections.batch" in sql
    assert "INSERT INTO detections.inference" in sql
    timings["n_detections"] = len(recs)
    timings["artifacts"] = {"gpkg": batch_gpkg, "sql": sql_file}
    print(json.dumps({"ok": True, **timings}), flush=True)


if __name__ == "__main__":
    main()
