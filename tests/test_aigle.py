"""Aigle production pipeline end-to-end: staged local data/model folders ->
run_fast_aigle_segmentation -> per-raster GPKG -> aggregated postprocess ->
batch GPKG + SQL export."""

import json
import os
from pathlib import Path

import numpy as np
import pytest
import yaml

from flair_for_aigle_tpu.aigle.config import ArgsObject
from flair_for_aigle_tpu.geo.geotiff import write_geotiff
from flair_for_aigle_tpu.geo.gpkg import read_gpkg
from flair_for_aigle_tpu.geo.windows import from_origin

RES = 0.5
PATCH = 64
MARGIN = 8
N_CLASSES = 19


def _biased_checkpoint(path, n_classes=N_CLASSES, favored=6):
    """Random-weight model whose head bias makes argmax == favored class."""
    import jax
    from safetensors.numpy import save_file

    from flair_for_aigle_tpu.models.checkpoint import export_torch_state_dict
    from flair_for_aigle_tpu.models.flair_model import FlairHubModel
    from flair_for_aigle_tpu.zonal.model_utils import (
        example_batch_for,
        prepare_model_config,
    )

    cfg = {
        "monotemp_arch": "resnet18-unet",
        "model_weights": "",
        "modalities": {
            "inputs": {"AERIAL_RGBI": True, "AERIAL-RLT_PAN": False,
                       "DEM_ELEV": False, "SPOT_RGBI": False,
                       "SENTINEL2_TS": False, "SENTINEL1-ASC_TS": False,
                       "SENTINEL1-DESC_TS": False},
            "AERIAL_RGBI": {"input_img_path": "", "channels": [1, 2, 3]},
        },
        "tasks": [{"name": "AERIAL_LABEL-COSIA", "active": True,
                   "class_names": {i: f"c{i}" for i in range(n_classes)}}],
    }
    mc = prepare_model_config(cfg)
    model = FlairHubModel(config=mc)
    variables = dict(model.init(
        jax.random.key(0), example_batch_for(mc, {"AERIAL_RGBI": PATCH}, 1)
    ))
    # bias the segmentation head towards `favored`
    head = variables["params"]["main_decoders.AERIAL_LABEL-COSIA.seg_model"][
        "segmentation_head"]["0"]
    import jax.numpy as jnp

    bias = np.zeros(n_classes, np.float32)
    bias[favored] = 50.0
    head["bias"] = jnp.asarray(bias)
    sd = export_torch_state_dict(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})}
    )
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)


@pytest.fixture
def aigle_env(tmp_path, monkeypatch):
    data = tmp_path / "data"
    runs = tmp_path / "runs"
    monkeypatch.setenv("DATA_FOLDER", str(data))
    monkeypatch.setenv("RUN_FOLDER", str(runs))
    image_set = "aigle_aerial_yolo_testzone_v1"
    img_dir = data / image_set / "raw-img"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        arr = rng.integers(0, 255, (3, 96, 96)).astype(np.uint8)
        write_geotiff(str(img_dir / f"zone_{i}.tif"), arr,
                      from_origin(700000 + i * 200, 6600000, RES, RES),
                      "EPSG:2154")
    model_dir = runs / "models" / "7"
    model_dir.mkdir(parents=True)
    _biased_checkpoint(str(model_dir / "model.safetensors"))

    zonal_yaml = {
        "output_path": str(runs / "unused"),
        "output_name": "aigle_zonal",
        "write_dataframe": False,
        "output_type": "argmax",
        "cog_conversion": False,
        "model_weights": "overridden",
        "batch_size": 2,
        "num_worker": 1,
        "img_pixels_detection": PATCH,
        "margin": MARGIN,
        "output_px_meters": RES,
        "monotemp_arch": "resnet18-unet",
        "multitemp_model_ref_date": "05-15",
        "modalities": {
            "inputs": {"AERIAL_RGBI": True, "AERIAL-RLT_PAN": False,
                       "DEM_ELEV": False, "SPOT_RGBI": False,
                       "SENTINEL2_TS": False, "SENTINEL1-ASC_TS": False,
                       "SENTINEL1-DESC_TS": False},
            "AERIAL_RGBI": {
                "input_img_path": str(img_dir / "zone_0.tif"),
                "channels": [1, 2, 3],
                "normalization": {"type": "custom",
                                  "means": [105.0, 111.0, 102.0],
                                  "stds": [52.0, 45.0, 44.0]},
            },
        },
        "tasks": [{"name": "AERIAL_LABEL-COSIA", "active": True,
                   "class_names": {i: f"c{i}" for i in range(N_CLASSES)}}],
    }
    cfg_path = tmp_path / "zonal.yaml"
    cfg_path.write_text(yaml.safe_dump(zonal_yaml))
    return tmp_path, str(cfg_path), image_set


@pytest.mark.slow
def test_run_fast_aigle_segmentation(aigle_env):
    tmp_path, model_config, image_set = aigle_env
    from flair_for_aigle_tpu.aigle.run_fast_aigle_segmentation import (
        run_fast_aigle_segmentation,
    )

    args = ArgsObject(
        debug_mode=True, images_type="aerial", tile_size_px=PATCH,
        geozones_codes="all", input_crs="EPSG:2154", target_crs="EPSG:4326",
        export_sql=True, dataset_type="yolo", images_folders=None,
        db_sources=str(tmp_path / "db"), s3_bucket_name=None,
        s3_aerial_archive_source_folder=None,
        s3_db_topo_archive_source_file=None, s3_run_folder_path=None,
        model_id=7, model_config=model_config, testset_name="testzone",
        version="v1", run_progression_filepath=None, run_id="t",
    )
    run_fast_aigle_segmentation(args)

    result_folder = (tmp_path / "runs" / image_set / "results")
    per_raster = [f for f in os.listdir(result_folder)
                  if f.startswith("zone_") and f.endswith(".gpkg")]
    assert len(per_raster) == 2, os.listdir(result_folder)

    batch_gpkg = result_folder / f"batch_segmentations_{image_set}.gpkg"
    assert batch_gpkg.exists()
    recs, crs = read_gpkg(str(batch_gpkg))
    assert crs == "EPSG:4326"
    assert len(recs) >= 1  # biased class 6 (water) -> "plan d eau" export
    assert all(r["object_type"] == "plan d eau" for r in recs)
    # geometry reprojected to lon/lat over France
    minx, miny, maxx, maxy = recs[0]["geometry"].bounds
    assert -10 < minx < 10 and 40 < miny < 52

    sql_file = result_folder / f"batch_segmentations_{image_set}.sql"
    assert sql_file.exists()
    sql = sql_file.read_text()
    assert "INSERT INTO detections.batch" in sql
    assert "INSERT INTO detections.inference" in sql
    assert "SRID=4326" in sql

    # resume: rerunning skips rasters with existing results
    run_fast_aigle_segmentation(args)
