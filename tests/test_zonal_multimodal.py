"""Zonal pipeline with aerial + Sentinel-2 time series fusion: windowed TS
reads, dates metadata, cloud filtering, fixed-T padding, end-to-end run."""

import numpy as np
import pytest
import yaml

from flair_for_aigle_tpu.geo.geotiff import open_raster, write_geotiff
from flair_for_aigle_tpu.geo.windows import from_origin

RES = 0.5
S2_RES = 4.0  # coarser sentinel pixels
PATCH = 64
MARGIN = 8
N_CLASSES = 7
T = 6


@pytest.fixture
def mm_env(tmp_path):
    rng = np.random.default_rng(0)
    size = 96
    aerial = str(tmp_path / "aerial.tif")
    write_geotiff(aerial,
                  rng.integers(0, 255, (3, size, size)).astype(np.uint8),
                  from_origin(700000, 6600000, RES, RES), "EPSG:2154")
    # S2 stack: T dates x 3 channels interleaved as T*C bands, same bounds
    s2_size = int(size * RES / S2_RES)
    s2 = str(tmp_path / "s2.tif")
    write_geotiff(s2,
                  rng.normal(1000, 300, (T * 3, s2_size, s2_size)).astype(np.uint16),
                  from_origin(700000, 6600000, S2_RES, S2_RES), "EPSG:2154")
    # cloud/snow mask raster: 2 bands per date; date 2 fully cloudy
    msk = np.zeros((T * 2, s2_size, s2_size), np.uint8)
    msk[2 * 2 + 1] = 99  # cloud channel of date 2
    msk_path = str(tmp_path / "s2_msk.tif")
    write_geotiff(msk_path, msk, from_origin(700000, 6600000, S2_RES, S2_RES),
                  "EPSG:2154")
    dates_txt = tmp_path / "dates.txt"
    dates_txt.write_text("\n".join(
        f"2021{m:02d}15" for m in range(1, T + 1)
    ))
    return tmp_path, aerial, s2, msk_path, str(dates_txt)


@pytest.mark.slow
def test_multimodal_zonal_run(mm_env, tmp_path):
    tmp, aerial, s2, msk, dates_txt = mm_env
    from flair_for_aigle_tpu.zonal.inference import run_inference

    cfg = {
        "output_path": str(tmp / "out"),
        "output_name": "mm_zonal",
        "output_type": "argmax",
        "cog_conversion": True,
        "model_weights": "",
        "batch_size": 2,
        "num_worker": 1,
        "img_pixels_detection": PATCH,
        "margin": MARGIN,
        "output_px_meters": RES,
        "fixed_time_steps": 8,
        "monotemp_arch": "resnet18-unet",
        "multitemp_model_ref_date": "05-15",
        "modalities": {
            "inputs": {"AERIAL_RGBI": True, "AERIAL-RLT_PAN": False,
                       "DEM_ELEV": False, "SPOT_RGBI": False,
                       "SENTINEL2_TS": True, "SENTINEL1-ASC_TS": False,
                       "SENTINEL1-DESC_TS": False},
            "AERIAL_RGBI": {
                "input_img_path": aerial, "channels": [1, 2, 3],
                "normalization": {"type": "custom",
                                  "means": [100.0] * 3, "stds": [50.0] * 3},
            },
            "SENTINEL2_TS": {
                "input_img_path": s2, "channels": [1, 2, 3],
                "dates_txt": dates_txt,
                "filter_clouds": True,
                "filter_clouds_img_path": msk,
                "temporal_average": False,
            },
        },
        "tasks": [{"name": "TASK-A", "active": True,
                   "class_names": {i: f"c{i}" for i in range(N_CLASSES)}}],
    }
    import os

    os.makedirs(cfg["output_path"], exist_ok=True)
    # model_weights "" -> skip checkpoint load (random weights)
    # validate_config requires a file; create a dummy random ckpt
    from tests.test_zonal import make_zonal_config  # reuse exporter logic
    import jax
    from safetensors.numpy import save_file

    from flair_for_aigle_tpu.models.checkpoint import export_torch_state_dict
    from flair_for_aigle_tpu.models.flair_model import FlairHubModel
    from flair_for_aigle_tpu.zonal.model_utils import (
        example_batch_for,
        prepare_model_config,
    )

    mc = prepare_model_config({**cfg, "model_weights": ""})
    mc["labels"] = ["TASK-A"]
    mc["labels_configs"] = {
        "TASK-A": {"value_name": [f"c{i}" for i in range(N_CLASSES)]}
    }
    model = FlairHubModel(config=mc)
    patch_sizes = {"AERIAL_RGBI": PATCH,
                   "SENTINEL2_TS": int(round(PATCH / (S2_RES / RES)))}
    variables = jax.jit(model.init)(
        jax.random.key(0),
        example_batch_for(mc, patch_sizes, 1, t_steps=8),
    )
    sd = export_torch_state_dict(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        transpose_conv_prefixes=(".up.0",),
    )
    w = str(tmp / "w.safetensors")
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, w)
    cfg["model_weights"] = w

    temp_paths = run_inference(cfg)
    out = temp_paths["TASK-A"]
    assert out.endswith("_COG.tif")
    with open_raster(out) as src:
        assert (src.height, src.width) == (96, 96)
        data = src.read(1)
    assert data.max() < N_CLASSES


def test_ts_dataset_cloud_filter_and_fixed_t(mm_env):
    tmp, aerial, s2, msk, dates_txt = mm_env
    from flair_for_aigle_tpu.zonal.dataset import MultiModalSlicedDataset
    from flair_for_aigle_tpu.geo import geos

    tiles = [{
        "geometry": geos.box(700000, 6600000 - PATCH * RES,
                             700000 + PATCH * RES, 6600000),
        "left": 700000, "top": 6600000,
    }]
    ds = MultiModalSlicedDataset(
        tiles=tiles,
        modality_cfgs={
            "AERIAL_RGBI": {"input_img_path": aerial, "channels": [1, 2, 3]},
            "SENTINEL2_TS": {"input_img_path": s2, "channels": [1, 2, 3],
                             "dates_txt": dates_txt, "filter_clouds": True,
                             "filter_clouds_img_path": msk},
        },
        patch_size_dict={"AERIAL_RGBI": PATCH, "SENTINEL2_TS": 8},
        ref_date_str="05-15",
        modalities_config={"labels": ["TASK-A"],
                           "labels_configs": {"TASK-A": {"value_name": ["a", "b"]}}},
        fixed_t=8,
    )
    s = ds[0]
    assert s["AERIAL_RGBI"].shape == (3, PATCH, PATCH)
    # date 2 filtered out (cloudy), padded to fixed T=8
    assert s["SENTINEL2_TS"].shape == (8, 3, 8, 8)
    assert s["SENTINEL2_DATES"].shape == (8,)
    # 5 valid dates remain -> last 3 frames are pad zeros
    assert (s["SENTINEL2_TS"][5:] == 0).all()
    assert (np.abs(s["SENTINEL2_TS"][:5]).sum() > 0)
    ds.close()
