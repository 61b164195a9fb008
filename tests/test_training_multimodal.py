"""Training stack with aerial + Sentinel-2 time series: CSV-driven TS
patches, GLOBAL_SENTINEL2_MTD_DATES.gpkg metadata, cloud filtering, collate
with variable T, one full train epoch + predict."""

import json
import sqlite3
from pathlib import Path

import numpy as np
import pytest

from flair_for_aigle_tpu.geo.geotiff import write_geotiff
from flair_for_aigle_tpu.geo.windows import from_origin

N_CLASSES = 4
PATCH = 32
S2_PATCH = 8
T = 5


def write_dates_gpkg(path: Path, patch_ids, t=T):
    """Minimal GPKG-attribute-table fixture like GLOBAL_SENTINEL2_MTD_DATES."""
    con = sqlite3.connect(str(path))
    cur = con.cursor()
    cur.execute("CREATE TABLE gpkg_contents (table_name TEXT, data_type TEXT)")
    cur.execute("INSERT INTO gpkg_contents VALUES ('dates', 'attributes')")
    cur.execute("CREATE TABLE dates (patch_id TEXT, acquisition_dates TEXT)")
    for pid in patch_ids:
        dates = {str(i): f"2021{i + 1:02d}10" for i in range(t)}
        cur.execute("INSERT INTO dates VALUES (?, ?)", (pid, json.dumps(dates)))
    con.commit()
    con.close()


@pytest.fixture(scope="module")
def mm_toy(tmp_path_factory):
    root = tmp_path_factory.mktemp("mmtoy")
    rng = np.random.default_rng(0)
    rows = {"train": [], "val": [], "test": []}
    patch_ids = set()
    for split, n in (("train", 4), ("val", 4), ("test", 2)):
        for i in range(n):
            # FLAIR-style naming: D<dep>_<zone>_<patch>.tif; the dataset
            # derives area ids as (first, -2, -1) name parts
            # label filename drives the area id (parts[0], parts[-2],
            # parts[-1]); the TS filename must be <area>_SENTINEL2_TS.tif
            base = f"D01-{split}{i}"
            area = f"{base}_Z1_{i:04d}"
            img = root / f"{area}_IMG.tif"   # unused for area derivation
            lab = root / f"{base}_Z1_{i:04d}.tif"
            s2 = root / f"{area}_SENTINEL2_TS.tif"
            msk = root / f"{area}_MSK-SC.tif"
            tr = from_origin(700000 + i * 50, 6600000, 0.2, 0.2)
            blocks = rng.integers(0, N_CLASSES, (PATCH // 8, PATCH // 8))
            labarr = np.kron(blocks, np.ones((8, 8))).astype(np.uint8)
            imgarr = (labarr[None].repeat(3, 0) * 60 +
                      rng.normal(0, 5, (3, PATCH, PATCH))).clip(0, 255).astype(np.uint8)
            write_geotiff(str(img), imgarr, tr, "EPSG:2154")
            write_geotiff(str(lab), labarr[None], tr, "EPSG:2154")
            s2arr = rng.normal(1000, 200, (T * 10, S2_PATCH, S2_PATCH)).astype(np.uint16)
            write_geotiff(str(s2), s2arr, tr, "EPSG:2154")
            mskarr = np.zeros((T * 2, S2_PATCH, S2_PATCH), np.uint8)
            mskarr[1 * 2 + 1] = 90  # date 1 cloudy
            write_geotiff(str(msk), mskarr, tr, "EPSG:2154")
            patch_ids.add(area)
            rows[split].append((str(img), str(s2), str(msk), str(lab)))
    import pandas as pd

    csvs = {}
    for split, data in rows.items():
        df = pd.DataFrame(data, columns=["AERIAL_RGBI", "SENTINEL2_TS",
                                         "SENTINEL2_MSK-SC",
                                         "AERIAL_LABEL-COSIA"])
        p = root / f"{split}.csv"
        df.to_csv(p, index=False)
        csvs[split] = str(p)

    # dates metadata keyed by the dataset's area_elem derivation on the
    # LABEL path: parts[0]_parts[-2]_parts[-1]
    area_ids = set()
    for split, data in rows.items():
        for (_img, _s2, _msk, lab) in data:
            parts = lab.split("/")[-1].split("_")
            area_ids.add("_".join([parts[0], parts[-2],
                                   parts[-1].split(".")[0]]))
    write_dates_gpkg(root / "GLOBAL_SENTINEL2_MTD_DATES.gpkg", area_ids)
    return root, csvs


def make_cfg(root, csvs):
    from tests._fixtures import make_config

    cfg = make_config(arch="resnet18-unet", mono=("AERIAL_RGBI",),
                      multi=("SENTINEL2_TS",),
                      tasks=(("AERIAL_LABEL-COSIA", N_CLASSES),))
    cfg["modalities"]["inputs_channels"]["AERIAL_RGBI"] = [1, 2, 3]
    cfg["modalities"]["inputs_channels"]["SENTINEL2_TS"] = [1, 2, 3]
    cfg["modalities"]["pre_processings"]["filter_sentinel2"] = True
    cfg["modalities"]["pre_processings"]["use_augmentation"] = True
    cfg["modalities"]["normalization"].update({
        "AERIAL_RGBI_means": [100.0] * 3, "AERIAL_RGBI_stds": [60.0] * 3,
    })
    cfg["paths"] = {
        "out_folder": str(root / "out"), "out_model_name": "mm-toy",
        "train_csv": csvs["train"], "val_csv": csvs["val"],
        "test_csv": csvs["test"],
        "global_mtd_folder": str(root) + "/",
        "ckpt_model_path": "",
    }
    cfg["tasks"] = {
        "train": True,
        "train_tasks": {"init_weights_only_from_ckpt": False,
                        "resume_training_from_ckpt": False},
        "predict": True, "write_files": True, "georeferencing_output": True,
        "metrics_only": False,
    }
    cfg["hyperparams"].update({"num_epochs": 1, "batch_size": 2,
                               "learning_rate": 1e-3, "scheduler": None})
    cfg["hardware"] = {"accelerator": "tpu", "num_nodes": 1,
                       "gpus_per_node": 1, "strategy": "auto",
                       "num_workers": 0}
    cfg["saving"] = {
        "ckpt_save_also_last": False, "ckpt_weights_only": False,
        "ckpt_monitor": "val_miou", "ckpt_monitor_mode": "max",
        "ckpt_earlystopping_patience": 20,
        "cp_csv_and_conf_to_output": False, "enable_progress_bar": False,
        "progress_rate": 10, "ckpt_verbose": False, "verbose_config": False,
    }
    return cfg


@pytest.mark.slow
def test_multimodal_training_epoch(mm_toy):
    root, csvs = mm_toy
    cfg = make_cfg(root, csvs)

    from flair_for_aigle_tpu.data.paths import get_datasets
    from flair_for_aigle_tpu.train.stages import (
        build_data_module,
        predict_stage,
        training_stage,
    )

    dict_train, dict_val, dict_test = get_datasets(cfg)
    assert len(dict_train["SENTINEL2_TS"]) == 4
    assert dict_train["DATES_S2"], "dates metadata not resolved"

    dm = build_data_module(cfg, dict_train, dict_val, dict_test)
    out_dir = Path(cfg["paths"]["out_folder"]) / "mm-toy"
    out_dir.mkdir(parents=True, exist_ok=True)
    model, best_state = training_stage(cfg, dm, out_dir)
    assert list((out_dir / "checkpoints").glob("*.safetensors"))

    out_pred = out_dir / "results_mm-toy"
    out_pred.mkdir(parents=True, exist_ok=True)
    predict_stage(cfg, dm, out_pred, (model, best_state))
    preds = list((out_pred / "predictions_mm-toy" / "AERIAL_LABEL-COSIA"
                  ).glob("PRED_*.tif"))
    assert len(preds) == 2
