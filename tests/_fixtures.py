"""Shared test fixtures: minimal reference-schema configs and batches."""

from __future__ import annotations

import numpy as np


def class_names(n, prefix="c"):
    return {i: f"{prefix}{i}" for i in range(n)}


def make_config(
    arch="resnet34-unet",
    mono=("AERIAL_RGBI",),
    multi=(),
    tasks=(("TASK-A", 7),),
    aux=(),
    s2_channels=(1, 2, 3),
    utae_widths=((16, 16, 32), (8, 16, 32)),
):
    inputs = {m: False for m in [
        "AERIAL_RGBI", "AERIAL-RLT_PAN", "DEM_ELEV", "SPOT_RGBI",
        "SENTINEL2_TS", "SENTINEL1-ASC_TS", "SENTINEL1-DESC_TS"]}
    for m in list(mono) + list(multi):
        inputs[m] = True
    labels = [t[0] for t in tasks]
    return {
        "modalities": {
            "inputs": inputs,
            "inputs_channels": {
                "AERIAL_RGBI": [1, 2, 3],
                "SPOT_RGBI": [1, 2, 3, 4],
                "SENTINEL2_TS": list(s2_channels),
                "SENTINEL1-ASC_TS": [1, 2],
                "SENTINEL1-DESC_TS": [1, 2],
            },
            "aux_loss": {m: (m in aux) for m in inputs},
            "aux_loss_weight": 1.5,
            "modality_dropout": {m: 0 for m in inputs},
            "pre_processings": {
                "filter_sentinel2": False,
                "filter_sentinel2_max_cloud": 1,
                "filter_sentinel2_max_snow": 1,
                "filter_sentinel2_max_frac_cover": 0.05,
                "temporal_average_sentinel2": False,
                "temporal_average_sentinel1": False,
                "calc_elevation": True,
                "calc_elevation_stack_dsm": True,
                "use_augmentation": False,
            },
            "normalization": {
                "norm_type": "custom",
                "AERIAL_RGBI_means": [100.0, 100.0, 100.0],
                "AERIAL_RGBI_stds": [50.0, 50.0, 50.0],
            },
        },
        "models": {
            "monotemp_model": {"arch": arch, "new_channels_init_mode": "random"},
            "multitemp_model": {
                "ref_date": "05-15",
                "encoder_widths": list(utae_widths[0]),
                "decoder_widths": list(utae_widths[1]),
                "out_conv": [8, 19],
                "str_conv_k": 3, "str_conv_s": 1, "str_conv_p": 1,
                "agg_mode": "att_group", "encoder_norm": "group",
                "n_head": 4, "d_model": 32, "d_k": 4,
                "pad_value": 0, "padding_mode": "reflect",
            },
        },
        "labels": labels,
        "labels_configs": {
            name: {
                "task_weight": 1.0,
                "value_name": class_names(n),
                "value_weights": {"default": 1, "default_exceptions": {},
                                  "per_modality_exceptions": {}},
            }
            for name, n in tasks
        },
        "paths": {"ckpt_model_path": ""},
        "hyperparams": {
            "num_epochs": 2, "batch_size": 2, "seed": 2025,
            "learning_rate": 5e-5, "optimizer": "adamw",
            "optim_weight_decay": 0.01, "optim_betas": [0.9, 0.999],
            "scheduler": "one_cycle_lr", "warmup_fraction": 0.2,
            "plateau_patience": 10,
        },
    }


def make_batch(config, batch=2, size=32, t_steps=5, seed=0):
    rng = np.random.default_rng(seed)
    out = {}
    inputs = config["modalities"]["inputs"]
    chans = config["modalities"]["inputs_channels"]
    for mod, active in inputs.items():
        if not active:
            continue
        if mod.endswith("_TS"):
            c = len(chans[mod])
            out[mod] = rng.normal(size=(batch, t_steps, c, size, size)).astype(np.float32)
            out[mod.replace("_TS", "_DATES")] = np.sort(
                rng.integers(-180, 180, size=(batch, t_steps))
            ).astype(np.float32)
        elif mod == "DEM_ELEV":
            out[mod] = rng.normal(size=(batch, 2, size, size)).astype(np.float32)
        elif mod == "AERIAL-RLT_PAN":
            out[mod] = rng.normal(size=(batch, 1, size, size)).astype(np.float32)
        else:
            c = len(chans.get(mod, [1, 2, 3]))
            out[mod] = rng.normal(size=(batch, c, size, size)).astype(np.float32)
    for task in config["labels"]:
        k = len(config["labels_configs"][task]["value_name"])
        lab = rng.integers(0, k, size=(batch, size, size))
        ohe = np.eye(k, dtype=np.float32)[lab]  # (B, H, W, K)
        out[task] = np.transpose(ohe, (0, 3, 1, 2))
    return out
