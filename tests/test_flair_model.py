"""FlairHubModel: structure, shapes, fusion cases, checkpoint key layout."""

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from flair_for_aigle_tpu.models.checkpoint import (
    _flatten,
    torch_key_for,
)
from flair_for_aigle_tpu.models.flair_model import (
    FlairHubModel,
    adjust_fm_length,
    resolve_model_plan,
)

from tests._fixtures import make_batch, make_config


def init_and_run(config, batch, **apply_kwargs):
    model = FlairHubModel(config=config)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.key(0), jb)
    out = model.apply(variables, jb, **apply_kwargs)
    return model, variables, out


def test_mono_only_single_task():
    cfg = make_config(mono=("AERIAL_RGBI",), tasks=(("TASK-A", 7),))
    batch = make_batch(cfg, batch=2, size=32)
    _, variables, (tasks, aux) = init_and_run(cfg, batch)
    assert set(tasks) == {"TASK-A"}
    assert tasks["TASK-A"].shape == (2, 7, 32, 32)
    assert aux == {}
    keys = {torch_key_for(p) for p in _flatten(variables["params"])}
    assert "encoders.AERIAL_RGBI.seg_model.conv1.weight" in keys
    assert "main_decoders.TASK-A.seg_model.segmentation_head.0.weight" in keys


@pytest.mark.slow
def test_mono_multi_fusion_with_aux():
    cfg = make_config(
        mono=("AERIAL_RGBI",), multi=("SENTINEL2_TS",),
        tasks=(("TASK-A", 7), ("TASK-B", 5)),
        aux=("AERIAL_RGBI", "SENTINEL2_TS"),
    )
    batch = make_batch(cfg, batch=2, size=32, t_steps=4)
    _, variables, (tasks, aux) = init_and_run(cfg, batch)
    assert tasks["TASK-A"].shape == (2, 7, 32, 32)
    assert tasks["TASK-B"].shape == (2, 5, 32, 32)
    # reference aux key convention aux_{mod}_{task}
    assert set(aux) == {
        "aux_AERIAL_RGBI_TASK-A", "aux_AERIAL_RGBI_TASK-B",
        "aux_SENTINEL2_TS_TASK-A", "aux_SENTINEL2_TS_TASK-B",
    }
    assert aux["aux_SENTINEL2_TS_TASK-A"].shape == (2, 7, 32, 32)
    keys = {torch_key_for(p) for p in _flatten(variables["params"])}
    assert any(k.startswith("fusion_handler.conv_f.0") for k in keys)
    assert "encoders.SENTINEL2_TS.temporal_encoder.inconv.weight" in keys
    assert any(k.startswith("aux_decoders.AERIAL_RGBI__TASK-A.seg_model") for k in keys)


def test_multi_only_single_task_passthrough():
    cfg = make_config(mono=(), multi=("SENTINEL2_TS",), tasks=(("TASK-A", 19),))
    batch = make_batch(cfg, batch=1, size=32, t_steps=4)
    _, variables, (tasks, aux) = init_and_run(cfg, batch)
    # out_conv ends at 19 == task classes -> passthrough, no extra decoder
    assert tasks["TASK-A"].shape == (1, 19, 32, 32)
    keys = {torch_key_for(p) for p in _flatten(variables["params"])}
    assert not any(k.startswith("main_decoders") for k in keys)


def test_multi_only_two_tasks_conv_decoders():
    cfg = make_config(mono=(), multi=("SENTINEL2_TS", "SENTINEL1-ASC_TS"),
                      tasks=(("TASK-A", 7), ("TASK-B", 5)))
    batch = make_batch(cfg, batch=1, size=32, t_steps=4)
    _, variables, (tasks, aux) = init_and_run(cfg, batch)
    assert tasks["TASK-A"].shape == (1, 7, 32, 32)
    assert tasks["TASK-B"].shape == (1, 5, 32, 32)
    keys = {torch_key_for(p) for p in _flatten(variables["params"])}
    assert "main_decoders.TASK-A.weight" in keys  # bare 1x1 conv decoder
    # out_conv should have been extended to task_nclasses=12
    plan = resolve_model_plan(cfg)
    assert plan["multitemp"]["out_conv"][-1] == 12


def test_modality_dropout_runs():
    cfg = make_config(mono=("AERIAL_RGBI",), multi=("SENTINEL2_TS",),
                      tasks=(("TASK-A", 7),))
    batch = make_batch(cfg, batch=1, size=32, t_steps=4)
    model = FlairHubModel(config=cfg)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.key(0), jb)
    out1, _ = model.apply(variables, jb, apply_mod_dropout=True,
                          rngs={"mod_dropout": jax.random.key(1)})
    out2, _ = model.apply(variables, jb, apply_mod_dropout=False)
    assert out1["TASK-A"].shape == out2["TASK-A"].shape


def test_adjust_fm_length_matches_reference_math():
    cfg = make_config()
    cfg["models"]["multitemp_model"]["encoder_widths"] = [64, 64, 64, 128]
    # swin-style channels (0, 0, 128, 256, 512, 1024) -> strip -> 4 stages
    got = adjust_fm_length(cfg, [0, 0, 128, 256, 512, 1024])
    assert got == [64, 64, 128, 128]
    # resnet-style 6 stages
    got6 = adjust_fm_length(cfg, [3, 64, 64, 128, 256, 512])
    assert got6 == [64, 64, 64, 128, 128, 128]


def test_pan_and_dem_modalities():
    """1-channel PAN + DEM elevation channel logic (flair_model.py:70-87)."""
    cfg = make_config(mono=("AERIAL-RLT_PAN", "DEM_ELEV"), tasks=(("TASK-A", 4),))
    # calc_elevation + stack_dsm -> DEM has 2 channels
    batch = make_batch(cfg, batch=1, size=32)
    assert batch["AERIAL-RLT_PAN"].shape[1] == 1
    assert batch["DEM_ELEV"].shape[1] == 2
    _, variables, (tasks, aux) = init_and_run(cfg, batch)
    assert tasks["TASK-A"].shape == (1, 4, 32, 32)
    # elevation-difference only -> 1 channel
    cfg2 = make_config(mono=("DEM_ELEV",), tasks=(("TASK-A", 4),))
    cfg2["modalities"]["pre_processings"]["calc_elevation_stack_dsm"] = False
    from flair_for_aigle_tpu.models.flair_model import compute_channels_dict
    assert compute_channels_dict(cfg2)["DEM_ELEV"] == 1
