"""Model construction for zonal inference.

Behavioral port of /root/reference/flair_zonal_detection/model_utils.py:
per-modality patch sizing from resolutions (:19-35), zonal-YAML → full
model-config expansion with UTAE defaults (:38-109), model build +
checkpoint load (:112-119).
"""

from __future__ import annotations

import logging
from copy import deepcopy
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from flair_for_aigle_tpu.geo.geotiff import open_raster
from flair_for_aigle_tpu.models.checkpoint import load_checkpoint
from flair_for_aigle_tpu.models.flair_model import (
    FLAIR_TRANSPOSE_CONV_PATTERNS,
    FlairHubModel,
)

logger = logging.getLogger(__name__)


def get_resolution(path: str) -> float:
    with open_raster(path) as src:
        return abs(src.res[0])


def compute_patch_sizes(config: Dict[str, Any]) -> Dict[str, int]:
    """patch_px(mod) = round(img_pixels_detection / (mod_res / ref_res))."""
    patch_sizes = {}
    target_res = config["reference_resolution"]
    for mod, active in config["modalities"]["inputs"].items():
        if not active:
            continue
        mod_res = get_resolution(config["modalities"][mod]["input_img_path"])
        scale = mod_res / target_res
        patch_sizes[mod] = int(round(config["img_pixels_detection"] / scale))
    logger.info("PATCH SIZES ---> %s", patch_sizes)
    return patch_sizes


def prepare_model_config(config: Dict[str, Any]) -> Dict[str, Any]:
    """Expand the flat zonal YAML into the full model config
    (reference model_utils.py:38-109)."""
    cfg = deepcopy(config)
    cfg.setdefault("models", {})
    if "monotemp_arch" in config:
        cfg["models"]["monotemp_model"] = {
            "arch": config["monotemp_arch"],
            "new_channels_init_mode": "random",
            # opt-in speed knob (like compute_dtype): run swin attention
            # scores/softmax in the compute dtype instead of float32
            "attn_f32": config.get("attn_f32", True),
            # multi-device zonal wraps the forward in shard_map over the dp
            # axis (inference.py make_infer_step), so the fused kernels run
            # per shard — no DP gating needed (round-2 forced them off)
            "attn_kernel": config.get("attn_kernel", "auto"),
        }
    if "multitemp_model_ref_date" in config:
        cfg["models"]["multitemp_model"] = {
            "ref_date": config["multitemp_model_ref_date"],
            "encoder_widths": [64, 64, 64, 128],
            "decoder_widths": [32, 32, 64, 128],
            "out_conv": [32, 19],
            "str_conv_k": 3, "str_conv_s": 1, "str_conv_p": 1,
            "agg_mode": "att_group", "encoder_norm": "group",
            "n_head": 16, "d_model": 256, "d_k": 4,
            "pad_value": 0, "padding_mode": "reflect",
        }

    cfg.setdefault("labels", [t["name"] for t in cfg["tasks"] if t.get("active")])
    cfg.setdefault("labels_configs", {
        t["name"]: {"value_name": (list(t["class_names"].values())
                                   if isinstance(t["class_names"], dict)
                                   else list(t["class_names"]))}
        for t in cfg["tasks"] if t.get("active", False)
    })

    cfg["modalities"].setdefault("inputs_channels", {
        mod: cfg["modalities"].get(mod, {}).get("channels", [])
        for mod in cfg["modalities"]["inputs"]
    })
    cfg["modalities"].setdefault("aux_loss", {
        mod: False for mod in cfg["modalities"]["inputs"]
    })
    dem_cfg = cfg["modalities"].get("DEM_ELEV", {})
    cfg["modalities"].setdefault("pre_processings", {
        "calc_elevation": dem_cfg.get("calc_elevation", False),
        "calc_elevation_stack_dsm": dem_cfg.get("calc_elevation_stack_dsm", False),
        "filter_sentinel2": False,
        "filter_sentinel2_max_cloud": 100,
        "filter_sentinel2_max_snow": 100,
        "filter_sentinel2_max_frac_cover": 1.0,
        "temporal_average_sentinel2": False,
        "temporal_average_sentinel1": False,
        "use_augmentation": False,
    })
    cfg.setdefault("paths", {})["ckpt_model_path"] = config["model_weights"]
    return cfg


def example_batch_for(config: Dict[str, Any], patch_sizes: Dict[str, int],
                      batch_size: int = 1, t_steps: int = 4) -> Dict[str, jnp.ndarray]:
    """Zero batch with the static shapes the zonal run will use (for init)."""
    batch: Dict[str, Any] = {}
    chans = config["modalities"]["inputs_channels"]
    for mod, active in config["modalities"]["inputs"].items():
        if not active:
            continue
        ps = patch_sizes[mod]
        if mod.endswith("_TS"):
            c = len(chans[mod])
            batch[mod] = jnp.zeros((batch_size, t_steps, c, ps, ps), jnp.float32)
            batch[mod.replace("_TS", "_DATES")] = jnp.zeros(
                (batch_size, t_steps), jnp.float32
            )
        elif mod == "DEM_ELEV":
            pp = config["modalities"]["pre_processings"]
            c = 1 if pp["calc_elevation"] and not pp["calc_elevation_stack_dsm"] else 2
            batch[mod] = jnp.zeros((batch_size, c, ps, ps), jnp.float32)
        elif mod == "AERIAL-RLT_PAN":
            batch[mod] = jnp.zeros((batch_size, 1, ps, ps), jnp.float32)
        else:
            batch[mod] = jnp.zeros((batch_size, len(chans[mod]), ps, ps),
                                   jnp.float32)
    ref_ps = list(patch_sizes.values())[0]
    for task in config["labels"]:
        k = len(config["labels_configs"][task]["value_name"])
        batch[task] = jnp.zeros((batch_size, k, ref_ps, ref_ps), jnp.float32)
    return batch


def build_inference_model(config: Dict[str, Any], patch_sizes: Dict[str, int],
                          batch_size: int = 1, t_steps: int = 4):
    """Build FlairHubModel + variables, loading the configured checkpoint.

    Returns (model, variables, model_cfg).
    """
    model_cfg = prepare_model_config(config)
    # fused upsample-crop-convert epilogue (ops/pallas/epilogue.py): on TPU
    # the model emits stride-4 NHWC logits and the inference engine's kernel
    # does x4-bilinear + margin crop + argmax/class-prob in one pass.
    # 'auto' (default) gates on platform + arch + VMEM fit; config key
    # ``fused_epilogue``: auto|True|False.
    flag = config.get("fused_epilogue", "auto")
    if flag:
        import jax as _jax

        from flair_for_aigle_tpu.ops.pallas import epilogue as _epi

        arch_ok = str(config.get("monotemp_arch", "")).endswith("-upernet")
        tile = int(config.get("img_pixels_detection", 512))
        margin = int(config.get("margin", 0))
        n_cls = max(
            (len(t["class_names"]) for t in config.get("tasks", [])
             if t.get("active")), default=0,
        )
        fit = _epi.supports(n_cls, tile // 4, tile // 4, margin, 4)
        on_tpu = _jax.devices()[0].platform == "tpu"
        if arch_ok and fit and (flag is True or on_tpu):
            model_cfg["zonal_stride4_logits"] = True
    model = FlairHubModel(config=model_cfg, img_input_sizes=patch_sizes)
    example = example_batch_for(model_cfg, patch_sizes, batch_size, t_steps)
    # jit the init: one compiled program instead of per-op dispatch (which is
    # pathologically slow over a tunneled TPU)
    variables = jax.jit(model.init)(jax.random.key(0), example)
    variables = dict(variables)
    variables, _report = load_checkpoint(
        model_cfg, variables,
        transpose_conv_prefixes=FLAIR_TRANSPOSE_CONV_PATTERNS,
        exit_on_fail=bool(model_cfg["paths"].get("ckpt_model_path")),
    )
    return model, variables, model_cfg
