"""FLAIR-HUB multimodal fusion model, TPU-native.

Behavioral port of the reference FLAIR_HUB_Model + FusionHandler
(/root/reference/flair_hub/models/flair_model.py:16-547). Public contract
matches the reference: ``forward(batch, apply_mod_dropout)`` consumes a dict
of NCHW tensors — mono modalities (B, C, H, W), time series (B, T, C, H, W)
with ``<MOD>_DATES`` (B, T) day offsets, labels one-hot (B, K, H, W) — and
returns ``(logits_tasks, logits_aux)`` with NCHW logits per task. Internally
everything runs NHWC (TPU layout); boundary transposes are free under XLA.

Ported quirks (documented, not silently copied — SURVEY.md section 7):
* aux logits are keyed ``aux_{mod}_{task}`` exactly like the reference
  (flair_model.py:384); the reference's training step never matches those
  keys, so its aux loss is dead code — our loss module exposes
  ``aux_loss_fix`` to enable the evidently-intended behavior.
* UTAE logits are bilinearly interpolated twice (flair_model.py:391-393) —
  idempotent, kept single here.
* Fusion pairs UTAE maps with mono stages positionally — the UTAE bottleneck
  (lowest res) aligns to the mono stride-4 stage (flair_model.py:514-533).

Param paths mirror reference checkpoint keys:
``encoders.<MOD>.seg_model.*`` (mono), ``encoders.<MOD>.*`` (UTAE),
``fusion_handler.conv_f.{i}``, ``main_decoders.<task>.seg_model.*``,
``aux_decoders.<MOD>__<task>.seg_model.*``.
"""

from __future__ import annotations

import logging
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from flair_for_aigle_tpu.models.layers import TorchConv, xavier_uniform
from flair_for_aigle_tpu.models.monotemp import (
    MonotempDecoder,
    MonotempSpec,
    encoder_out_channels,
    make_encoder,
)
from flair_for_aigle_tpu.models.utae import UTAE, UTAE_TRANSPOSE_CONV_PATTERNS
from flair_for_aigle_tpu.ops.resize import resize_bilinear_nhwc

logger = logging.getLogger(__name__)

MONO_KEYS = ["AERIAL_RGBI", "AERIAL-RLT_PAN", "DEM_ELEV", "SPOT_RGBI"]
MULTI_KEYS = ["SENTINEL2_TS", "SENTINEL1-ASC_TS", "SENTINEL1-DESC_TS"]

# converter hint: transposed convs live inside UTAE blocks (``.up.0``) and
# the LinkNet decoder's TransposeX2 (``.block.1.0``)
from flair_for_aigle_tpu.models.linknet import LINKNET_TRANSPOSE_CONV_PATTERNS

FLAIR_TRANSPOSE_CONV_PATTERNS = (
    tuple(UTAE_TRANSPOSE_CONV_PATTERNS) + tuple(LINKNET_TRANSPOSE_CONV_PATTERNS)
)


def round_to_nearest_power_of_two(x: float) -> int:
    return 2 ** round(math.log2(x))


def adjust_fm_length(config_or_mt: dict, mono_channels: list[int]) -> list[int]:
    """Reference adjust_fm_length (flair_model.py:194-216).

    Accepts either the full config or the multitemp sub-config.
    """
    chans = list(mono_channels)
    if len(chans) > 2 and (chans[0] == 0 or chans[1] == 0):
        chans = chans[2:]
    mt = config_or_mt
    if "models" in config_or_mt:
        mt = config_or_mt["models"].get(
            "multitemp_model", {"encoder_widths": [64, 64, 64, 128]}
        )
    ew = mt["encoder_widths"]
    expanded = np.linspace(min(ew) - 1, max(ew) + 1, len(chans)).astype(int)
    return [round_to_nearest_power_of_two(v) for v in expanded]


def compute_channels_dict(config: dict) -> dict[str, int]:
    """Reference channel inference incl. DEM elevation logic
    (flair_model.py:70-87)."""
    channels = {}
    for mod in config["modalities"]["inputs"]:
        if mod in ("AERIAL-RLT_PAN", "DEM_ELEV"):
            channels[mod] = 1
        else:
            channels[mod] = len(
                config["modalities"].get("inputs_channels", {}).get(mod, [])
            )
    if config["modalities"]["inputs"].get("DEM_ELEV"):
        pp = config["modalities"]["pre_processings"]
        channels["DEM_ELEV"] = (
            1 if pp["calc_elevation"] and not pp["calc_elevation_stack_dsm"] else 2
        )
    return channels


def resolve_model_plan(config: dict) -> dict:
    """Static planning: active modalities, channels, widths, class counts."""
    inputs = config["modalities"]["inputs"]
    active_mono = [m for m in MONO_KEYS if inputs.get(m, False)]
    active_multi = [m for m in MULTI_KEYS if inputs.get(m, False)]
    labels = list(config["labels"])
    nclasses = {
        t: len(config["labels_configs"][t]["value_name"]) for t in labels
    }
    task_nclasses = sum(nclasses.values())
    channels = compute_channels_dict(config)
    spec = MonotempSpec.from_arch(config["models"]["monotemp_model"]["arch"])

    default_mt = {
        "ref_date": "05-15",
        "encoder_widths": [64, 64, 64, 128],
        "decoder_widths": [32, 32, 64, 128],
        "out_conv": [32, 19],
        "str_conv_k": 3, "str_conv_s": 1, "str_conv_p": 1,
        "agg_mode": "att_group", "encoder_norm": "group",
        "n_head": 16, "d_model": 256, "d_k": 4,
        "pad_value": 0, "padding_mode": "reflect",
    }
    mt = dict(config["models"].get("multitemp_model", default_mt))
    out_conv = list(mt["out_conv"])
    if active_multi and task_nclasses != out_conv[-1]:
        out_conv = out_conv + [task_nclasses]
    if active_mono:
        mono_oc = list(encoder_out_channels(spec.encoder_name, channels[active_mono[0]]))
        widths = adjust_fm_length(mt, mono_oc)
        mt["encoder_widths"] = widths
        mt["decoder_widths"] = widths
    mt["out_conv"] = out_conv

    aux_losses = {
        mod: loss
        for mod, loss in config["modalities"].get("aux_loss", {}).items()
        if loss and inputs.get(mod, False)
    }

    return dict(
        active_mono=active_mono,
        active_multi=active_multi,
        labels=labels,
        nclasses=nclasses,
        task_nclasses=task_nclasses,
        channels=channels,
        spec=spec,
        multitemp=mt,
        aux_losses=aux_losses,
    )


def calc_backbones_channels(plan: dict) -> list[int]:
    """Reference calc_backbones_channels (flair_model.py:292-315)."""
    per_backbone = []
    for mod in plan["active_mono"]:
        oc = list(encoder_out_channels(plan["spec"].encoder_name, plan["channels"][mod]))
        if len(oc) > 2 and (oc[0] == 0 or oc[1] == 0):
            oc = oc[2:]
        per_backbone.append(oc)
    reversed_decoder = list(plan["multitemp"]["decoder_widths"])[::-1]
    for mod in plan["active_multi"]:
        per_backbone.append(reversed_decoder)
    return [sum(x) for x in zip(*per_backbone)]


class FusionHandler(nn.Module):
    """Reference FusionHandler (flair_model.py:437-547), NHWC."""

    backbones_channels: tuple[int, ...]
    target_fused_channels: tuple[int, ...]

    @nn.compact
    def __call__(self, feature_maps: dict, target_fm_maps, train: bool = False):
        active = list(feature_maps.keys())
        mono_active = [k for k in active if k in MONO_KEYS]
        multi_active = [k for k in active if k in MULTI_KEYS]

        if len(mono_active) == 1 and not multi_active:
            return feature_maps[mono_active[0]]
        if not mono_active and len(multi_active) == 1:
            return feature_maps[multi_active[0]]
        if not mono_active and len(multi_active) > 1:
            stacked = jnp.stack([feature_maps[k] for k in multi_active], axis=0)
            return jnp.mean(stacked, axis=0)

        # full fusion
        target_shapes = [fm.shape for fm in target_fm_maps]
        if target_shapes[0][-1] == 0 or target_shapes[1][-1] == 0:
            target_shapes = target_shapes[2:]
            dummy_maps = list(target_fm_maps[:2])
        else:
            dummy_maps = None

        aligned = []
        for mod in active:
            mod_fmaps = list(feature_maps[mod])
            if mod_fmaps[0].shape[-1] == 0 or mod_fmaps[1].shape[-1] == 0:
                mod_fmaps = mod_fmaps[2:]
            if len(mod_fmaps) != len(target_shapes):
                mod_fmaps = [mod_fmaps[0]] * (len(target_shapes) - len(mod_fmaps)) + mod_fmaps
            resized = [
                resize_bilinear_nhwc(fm, ts[-3], ts[-2])
                for fm, ts in zip(mod_fmaps, target_shapes)
            ]
            aligned.append(resized)

        stacked = [jnp.concatenate(fms, axis=-1) for fms in zip(*aligned)]
        tfc = list(self.target_fused_channels)
        if len(tfc) > 2 and (tfc[0] == 0 or tfc[1] == 0):
            tfc = tfc[2:]
        adjusted = [
            TorchConv(out_ch, 1, 1, 0, name=f"conv_f.{i}")(fm)
            for i, (fm, out_ch) in enumerate(zip(stacked, tfc))
        ]
        if dummy_maps is not None:
            adjusted = dummy_maps + adjusted
        return adjusted


class FlairHubModel(nn.Module):
    """Multimodal multi-task segmentation model (reference FLAIR_HUB_Model)."""

    config: Any  # plain config dict, reference schema
    img_input_sizes: Any = None  # {mod: px}; unused by conv graph, kept for parity

    def _nchw_to_nhwc(self, x):
        return jnp.transpose(x, (0, 2, 3, 1))

    def _ts_to_nhwc(self, x):
        return jnp.transpose(x, (0, 1, 3, 4, 2))

    @nn.compact
    def __call__(self, batch: Dict[str, jax.Array], apply_mod_dropout: bool = False,
                 train: bool = False):
        cfg = self.config
        plan = resolve_model_plan(cfg)
        labels = plan["labels"]
        img_size = batch[labels[0]].shape[-1]

        fmaps: dict[str, Any] = {}
        logits_tasks: dict[str, jax.Array] = {}
        logits_aux: dict[str, jax.Array] = {}

        # ---- encoders --------------------------------------------------
        for mod in plan["active_mono"]:
            enc = make_encoder(
                plan["spec"].encoder_name, plan["channels"][mod],
                name=f"encoders.{mod}.seg_model",
                remat=cfg["models"]["monotemp_model"].get("remat", False),
                attn_f32=cfg["models"]["monotemp_model"].get("attn_f32", True),
                attn_kernel=cfg["models"]["monotemp_model"].get(
                    "attn_kernel", "auto"),
                # smp DeepLabV3Plus dilates its encoder to output_stride 16
                # (plain DeepLabV3 to 8); smp PSPNet truncates it to
                # encoder_depth 3
                output_stride={"deeplabv3plus": 16, "deeplabv3": 8,
                               "pan": 16}.get(plan["spec"].decoder_name, 32),
                depth=(3 if plan["spec"].decoder_name == "pspnet" else 5),
            )
            fmaps[mod] = enc(self._nchw_to_nhwc(batch[mod]), train=train)
            if plan["aux_losses"].get(mod):
                for task in labels:
                    dec = MonotempDecoder(
                        plan["spec"].decoder_name, plan["nclasses"][task],
                        name=f"aux_decoders.{mod}__{task}.seg_model",
                    )
                    out = dec(*fmaps[mod], train=train)
                    out = resize_bilinear_nhwc(out, img_size, img_size)
                    logits_aux[f"aux_{mod}_{task}"] = jnp.transpose(out, (0, 3, 1, 2))

        mt = plan["multitemp"]
        for mod in plan["active_multi"]:
            utae = UTAE(
                input_dim=len(cfg["modalities"]["inputs_channels"][mod]),
                encoder_widths=tuple(mt["encoder_widths"]),
                decoder_widths=tuple(mt["decoder_widths"]),
                out_conv=tuple(mt["out_conv"]),
                str_conv_k=mt["str_conv_k"], str_conv_s=mt["str_conv_s"],
                str_conv_p=mt["str_conv_p"], agg_mode=mt["agg_mode"],
                encoder_norm=mt["encoder_norm"], n_head=mt["n_head"],
                d_model=mt["d_model"], d_k=mt["d_k"], encoder=False,
                return_maps=True, pad_value=mt["pad_value"],
                padding_mode=mt["padding_mode"],
                name=f"encoders.{mod}",
            )
            dates = batch.get(mod.replace("TS", "DATES"))
            lg, maps = utae(self._ts_to_nhwc(batch[mod]), batch_positions=dates,
                            train=train)
            lg = resize_bilinear_nhwc(lg, img_size, img_size)
            logits_tasks[mod] = lg  # NHWC internally; transposed on return
            fmaps[mod] = maps
            if plan["aux_losses"].get(mod):
                for task in labels:
                    aux = TorchConv(
                        plan["nclasses"][task], 1, 1, 0,
                        name=f"aux_decoders.{mod}__{task}",
                    )(lg)
                    logits_aux[f"aux_{mod}_{task}"] = jnp.transpose(aux, (0, 3, 1, 2))

        # ---- modality dropout (training only) --------------------------
        if apply_mod_dropout and len(fmaps) > 1:
            rng = self.make_rng("mod_dropout")
            for key in list(fmaps.keys()):
                rng, r1, r2, r3 = jax.random.split(rng, 4)
                drop_prob = jax.random.uniform(r1)
                do_drop = jax.random.uniform(r2) < drop_prob
                maps = fmaps[key]
                was_list = isinstance(maps, (list, tuple))
                items = list(maps) if was_list else [maps]
                replaced = []
                for t_i, tensor in enumerate(items):
                    r3, rk = jax.random.split(r3)
                    if 0 in tensor.shape:
                        replaced.append(tensor)
                        continue
                    noise = xavier_uniform()(rk, tensor.shape, tensor.dtype)
                    replaced.append(
                        jnp.where(do_drop, noise, tensor)
                    )
                fmaps[key] = replaced if was_list else replaced[0]

        # ---- fusion ----------------------------------------------------
        if plan["active_mono"]:
            target_fused = tuple(
                encoder_out_channels(
                    plan["spec"].encoder_name, plan["channels"][plan["active_mono"][0]]
                )
            )
            backbones = tuple(calc_backbones_channels(plan))
            fusion = FusionHandler(
                backbones_channels=backbones,
                target_fused_channels=target_fused,
                name="fusion_handler",
            )
            fused = fusion(fmaps, fmaps[plan["active_mono"][0]], train=train)
        else:
            fusion = FusionHandler(
                backbones_channels=(1,), target_fused_channels=(1,),
                name="fusion_handler",
            )
            fused = fusion(logits_tasks, logits_tasks[plan["active_multi"][0]],
                           train=train)

        # ---- task decoders ---------------------------------------------
        # zonal_stride4_logits (set by zonal/model_utils.py on TPU): return
        # the upernet head's stride-4 NHWC logits and let the inference
        # engine's fused upsample-crop-convert kernel (ops/pallas/epilogue)
        # do the x4 bilinear — skipping ~3 GB/batch of full-res f32 logits
        # traffic (upsample + NCHW transpose). Training and CPU paths keep
        # the reference-parity full-resolution NCHW contract.
        stride4 = (not train and cfg.get("zonal_stride4_logits")
                   and plan["active_mono"]
                   and plan["spec"].decoder_name == "upernet")
        for task in labels:
            if plan["active_mono"]:
                dec = MonotempDecoder(
                    plan["spec"].decoder_name, plan["nclasses"][task],
                    head_upsampling=1 if stride4 else 4,
                    name=f"main_decoders.{task}.seg_model",
                )
                out = dec(*fused, train=train)
                if not stride4:
                    out = resize_bilinear_nhwc(out, img_size, img_size)
            else:
                if len(labels) > 1:
                    out = TorchConv(
                        plan["nclasses"][task], 1, 1, 0,
                        name=f"main_decoders.{task}",
                    )(fused)
                else:
                    out = fused
            logits_tasks[task] = out

        # drop modality logits, return NCHW (reference flair_model.py:426-430)
        # stride4 mode keeps NHWC at h/4 — the epilogue kernel transposes the
        # small tensor itself; a full-res NCHW copy is what we're avoiding
        out_tasks = {
            task: (logits_tasks[task] if stride4
                   else jnp.transpose(logits_tasks[task], (0, 3, 1, 2)))
            for task in labels
        }
        return out_tasks, logits_aux


def count_params(tree) -> int:
    import numpy as _np

    return sum(int(_np.prod(_np.shape(x))) for x in jax.tree.leaves(tree))


def print_model_parameters(variables: dict, config: dict) -> str:
    """Parameter-count table per component (reference
    print_model_parameters, flair_model.py:219-289). Returns the table and
    logs it on rank zero."""
    params = variables.get("params", variables)
    arch = config["models"]["monotemp_model"]["arch"]
    enc_arch = arch.split("-")[0]
    dec_arch = arch.split("-")[1] if "-" in arch else arch

    groups: dict[str, dict] = {"backbone": {}, "aux loss decoder": {},
                               "task decoder": {}, "other": {}}
    for name, sub in params.items():
        n = count_params(sub)
        if name.startswith("encoders."):
            mod = name.split(".")[1]
            kind = "utae" if mod in MULTI_KEYS else enc_arch
            groups["backbone"][mod] = (kind, n)
        elif name.startswith("aux_decoders."):
            groups["aux loss decoder"][name.split(".")[1]] = (dec_arch, n)
        elif name.startswith("main_decoders."):
            groups["task decoder"][name.split(".")[1]] = (dec_arch, n)
        else:
            groups["other"][name] = ("-", n)

    total = count_params(params)
    lines = [" " + "-" * 113]
    lines.append("| {:<37} | {:<35} | {:<17} | {:<13} |".format(
        "Model modality", "Architecture", "Type", "Parameters"))
    for gname in ("backbone", "aux loss decoder", "task decoder", "other"):
        for key, (kind, n) in groups[gname].items():
            lines.append("| {:<37} | {:<35} | {:<17} | {:>13,} |".format(
                key, kind, gname, n))
    lines.append("| {:<37}   {:<35}   {:<17}   {:>13,} |".format(
        "Total parameters", "", "", total))
    lines.append(" " + "-" * 113)
    table = "\n".join(lines)
    logger.info("\n%s", table)
    return table
