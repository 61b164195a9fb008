"""Monotemporal model factory: the smp ``create_model`` equivalent.

Behavioral port of the reference's FLAIR_Monotemp
(/root/reference/flair_hub/models/monotemp_model.py:34-97): the arch string
``"<encoder>-<decoder>"`` (e.g. ``resnet34-unet``,
``swin_base_patch4_window12_384-upernet``) selects an encoder tower and a
decoder+head. ``return_type='encoder'`` yields the feature-pyramid tower;
``'decoder'`` yields a DecoderWrapper-equivalent module (decoder →
segmentation head) consuming a feature pyramid.

Naming: flax module names may contain dots, and we exploit that to mirror
torch state-dict keys exactly. A parent instantiates
``make_encoder(..., name="encoders.AERIAL_RGBI.seg_model")`` and gets param
keys like ``encoders.AERIAL_RGBI.seg_model.conv1.weight`` (ResNet, flat
torchvision keys) or ``...seg_model.model.patch_embed.proj.weight`` (Swin —
smp's TimmUniversalEncoder nests the timm backbone under ``model.``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from flax import linen as nn

from flair_for_aigle_tpu.models.convnext import ConvNeXtEncoder
from flair_for_aigle_tpu.models.efficientnet import (
    EfficientNetEncoder,
    efficientnet_spec,
)
from flair_for_aigle_tpu.models.deeplab import (
    DeepLabSegmentationHead,
    DeepLabV3Decoder,
    DeepLabV3PlusDecoder,
)
from flair_for_aigle_tpu.models.fpn import FPNDecoder, FPNSegmentationHead
from flair_for_aigle_tpu.models.linknet import (
    LinknetDecoder,
    LinknetSegmentationHead,
)
from flair_for_aigle_tpu.models.manet import MAnetDecoder
from flair_for_aigle_tpu.models.pan import PANDecoder, PANSegmentationHead
from flair_for_aigle_tpu.models.pspnet import PSPDecoder, PSPSegmentationHead
from flair_for_aigle_tpu.models.resnet import ResNetEncoder, _RESNET_SPECS
from flair_for_aigle_tpu.models.swin import SwinTransformerEncoder
from flair_for_aigle_tpu.models.unet import SegmentationHead, UnetDecoder
from flair_for_aigle_tpu.models.unetplusplus import UnetPlusPlusDecoder
from flair_for_aigle_tpu.models.upernet import UPerNetDecoder, UPerNetSegmentationHead

# timm Swin-v1 size table: size tag -> (embed_dim, depths, num_heads).
# Any timm arch string ``swin_<size>_patch<p>_window<w>_<res>`` resolves
# against it — matching the reference's open ``tu-<timm>`` fallback surface
# (reference monotemp_model.py:67-92) for the swin family.
_SWIN_SIZES = {
    # 'micro' is NOT a timm release: a test-scale tag (kernel-eligible
    # embed_dim 128, one block per stage) so CPU interpret-mode tests can
    # drive the fused-kernel paths at tractable cost.
    "micro": (128, (1, 1, 1, 1), (4, 8, 16, 32)),
    "tiny": (96, (2, 2, 6, 2), (3, 6, 12, 24)),
    "small": (96, (2, 2, 18, 2), (3, 6, 12, 24)),
    "base": (128, (2, 2, 18, 2), (4, 8, 16, 32)),
    "large": (192, (2, 2, 18, 2), (6, 12, 24, 48)),
}
_SWIN_NAME_RE = re.compile(r"swin_([a-z]+)_patch(\d+)_window(\d+)_(\d+)")

# timm ConvNeXt v1 size table: size tag -> (dims, depths). Any
# ``convnext_<size>`` (optionally with a timm pretrained-tag suffix like
# ``.fb_in22k``, which names weights not architecture) resolves against it.
_CONVNEXT_SIZES = {
    # 'micro' is NOT a timm release: a test-scale tag (one block per stage)
    # so CPU parity tests run at tractable cost, mirroring swin 'micro'.
    "micro": ((16, 32, 64, 128), (1, 1, 1, 1)),
    "tiny": ((96, 192, 384, 768), (3, 3, 9, 3)),
    "small": ((96, 192, 384, 768), (3, 3, 27, 3)),
    "base": ((128, 256, 512, 1024), (3, 3, 27, 3)),
    "large": ((192, 384, 768, 1536), (3, 3, 27, 3)),
    "xlarge": ((256, 512, 1024, 2048), (3, 3, 27, 3)),
}
_CONVNEXT_NAME_RE = re.compile(r"convnext_([a-z]+)(?:\..+)?")

# timm EfficientNet (MBConv): ``efficientnet_b{0..7}`` plus the test-scale
# 'micro' tag; pretrained-tag suffixes (``.ra_in1k`` etc.) name weights,
# not architecture, and are accepted.
_EFFNET_NAME_RE = re.compile(r"efficientnet_(b\d|micro)(?:\..+)?")


def effnet_spec(encoder_name: str):
    """(stem_channels, stage specs) for a timm efficientnet name, else
    None."""
    m = _EFFNET_NAME_RE.fullmatch(encoder_name)
    if not m:
        return None
    return efficientnet_spec(m.group(1))


def convnext_spec(encoder_name: str):
    """(dims, depths) for a timm convnext v1 name, else None."""
    m = _CONVNEXT_NAME_RE.fullmatch(encoder_name)
    if not m or m.group(1) not in _CONVNEXT_SIZES:
        return None
    return _CONVNEXT_SIZES[m.group(1)]


def swin_spec(encoder_name: str):
    """(embed_dim, depths, heads, window, patch) for a timm swin v1 name,
    else None."""
    m = _SWIN_NAME_RE.fullmatch(encoder_name)
    if not m or m.group(1) not in _SWIN_SIZES:
        return None
    ed, depths, heads = _SWIN_SIZES[m.group(1)]
    return ed, depths, heads, int(m.group(3)), int(m.group(2))


def _strip_tu(encoder_name: str) -> str:
    """Reference FLAIR_Monotemp retries unknown encoders with smp's
    ``tu-<timm>`` prefix (monotemp_model.py:76-92); accept it spelled out."""
    return encoder_name[3:] if encoder_name.startswith("tu-") else encoder_name


def _unknown_encoder_error(encoder_name: str) -> ValueError:
    return ValueError(
        f"Unknown encoder '{encoder_name}'. Supported families: "
        f"resnet ({', '.join(sorted(_RESNET_SPECS))}), timm swin v1 "
        f"(any 'swin_<size>_patch<p>_window<w>_<res>' with size in "
        f"{sorted(_SWIN_SIZES)}), timm convnext v1 "
        f"('convnext_<size>' with size in {sorted(_CONVNEXT_SIZES)}) and "
        f"timm efficientnet ('efficientnet_b0'..'b7'); "
        f"a 'tu-' prefix is accepted and stripped."
    )


def encoder_out_channels(encoder_name: str, in_channels: int) -> tuple[int, ...]:
    encoder_name = _strip_tu(encoder_name)
    if encoder_name in _RESNET_SPECS:
        return ResNetEncoder(arch=encoder_name, in_channels=in_channels).out_channels
    spec = swin_spec(encoder_name)
    if spec is not None:
        ed, depths, heads, win, patch = spec
        return SwinTransformerEncoder(
            in_channels=in_channels, embed_dim=ed, depths=depths,
            num_heads=heads, window_size=win, patch_size=patch,
        ).out_channels
    cspec = convnext_spec(encoder_name)
    if cspec is not None:
        dims, depths = cspec
        return ConvNeXtEncoder(in_channels=in_channels, dims=dims,
                               depths=depths).out_channels
    espec = effnet_spec(encoder_name)
    if espec is not None:
        stem, stages = espec
        return EfficientNetEncoder(in_channels=in_channels,
                                   stem_channels=stem,
                                   stages=stages).out_channels
    raise _unknown_encoder_error(encoder_name)


class TimmUniversalEncoder(nn.Module):
    """smp's timm wrapper: backbone params live under a ``model.`` sub-level."""

    encoder_name: str
    in_channels: int
    remat: bool = False
    attn_f32: bool = True
    attn_kernel: str = "auto"

    @property
    def out_channels(self) -> tuple[int, ...]:
        return encoder_out_channels(self.encoder_name, self.in_channels)

    @nn.compact
    def __call__(self, x, train: bool = False):
        name = _strip_tu(self.encoder_name)
        spec = swin_spec(name)
        if spec is not None:
            ed, depths, heads, win, patch = spec
            return SwinTransformerEncoder(
                in_channels=self.in_channels, embed_dim=ed, depths=depths,
                num_heads=heads, window_size=win, patch_size=patch,
                remat=self.remat,
                attn_f32=self.attn_f32, attn_kernel=self.attn_kernel,
                name="model",
            )(x, train=train)
        cspec = convnext_spec(name)
        if cspec is not None:
            dims, depths = cspec
            return ConvNeXtEncoder(
                in_channels=self.in_channels, dims=dims, depths=depths,
                remat=self.remat, name="model",
            )(x, train=train)
        stem, stages = effnet_spec(name)
        return EfficientNetEncoder(
            in_channels=self.in_channels, stem_channels=stem, stages=stages,
            remat=self.remat, name="model",
        )(x, train=train)


def make_encoder(encoder_name: str, in_channels: int, name: str,
                 remat: bool = False, attn_f32: bool = True,
                 attn_kernel: str = "auto",
                 output_stride: int = 32, depth: int = 5) -> nn.Module:
    """Encoder module rooted at ``name`` with smp-compatible internal naming.

    ``output_stride`` < 32 requests smp's make_dilated (DeepLabV3+ needs
    16/8); only the resnet family supports it — timm transformer/MBConv
    encoders raise like smp's TimmUniversalEncoder does. ``depth`` < 5
    requests a truncated encoder (PSPNet uses encoder_depth=3) — resnet
    only, for the same reason.
    """
    encoder_name = _strip_tu(encoder_name)
    if encoder_name in _RESNET_SPECS:
        return ResNetEncoder(arch=encoder_name, in_channels=in_channels,
                             output_stride=output_stride, depth=depth,
                             name=name)
    if swin_spec(encoder_name) is not None or \
            convnext_spec(encoder_name) is not None or \
            effnet_spec(encoder_name) is not None:
        if output_stride != 32:
            raise ValueError(
                f"encoder '{encoder_name}' does not support dilated mode "
                f"(output_stride={output_stride}); DeepLabV3+ needs a "
                f"resnet encoder")
        if depth != 5:
            raise ValueError(
                f"encoder '{encoder_name}' does not support encoder_depth="
                f"{depth}; PSPNet needs a resnet encoder")
        return TimmUniversalEncoder(encoder_name, in_channels, remat=remat,
                                    attn_f32=attn_f32, attn_kernel=attn_kernel,
                                    name=name)
    raise _unknown_encoder_error(encoder_name)


class MonotempDecoder(nn.Module):
    """``FLAIR_Monotemp(return_type='decoder')`` equivalent (DecoderWrapper).

    Instantiate with ``name='main_decoders.<task>.seg_model'`` in a parent so
    param paths match reference checkpoint keys.
    """

    decoder_name: str
    classes: int
    # upernet head upsampling factor; 1 = emit stride-4 logits for the
    # fused zonal epilogue kernel (params are identical either way)
    head_upsampling: int = 4

    @nn.compact
    def __call__(self, *features, train: bool = False):
        if self.decoder_name == "unet":
            y = UnetDecoder(name="decoder")(*features, train=train)
            return SegmentationHead(self.classes, name="segmentation_head")(y)
        if self.decoder_name == "unetplusplus":
            y = UnetPlusPlusDecoder(name="decoder")(*features, train=train)
            return SegmentationHead(self.classes, name="segmentation_head")(y)
        if self.decoder_name == "upernet":
            y = UPerNetDecoder(name="decoder")(*features, train=train)
            return UPerNetSegmentationHead(
                self.classes, upsampling=self.head_upsampling,
                name="segmentation_head",
            )(y)
        if self.decoder_name == "fpn":
            y = FPNDecoder(name="decoder")(*features, train=train)
            return FPNSegmentationHead(
                self.classes, name="segmentation_head")(y)
        if self.decoder_name == "deeplabv3plus":
            y = DeepLabV3PlusDecoder(name="decoder")(*features, train=train)
            return DeepLabSegmentationHead(
                self.classes, name="segmentation_head")(y)
        if self.decoder_name == "linknet":
            y = LinknetDecoder(name="decoder")(*features, train=train)
            return LinknetSegmentationHead(
                self.classes, name="segmentation_head")(y)
        if self.decoder_name == "pspnet":
            y = PSPDecoder(name="decoder")(*features, train=train)
            return PSPSegmentationHead(
                self.classes, name="segmentation_head")(y)
        if self.decoder_name == "deeplabv3":
            y = DeepLabV3Decoder(name="decoder")(*features, train=train)
            return DeepLabSegmentationHead(
                self.classes, upsampling=8, name="segmentation_head")(y)
        if self.decoder_name == "manet":
            y = MAnetDecoder(name="decoder")(*features, train=train)
            return SegmentationHead(self.classes, name="segmentation_head")(y)
        if self.decoder_name == "pan":
            y = PANDecoder(name="decoder")(*features, train=train)
            return PANSegmentationHead(
                self.classes, name="segmentation_head")(y)
        raise ValueError(f"Unknown decoder: {self.decoder_name}")


@dataclass
class MonotempSpec:
    encoder_name: str
    decoder_name: str

    @classmethod
    def from_arch(cls, arch: str) -> "MonotempSpec":
        # decoder is the last dash-part; the encoder may itself contain
        # dashes (smp's 'tu-<timm>' prefix)
        enc, dec = arch.rsplit("-", 1)
        return cls(enc, dec)


class SmpModel(nn.Module):
    """Standalone smp-style model (encoder/decoder/segmentation_head), used
    for single-modality paths and as the minimum end-to-end slice."""

    arch: str
    in_channels: int = 3
    classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = MonotempSpec.from_arch(self.arch)
        # smp DeepLabV3Plus and PAN dilate the encoder to output_stride 16
        # (plain DeepLabV3 to 8); smp PSPNet truncates it to encoder_depth 3
        os_ = {"deeplabv3plus": 16, "deeplabv3": 8,
               "pan": 16}.get(spec.decoder_name, 32)
        depth = 3 if spec.decoder_name == "pspnet" else 5
        feats = make_encoder(spec.encoder_name, self.in_channels,
                             name="encoder", output_stride=os_,
                             depth=depth)(
            x, train=train
        )
        if spec.decoder_name == "unet":
            y = UnetDecoder(name="decoder")(*feats, train=train)
            return SegmentationHead(self.classes, name="segmentation_head")(y)
        if spec.decoder_name == "unetplusplus":
            y = UnetPlusPlusDecoder(name="decoder")(*feats, train=train)
            return SegmentationHead(self.classes, name="segmentation_head")(y)
        if spec.decoder_name == "upernet":
            y = UPerNetDecoder(name="decoder")(*feats, train=train)
            return UPerNetSegmentationHead(self.classes, name="segmentation_head")(y)
        if spec.decoder_name == "fpn":
            y = FPNDecoder(name="decoder")(*feats, train=train)
            return FPNSegmentationHead(self.classes, name="segmentation_head")(y)
        if spec.decoder_name == "deeplabv3plus":
            y = DeepLabV3PlusDecoder(name="decoder")(*feats, train=train)
            return DeepLabSegmentationHead(
                self.classes, name="segmentation_head")(y)
        if spec.decoder_name == "linknet":
            y = LinknetDecoder(name="decoder")(*feats, train=train)
            return LinknetSegmentationHead(
                self.classes, name="segmentation_head")(y)
        if spec.decoder_name == "pspnet":
            y = PSPDecoder(name="decoder")(*feats, train=train)
            return PSPSegmentationHead(
                self.classes, name="segmentation_head")(y)
        if spec.decoder_name == "deeplabv3":
            y = DeepLabV3Decoder(name="decoder")(*feats, train=train)
            return DeepLabSegmentationHead(
                self.classes, upsampling=8, name="segmentation_head")(y)
        if spec.decoder_name == "manet":
            y = MAnetDecoder(name="decoder")(*feats, train=train)
            return SegmentationHead(self.classes, name="segmentation_head")(y)
        if spec.decoder_name == "pan":
            y = PANDecoder(name="decoder")(*feats, train=train)
            return PANSegmentationHead(
                self.classes, name="segmentation_head")(y)
        raise ValueError(f"Unknown decoder: {spec.decoder_name}")


def create_monotemp_model(
    config: dict,
    channels: int = 3,
    classes: int = 19,
    img_size: int = 512,
    return_type: str = "encoder",
):
    """Reference FLAIR_Monotemp factory info (monotemp_model.py:34-97).

    Returns the (encoder_name/decoder_name, module-factory) pieces used by
    FlairHubModel; see models/flair_model.py.
    """
    assert return_type in ("encoder", "decoder")
    spec = MonotempSpec.from_arch(config["models"]["monotemp_model"]["arch"])
    if return_type == "encoder":
        return spec.encoder_name
    return spec.decoder_name
