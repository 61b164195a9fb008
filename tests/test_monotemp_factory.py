"""Model-factory arch surface: timm swin name parsing + smp 'tu-' fallback
(reference monotemp_model.py:67-92 accepts arbitrary timm encoders via the
'tu-' prefix; we resolve the swin v1 family by parsing the name)."""

import pytest

from flair_for_aigle_tpu.models.monotemp import (
    MonotempSpec,
    encoder_out_channels,
    swin_spec,
)


@pytest.mark.parametrize("name,ed,win,patch", [
    ("swin_tiny_patch4_window7_224", 96, 7, 4),
    ("swin_small_patch4_window7_224", 96, 7, 4),
    ("swin_base_patch4_window7_224", 128, 7, 4),
    ("swin_base_patch4_window12_384", 128, 12, 4),
    ("swin_large_patch4_window12_384", 192, 12, 4),
    # names outside the old whitelist now parse too
    ("swin_large_patch4_window7_224", 192, 7, 4),
    ("swin_tiny_patch4_window12_384", 96, 12, 4),
])
def test_swin_name_parses(name, ed, win, patch):
    spec = swin_spec(name)
    assert spec is not None
    assert spec[0] == ed and spec[3] == win and spec[4] == patch


def test_tu_prefix_accepted():
    base = encoder_out_channels("swin_base_patch4_window12_384", 3)
    tu = encoder_out_channels("tu-swin_base_patch4_window12_384", 3)
    assert base == tu == (3, 0, 128, 256, 512, 1024)


def test_from_arch_keeps_tu_encoder():
    spec = MonotempSpec.from_arch("tu-swin_base_patch4_window12_384-upernet")
    assert spec.encoder_name == "tu-swin_base_patch4_window12_384"
    assert spec.decoder_name == "upernet"


def test_unknown_encoder_actionable_error():
    # vit is outside the supported encoder families (convnext/efficientnet
    # joined the surface in round 4, so they no longer work as the
    # unknown-name example here).
    with pytest.raises(ValueError, match="Supported families"):
        encoder_out_channels("vit_base_patch16_224", 3)
    assert swin_spec("swin_frobnicate_patch4_window7_224") is None
