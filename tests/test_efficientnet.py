"""EfficientNet encoder family: parity vs the torch oracle through the
checkpoint converter, factory wiring, decoder attach. Third timm family on
the reference's open ``tu-<timm>`` surface
(/root/reference/flair_hub/models/monotemp_model.py:67-92)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from flair_for_aigle_tpu.models.checkpoint import convert_torch_state_dict
from flair_for_aigle_tpu.models.efficientnet import (
    EfficientNetEncoder,
    efficientnet_spec,
)
from flair_for_aigle_tpu.models.monotemp import (
    SmpModel,
    encoder_out_channels,
)

from tests.torch_refs import TEfficientNetEncoder, TEfficientNetUnet

STEM, STAGES = efficientnet_spec("micro")


def test_variant_channel_math_matches_timm():
    """Published timm features_only channels for every b-variant — the
    make_divisible / ceil-depth scaling must reproduce them exactly."""
    want = {
        "b0": (16, 24, 40, 112, 320),
        "b1": (16, 24, 40, 112, 320),
        "b2": (16, 24, 48, 120, 352),
        "b3": (24, 32, 48, 136, 384),
        "b4": (24, 32, 56, 160, 448),
        "b5": (24, 40, 64, 176, 512),
        "b6": (32, 40, 72, 200, 576),
        "b7": (32, 48, 80, 224, 640),
    }
    for tag, chs in want.items():
        got = encoder_out_channels(f"efficientnet_{tag}", 3)
        assert got == (3, *chs), (tag, got)
    # depth scaling: b7 stage repeats are ceil(r * 3.1)
    _, stages = efficientnet_spec("b7")
    assert tuple(s[4] for s in stages) == (4, 7, 7, 10, 10, 13, 4)
    # stems: b0=32, b7=64 (timm conv_stem out)
    assert efficientnet_spec("b0")[0] == 32
    assert efficientnet_spec("b7")[0] == 64


def test_factory_name_surface():
    # tu- prefix and pretrained-tag suffixes resolve
    assert encoder_out_channels("tu-efficientnet_b0", 3)[1:] == \
        (16, 24, 40, 112, 320)
    assert encoder_out_channels("efficientnet_b4.ra2_in1k", 4)[0] == 4
    with pytest.raises(ValueError, match="efficientnet"):
        encoder_out_channels("efficientnet_b9", 3)
    with pytest.raises(ValueError, match="efficientnet"):
        encoder_out_channels("efficientnet_lite0", 3)


@pytest.mark.slow
def test_encoder_parity_vs_torch():
    torch.manual_seed(0)
    tenc = TEfficientNetEncoder(3, STEM, STAGES).eval()
    x = np.random.default_rng(0).normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = [f.numpy() for f in tenc(torch.from_numpy(x))]

    enc = EfficientNetEncoder(in_channels=3, stem_channels=STEM, stages=STAGES)
    variables = enc.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    sd = {k: v.detach().numpy().copy() for k, v in tenc.state_dict().items()}
    new_vars, report = convert_torch_state_dict(sd, dict(variables))
    assert not report["missing"], report["missing"][:8]
    assert not report["unused"], report["unused"][:8]
    assert not report["shape_mismatch"], report["shape_mismatch"][:8]

    feats = enc.apply(new_vars, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    assert len(feats) == len(want) == 6
    # efficientnet has a REAL stride-2 feature (no zero-channel dummy)
    assert feats[1].shape[-1] == STAGES[0][3]
    for got, w in zip(feats[1:], want[1:]):
        np.testing.assert_allclose(
            np.transpose(np.asarray(got), (0, 3, 1, 2)), w,
            atol=3e-5, rtol=3e-5)


@pytest.mark.slow
def test_efficientnet_unet_golden_vs_torch():
    """Full SmpModel('efficientnet_micro-unet') vs the torch container,
    through the converter — the real s2 skip feeds the Unet decoder."""
    torch.manual_seed(1)
    tmodel = TEfficientNetUnet(3, 7, STEM, STAGES).eval()
    x = np.random.default_rng(1).normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()

    model = SmpModel(arch="efficientnet_micro-unet", in_channels=3, classes=7)
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    sd = {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()}
    new_vars, report = convert_torch_state_dict(sd, dict(variables))
    assert not report["missing"], report["missing"][:8]
    assert not report["unused"], report["unused"][:8]
    assert not report["shape_mismatch"], report["shape_mismatch"][:8]

    got = np.transpose(
        np.asarray(model.apply(new_vars,
                               jnp.asarray(np.transpose(x, (0, 2, 3, 1))))),
        (0, 3, 1, 2))
    assert got.shape == want.shape == (1, 7, 64, 64)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-4)


@pytest.mark.slow
def test_flair_model_builds_with_efficientnet():
    from tests._fixtures import make_config
    from flair_for_aigle_tpu.models.flair_model import FlairHubModel

    cfg = make_config(arch="efficientnet_micro-unet", mono=("AERIAL_RGBI",),
                      tasks=(("TASK-A", 5),))
    model = FlairHubModel(config=cfg)
    batch = {
        "AERIAL_RGBI": jnp.zeros((1, 3, 64, 64), jnp.float32),
        "TASK-A": jnp.zeros((1, 5, 64, 64), jnp.float32),
    }
    variables = jax.jit(model.init)(jax.random.key(0), batch)
    logits, _ = model.apply(variables, batch)
    assert logits["TASK-A"].shape == (1, 5, 64, 64)
    sub = variables["params"]["encoders.AERIAL_RGBI.seg_model"]["model"]
    assert "conv_stem" in sub and "blocks.1.0" in sub
    assert "se" in sub["blocks.1.0"]


@pytest.mark.slow
def test_train_mode_updates_batch_stats():
    """BN running stats update under train=True (torch momentum semantics
    come from TorchBatchNorm; here just wire-level: mutable batch_stats)."""
    enc = EfficientNetEncoder(in_channels=3, stem_channels=STEM, stages=STAGES)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    variables = enc.init(jax.random.key(0), x)
    _, updated = enc.apply(variables, x, train=True, mutable=["batch_stats"])
    before = variables["batch_stats"]["bn1"]["mean"]
    after = updated["batch_stats"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
