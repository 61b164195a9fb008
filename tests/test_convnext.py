"""ConvNeXt encoder family (VERDICT round-3 ask #6): parity vs the torch
oracle through the checkpoint converter, factory wiring, decoder attach.
Matches the reference's open ``tu-<timm>`` surface
(/root/reference/flair_hub/models/monotemp_model.py:67-92) for a non-swin
non-resnet family."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from flair_for_aigle_tpu.models.checkpoint import convert_torch_state_dict
from flair_for_aigle_tpu.models.convnext import ConvNeXtEncoder
from flair_for_aigle_tpu.models.monotemp import (
    SmpModel,
    encoder_out_channels,
    make_encoder,
)

from tests.torch_refs import TConvNeXtEncoder, TConvNeXtUPerNet

DIMS, DEPTHS = (16, 32, 64, 128), (1, 1, 1, 1)  # 'micro' test scale


def test_out_channels_and_factory_names():
    assert encoder_out_channels("convnext_tiny", 3) == (3, 0, 96, 192, 384, 768)
    assert encoder_out_channels("convnext_base", 4) == (4, 0, 128, 256, 512, 1024)
    # tu- prefix and timm pretrained-tag suffixes resolve too
    assert encoder_out_channels("tu-convnext_large", 3)[2:] == (192, 384, 768, 1536)
    assert encoder_out_channels("convnext_small.fb_in22k", 3)[2:] == (96, 192, 384, 768)
    with pytest.raises(ValueError, match="convnext"):
        encoder_out_channels("convnext_gigantic", 3)


def test_encoder_parity_vs_torch():
    torch.manual_seed(0)
    tenc = TConvNeXtEncoder(3, DIMS, DEPTHS).eval()
    x = np.random.default_rng(0).normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = [f.numpy() for f in tenc(torch.from_numpy(x))]

    enc = ConvNeXtEncoder(in_channels=3, dims=DIMS, depths=DEPTHS)
    variables = enc.init(jax.random.key(0),
                         jnp.zeros((1, 32, 32, 3)))
    sd = {k: v.detach().numpy().copy() for k, v in tenc.state_dict().items()}
    new_vars, report = convert_torch_state_dict(sd, dict(variables))
    assert not report["missing"], report["missing"][:8]
    assert not report["unused"], report["unused"][:8]
    assert not report["shape_mismatch"], report["shape_mismatch"][:8]

    feats = enc.apply(new_vars, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    assert len(feats) == len(want) == 6
    for got, w in zip(feats[2:], want[2:]):
        np.testing.assert_allclose(
            np.transpose(np.asarray(got), (0, 3, 1, 2)), w,
            atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_convnext_upernet_golden_vs_torch():
    """Full SmpModel('convnext_micro-upernet') vs the torch container,
    through the converter — the decoder attaches and numerics hold."""
    torch.manual_seed(1)
    tmodel = TConvNeXtUPerNet(3, classes=7, dims=DIMS, depths=DEPTHS).eval()
    x = np.random.default_rng(1).normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()

    model = SmpModel(arch="convnext_micro-upernet", in_channels=3, classes=7)
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
def test_flair_model_builds_with_convnext():
    """The monotemp factory + FlairHubModel attach convnext end-to-end."""
    from tests._fixtures import make_config
    from flair_for_aigle_tpu.models.flair_model import FlairHubModel

    cfg = make_config(arch="convnext_micro-upernet", mono=("AERIAL_RGBI",),
                      tasks=(("TASK-A", 5),))
    model = FlairHubModel(config=cfg)
    batch = {
        "AERIAL_RGBI": jnp.zeros((1, 3, 64, 64), jnp.float32),
        "TASK-A": jnp.zeros((1, 5, 64, 64), jnp.float32),
    }
    variables = jax.jit(model.init)(jax.random.key(0), batch)
    logits, _ = model.apply(variables, batch)
    assert logits["TASK-A"].shape == (1, 5, 64, 64)
    # param paths mirror the torch state-dict convention
    assert "encoders.AERIAL_RGBI.seg_model" in variables["params"]
    sub = variables["params"]["encoders.AERIAL_RGBI.seg_model"]["model"]
    assert "stem.0" in sub and "stages.1.downsample.1" in sub
