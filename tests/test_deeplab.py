"""DeepLabV3+ decoder (smp layout) + dilated resnet: golden parity vs the
torch oracle through the checkpoint converter. Reference surface:
``smp.create_model(arch='deeplabv3plus')``
(/root/reference/flair_hub/models/monotemp_model.py:67-92)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from flair_for_aigle_tpu.models.checkpoint import convert_torch_state_dict
from flair_for_aigle_tpu.models.monotemp import SmpModel, make_encoder
from flair_for_aigle_tpu.models.resnet import ResNetEncoder

from tests.torch_refs import TResNet34DeepLab


def test_dilated_resnet_feature_geometry():
    """output_stride=16 keeps layer4 at the layer3 resolution; params are
    byte-identical in shape to the stride-32 encoder (same checkpoints)."""
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    enc32 = ResNetEncoder(arch="resnet18", output_stride=32)
    enc16 = ResNetEncoder(arch="resnet18", output_stride=16)
    v32 = enc32.init(jax.random.key(0), x)
    v16 = enc16.init(jax.random.key(0), x)
    f32_ = enc32.apply(v32, x)
    f16 = enc16.apply(v16, x)
    assert f32_[-1].shape == (1, 2, 2, 512)
    assert f16[-1].shape == (1, 4, 4, 512)  # stride 16
    assert f16[-2].shape == f32_[-2].shape  # layer3 untouched
    s32 = jax.tree_util.tree_map(lambda a: a.shape, v32)
    s16 = jax.tree_util.tree_map(lambda a: a.shape, v16)
    assert s32 == s16


@pytest.mark.slow
def test_resnet34_deeplab_golden_vs_torch():
    torch.manual_seed(0)
    tmodel = TResNet34DeepLab(3, classes=6).eval()
    x = np.random.default_rng(0).normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()

    model = SmpModel(arch="resnet34-deeplabv3plus", in_channels=3, classes=6)
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
    assert got.shape == want.shape == (1, 6, 64, 64)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-4)


def test_deeplab_requires_dilatable_encoder():
    """smp raises for encoders without make_dilated; so do we."""
    with pytest.raises(ValueError, match="dilated"):
        make_encoder("convnext_micro", 3, name="encoder", output_stride=16)
    model = SmpModel(arch="swin_micro_patch4_window4_64-deeplabv3plus",
                     in_channels=3, classes=2)
    with pytest.raises(ValueError, match="dilated"):
        model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))


def test_resnet34_deeplabv3_golden_vs_torch():
    """Plain DeepLabV3: stride-8 encoder, non-separable ASPP, x8 head.
    Reference surface: smp.create_model accepts 'deeplabv3'
    (/root/reference/flair_hub/models/monotemp_model.py:67-92)."""
    import torch
    import numpy as np
    import jax
    import jax.numpy as jnp
    from flair_for_aigle_tpu.models.checkpoint import convert_torch_state_dict
    from flair_for_aigle_tpu.models.monotemp import SmpModel
    from tests.torch_refs import TResNet34DeepLabV3

    torch.manual_seed(0)
    tmodel = TResNet34DeepLabV3(3, classes=6).eval()
    x = np.random.default_rng(0).normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()

    model = SmpModel(arch="resnet34-deeplabv3", in_channels=3, classes=6)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 32, 32, 3)))
    sd = {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()}
    new_vars, report = convert_torch_state_dict(sd, dict(variables))
    assert not report["missing"], report["missing"][:8]
    assert not report["unused"], report["unused"][:8]
    assert not report["shape_mismatch"], report["shape_mismatch"][:8]

    got = np.transpose(
        np.asarray(model.apply(new_vars,
                               jnp.asarray(np.transpose(x, (0, 2, 3, 1))))),
        (0, 3, 1, 2))
    assert got.shape == want.shape == (1, 6, 64, 64)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-4)
