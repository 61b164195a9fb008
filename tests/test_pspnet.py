"""PSPNet decoder (smp layout, encoder_depth=3): golden parity vs the torch
oracle through the checkpoint converter. Reference surface:
``smp.create_model(arch=...)`` accepts 'pspnet'
(/root/reference/flair_hub/models/monotemp_model.py:67-92)."""

import numpy as np
import torch
import pytest
import jax
import jax.numpy as jnp

from flair_for_aigle_tpu.models.checkpoint import convert_torch_state_dict
from flair_for_aigle_tpu.models.monotemp import SmpModel
from flair_for_aigle_tpu.models.pspnet import adaptive_avg_pool_nhwc

from tests.torch_refs import TResNet34PSPNet


def test_adaptive_avg_pool_matches_torch():
    """Overlapping-bin semantics for non-divisible sizes (8 -> 3, 6)."""
    x = np.random.default_rng(0).normal(size=(2, 16, 8, 8)).astype(np.float32)
    for s in (1, 2, 3, 6):
        want = torch.nn.functional.adaptive_avg_pool2d(
            torch.from_numpy(x), (s, s)).numpy()
        got = np.transpose(
            np.asarray(adaptive_avg_pool_nhwc(
                jnp.asarray(np.transpose(x, (0, 2, 3, 1))), s, s)),
            (0, 3, 1, 2))
        np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


def test_resnet34_pspnet_golden_vs_torch():
    torch.manual_seed(0)
    tmodel = TResNet34PSPNet(3, classes=7).eval()
    x = np.random.default_rng(0).normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()

    model = SmpModel(arch="resnet34-pspnet", in_channels=3, classes=7)
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


def test_pspnet_encoder_state_dict_lacks_deep_layers():
    """encoder_depth=3 truncation: no layer3/layer4 params exist, matching
    smp's PSPNet state dict."""
    model = SmpModel(arch="resnet34-pspnet", in_channels=3, classes=7)
    v = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    keys = jax.tree_util.tree_leaves_with_path(v["params"])
    names = {".".join(str(getattr(p, "key", p)) for p in path)
             for path, _ in keys}
    assert not any("layer3" in n or "layer4" in n for n in names)


def test_pspnet_rejects_transformer_encoders():
    """smp PSPNet needs encoder_depth=3; our timm encoders document the
    unsupported-depth contract with a clear error."""
    model = SmpModel(arch="swin_micro_patch4_window4_64-pspnet",
                     in_channels=3, classes=5)
    with pytest.raises(ValueError, match="encoder_depth"):
        model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
