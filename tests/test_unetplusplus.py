"""U-Net++ decoder (smp unetplusplus): golden parity vs the torch oracle
through the checkpoint converter; transformer-encoder attach. Reference
surface: ``smp.create_model(arch='unetplusplus')``
(/root/reference/flair_hub/models/monotemp_model.py:67-92)."""

import pytest

import numpy as np
import torch
import jax
import jax.numpy as jnp

from flair_for_aigle_tpu.models.checkpoint import convert_torch_state_dict
from flair_for_aigle_tpu.models.monotemp import SmpModel

from tests.torch_refs import TResNet34UnetPlusPlus


@pytest.mark.slow
def test_resnet34_unetplusplus_golden_vs_torch():
    torch.manual_seed(0)
    tmodel = TResNet34UnetPlusPlus(3, classes=6).eval()
    x = np.random.default_rng(0).normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()

    model = SmpModel(arch="resnet34-unetplusplus", in_channels=3, classes=6)
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


@pytest.mark.slow
def test_unetplusplus_attaches_to_transformer_encoders():
    """Zero-channel dummy skips contribute 0 channels to the dense concats
    (smp behavior); output is full resolution."""
    for arch in ("convnext_micro-unetplusplus",
                 "efficientnet_micro-unetplusplus"):
        model = SmpModel(arch=arch, in_channels=3, classes=5)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        v = jax.jit(model.init)(jax.random.key(0), x)
        y = model.apply(v, x)
        assert y.shape == (1, 64, 64, 5), (arch, y.shape)
