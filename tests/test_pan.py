"""PAN decoder (smp layout): golden parity vs the torch oracle through the
checkpoint converter. Reference surface: ``smp.create_model(arch=...)``
accepts 'pan' (FPA needs a >=8px bottleneck, so 128px input) (/root/reference/flair_hub/models/monotemp_model.py:67-92)."""

import pytest

import numpy as np
import torch
import jax
import jax.numpy as jnp

from flair_for_aigle_tpu.models.checkpoint import convert_torch_state_dict
from flair_for_aigle_tpu.models.monotemp import SmpModel

from tests.torch_refs import TResNet34PAN


@pytest.mark.slow
def test_resnet34_pan_golden_vs_torch():
    torch.manual_seed(0)
    tmodel = TResNet34PAN(3, classes=7).eval()
    x = np.random.default_rng(0).normal(size=(1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()

    model = SmpModel(arch="resnet34-pan", in_channels=3, classes=7)
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 128, 128, 3)))
    sd = {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()}
    new_vars, report = convert_torch_state_dict(sd, dict(variables))
    assert not report["missing"], report["missing"][:8]
    assert not report["unused"], report["unused"][:8]
    assert not report["shape_mismatch"], report["shape_mismatch"][:8]

    got = np.transpose(
        np.asarray(model.apply(new_vars,
                               jnp.asarray(np.transpose(x, (0, 2, 3, 1))))),
        (0, 3, 1, 2))
    assert got.shape == want.shape == (1, 7, 128, 128)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-4)
