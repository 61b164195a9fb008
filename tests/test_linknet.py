"""LinkNet decoder (smp layout): golden parity vs the torch oracle through
the checkpoint converter. Reference surface: ``smp.create_model(arch=...)``
accepts 'linknet' (/root/reference/flair_hub/models/monotemp_model.py:67-92).
"""

import pytest

import numpy as np
import torch
import jax
import jax.numpy as jnp

from flair_for_aigle_tpu.models.checkpoint import convert_torch_state_dict
from flair_for_aigle_tpu.models.linknet import LINKNET_TRANSPOSE_CONV_PATTERNS
from flair_for_aigle_tpu.models.monotemp import SmpModel

from tests.torch_refs import TResNet34Linknet


def test_resnet34_linknet_golden_vs_torch():
    torch.manual_seed(0)
    tmodel = TResNet34Linknet(3, classes=7).eval()
    x = np.random.default_rng(0).normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()

    model = SmpModel(arch="resnet34-linknet", in_channels=3, classes=7)
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    sd = {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()}
    new_vars, report = convert_torch_state_dict(
        sd, dict(variables),
        transpose_conv_prefixes=LINKNET_TRANSPOSE_CONV_PATTERNS)
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
def test_linknet_attaches_to_efficientnet():
    """Conv pyramids (identity + 5 strided features) drive all 5 blocks to
    full resolution; the residual skip-add needs exact channel matches."""
    model = SmpModel(arch="efficientnet_micro-linknet", in_channels=3,
                     classes=5)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = jax.jit(model.init)(jax.random.key(0), x)
    y = model.apply(v, x)
    assert y.shape == (1, 64, 64, 5), y.shape


def test_flair_model_builds_with_linknet():
    from tests._fixtures import make_config
    from flair_for_aigle_tpu.models.flair_model import FlairHubModel

    cfg = make_config(arch="resnet18-linknet", mono=("AERIAL_RGBI",),
                      tasks=(("TASK-A", 4),))
    model = FlairHubModel(config=cfg)
    batch = {
        "AERIAL_RGBI": jnp.zeros((1, 3, 64, 64), jnp.float32),
        "TASK-A": jnp.zeros((1, 4, 64, 64), jnp.float32),
    }
    v = jax.jit(model.init)(jax.random.key(0), batch)
    logits, _ = model.apply(v, batch)
    assert logits["TASK-A"].shape == (1, 4, 64, 64)
