import pytest

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from flair_for_aigle_tpu.models.monotemp import SmpModel
from flair_for_aigle_tpu.models.upernet import resize_bilinear_align_corners


def test_align_corners_resize_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 6, 6, 3)).astype(np.float32)
    for out in [(12, 12), (24, 24), (5, 7), (1, 4)]:
        got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), *out))
        want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=out,
                             mode="bilinear", align_corners=True
                             ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=str(out))


@pytest.mark.slow
def test_swin_upernet_end_to_end_shapes():
    """Flagship arch assembly (small config): full-res logits out."""
    model = SmpModel(arch="swin_base_patch4_window12_384-upernet",
                     in_channels=3, classes=19)
    # swap to a small swin for CPU test speed via the tiny spec
    model = SmpModel(arch="swin_tiny_patch4_window7_224-upernet",
                     in_channels=3, classes=19)
    x = jnp.zeros((1, 56, 56, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 56, 56, 19)
    # param tree uses smp-style keys
    p = variables["params"]
    assert "encoder" in p and "decoder" in p and "segmentation_head" in p
    assert "model" in p["encoder"]  # timm wrapper level
    assert "patch_embed.proj" in p["encoder"]["model"]
    assert "psp" in p["decoder"] and "fpn_bottleneck" in p["decoder"]


def test_resnet_unet_smp_model_shapes():
    model = SmpModel(arch="resnet34-unet", in_channels=5, classes=15)
    x = jnp.zeros((2, 64, 64, 5), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 64, 64, 15)
    p = variables["params"]
    assert "conv1" in p["encoder"]  # resnet keys flat under encoder
