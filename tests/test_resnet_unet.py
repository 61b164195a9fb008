"""Golden parity: flax ResNet34-UNet vs a torch reference, via the
checkpoint converter (validating numerics AND state-dict name mapping)."""

import numpy as np
import torch
import jax.numpy as jnp

from flair_for_aigle_tpu.models.checkpoint import (
    convert_torch_state_dict,
    export_torch_state_dict,
)
from flair_for_aigle_tpu.models.resnet import ResNetEncoder
from flair_for_aigle_tpu.models.unet import SegmentationHead, UnetDecoder

from tests.torch_refs import TResNet34Encoder, TUnetResNet34

import jax


def state_dict_np(module, prefix=""):
    return {prefix + k: v.detach().numpy().copy() for k, v in module.state_dict().items()}


def init_variables(model, *args):
    return model.init(jax.random.key(0), *args)


def split_vars(variables):
    return {"params": variables["params"],
            "batch_stats": variables.get("batch_stats", {})}


def test_resnet34_encoder_parity():
    torch.manual_seed(0)
    tenc = TResNet34Encoder(in_channels=4).eval()
    x = np.random.default_rng(0).normal(size=(2, 4, 64, 64)).astype(np.float32)
    want = [f.detach().numpy() for f in tenc(torch.from_numpy(x))]

    enc = ResNetEncoder(arch="resnet34", in_channels=4)
    variables = init_variables(enc, jnp.zeros((1, 64, 64, 4)))
    new_vars, report = convert_torch_state_dict(state_dict_np(tenc), split_vars(variables))
    assert not report["missing"], report["missing"][:5]
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]

    got = enc.apply(new_vars, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    assert len(got) == 6
    for w, g in zip(want, got):
        np.testing.assert_allclose(
            np.transpose(w, (0, 2, 3, 1)), np.asarray(g), atol=2e-3
        )


class FlaxUnetResNet34:
    """Test-side assembly matching smp naming (encoder/decoder/segmentation_head)."""

    def __init__(self, in_channels=3, classes=19):
        import flax.linen as nn

        class Model(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                feats = ResNetEncoder(arch="resnet34", in_channels=in_channels,
                                      name="encoder")(x, train=train)
                dec = UnetDecoder(name="decoder")(*feats, train=train)
                return SegmentationHead(classes, name="segmentation_head")(dec)

        self.module = Model()


def test_unet_resnet34_full_parity():
    torch.manual_seed(1)
    tmodel = TUnetResNet34(in_channels=3, classes=19).eval()
    x = np.random.default_rng(1).normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()

    fmodel = FlaxUnetResNet34(3, 19).module
    variables = fmodel.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    new_vars, report = convert_torch_state_dict(state_dict_np(tmodel), split_vars(variables))
    assert not report["missing"], report["missing"][:8]
    assert not report["unused"], report["unused"][:8]

    got = fmodel.apply(new_vars, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.transpose(want, (0, 2, 3, 1)), np.asarray(got), atol=5e-3
    )
    # round-trip export produces identical tensors
    sd = export_torch_state_dict({"params": new_vars["params"],
                                  "batch_stats": new_vars["batch_stats"]})
    ref_sd = state_dict_np(tmodel)
    for k, v in ref_sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_allclose(v, sd[k], atol=1e-6, err_msg=k)
