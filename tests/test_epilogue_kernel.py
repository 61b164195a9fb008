"""Fused upsample-crop-convert epilogue vs the XLA reference math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flair_for_aigle_tpu.models.upernet import resize_bilinear_align_corners
from flair_for_aigle_tpu.ops.pallas.epilogue import upsample_crop_convert


def _reference(lgs4, margin, output_type):
    # unfused path: NCHW -> NHWC, x4 align-corners bilinear, crop, convert
    nhwc = jnp.transpose(lgs4, (0, 2, 3, 1)).astype(jnp.float32)
    up = resize_bilinear_align_corners(
        nhwc, nhwc.shape[1] * 4, nhwc.shape[2] * 4
    )
    lg = jnp.transpose(up, (0, 3, 1, 2))
    size = lg.shape[-1]
    lg = lg[:, :, margin:size - margin, margin:size - margin]
    if output_type == "argmax":
        return jnp.argmax(lg, axis=1).astype(jnp.uint8)[:, None]
    probs = jax.nn.softmax(lg, axis=1)
    return jnp.round(probs * 255).astype(jnp.uint8)


@pytest.mark.parametrize("output_type", ["argmax", "class_prob"])
def test_upsample_crop_convert_matches_reference(output_type):
    b, k, h4, margin = 2, 7, 16, 8
    lgs4 = jnp.asarray(
        np.random.default_rng(0).normal(size=(b, k, h4, h4)) * 3, jnp.float32
    )
    want = np.asarray(_reference(lgs4, margin, output_type))
    got = np.asarray(upsample_crop_convert(
        lgs4, margin=margin, scale=4, output_type=output_type,
    ))
    assert got.shape == want.shape == (b, 1 if output_type == "argmax" else k,
                                       h4 * 4 - 2 * margin, h4 * 4 - 2 * margin)
    if output_type == "argmax":
        # fp association differs (matmul interp vs lerp): allow rare
        # near-tie flips only
        agree = (got == want).mean()
        assert agree > 0.999, agree
    else:
        # quantized probabilities: at most one uint8 step apart
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_upsample_crop_convert_bf16_inputs():
    b, k, h4, margin = 1, 5, 8, 4
    lgs4 = jnp.asarray(
        np.random.default_rng(1).normal(size=(b, k, h4, h4)) * 3, jnp.bfloat16
    )
    want = np.asarray(_reference(lgs4.astype(jnp.float32), margin, "argmax"))
    got = np.asarray(upsample_crop_convert(lgs4, margin=margin, scale=4,
                                           output_type="argmax"))
    assert (got == want).mean() > 0.99
