"""U-Net++ (nested U-Net) decoder (smp ``UnetPlusPlusDecoder``), NHWC flax.

Fifth decoder on the monotemp surface
(/root/reference/flair_hub/models/monotemp_model.py:67-92 builds any smp
arch; smp names this one ``unetplusplus``). The decoder is a dense grid of
Unet decoder blocks ``x_{depth}_{layer}`` (torch ModuleDict keys,
mirrored 1:1 in the param tree as ``blocks.x_{d}_{l}``): along layer l,
block ``x_{d}_{l}`` upsamples its predecessor ``x_{d}_{l-1}`` (or the raw
feature at depth d when d == l) and concatenates every same-column deeper
output ``x_{d+1..l}_{l}`` plus the raw skip feature — the dense skip
pathways that distinguish U-Net++ from U-Net. Block internals are exactly
smp's DecoderBlock (nearest x2, concat, two Conv3x3+BN+ReLU), shared with
models/unet.py.

Channel bookkeeping reproduces smp: with reversed encoder channels
(deepest first, identity dropped) ``enc`` and decoder_channels ``dec``,
``in_channels = [enc[0], *dec[:-1]]``, ``skip_channels = [*enc[1:], 0]``;
block ``x_{d}_{l}`` (d > 0) has in ``skip[l-1]``, skip
``skip[l] * (l + 1 - d)``, out ``skip[l]``; row-0 blocks use
``in[l]``/``skip[l] * (l + 1)``/``dec[l]``; the final ``x_0_{depth}`` has
no skip. Zero-channel dummy features from transformer encoders simply
contribute 0 channels to the concats, as in smp.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from flair_for_aigle_tpu.models.unet import UnetDecoderBlock


class UnetPlusPlusDecoder(nn.Module):
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)

    @nn.compact
    def __call__(self, *features, train: bool = False):
        feats = list(features[1:])[::-1]  # drop identity, deepest first
        dec = list(self.decoder_channels)
        depth = len(dec) - 1

        def block(d, l, out_ch, x, skip):
            return UnetDecoderBlock(out_ch, name=f"blocks.x_{d}_{l}")(
                x, skip, train=train)

        dense: dict[str, jax.Array] = {}
        skip_ch = [f.shape[-1] for f in feats[1:]] + [0]
        for layer in range(depth):
            for d in range(depth - layer):
                li = d + layer
                if layer == 0:
                    # consumes raw features: x at depth d, skip one deeper
                    out_ch = dec[li] if d == 0 else skip_ch[li]
                    dense[f"x_{d}_{li}"] = block(
                        d, li, out_ch, feats[d], feats[d + 1])
                else:
                    cat = [dense[f"x_{i}_{li}"] for i in range(d + 1, li + 1)]
                    skip = jnp.concatenate(cat + [feats[li + 1]], axis=-1)
                    out_ch = dec[li] if d == 0 else skip_ch[li]
                    dense[f"x_{d}_{li}"] = block(
                        d, li, out_ch, dense[f"x_{d}_{li - 1}"], skip)
        return block(0, depth, dec[depth], dense[f"x_0_{depth - 1}"], None)
