"""Golden parity: flax Swin encoder vs torch reference (timm-1.x layout),
through the checkpoint converter."""

import pytest

import numpy as np
import torch
import jax
import jax.numpy as jnp

from flair_for_aigle_tpu.models.checkpoint import convert_torch_state_dict
from flair_for_aigle_tpu.models.swin import SwinTransformerEncoder

from tests.torch_refs import TSwinEncoder


@pytest.mark.slow
def test_swin_encoder_parity():
    torch.manual_seed(0)
    # small swin: embed 32, window 4, input 64 -> feats 16,8,4,2; stages with
    # both shifted (feat > window) and unshifted (feat <= window) blocks
    tenc = TSwinEncoder(in_channels=3, embed_dim=32, depths=(2, 2, 2, 2),
                        num_heads=(2, 4, 8, 16), ws=4).eval()
    x = np.random.default_rng(0).normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = [f.numpy() for f in tenc(torch.from_numpy(x))]

    enc = SwinTransformerEncoder(in_channels=3, embed_dim=32, depths=(2, 2, 2, 2),
                                 num_heads=(2, 4, 8, 16), window_size=4)
    variables = enc.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: v.detach().numpy().copy() for k, v in tenc.state_dict().items()}
    new_vars, report = convert_torch_state_dict(
        sd, {"params": variables["params"]}
    )
    assert not report["missing"], report["missing"][:5]
    assert not report["unused"], report["unused"][:5]
    assert not report["shape_mismatch"], report["shape_mismatch"]

    got = enc.apply(new_vars, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    assert enc.out_channels == (3, 0, 32, 64, 128, 256)
    assert len(got) == 6
    assert got[1].shape == (2, 32, 32, 0)
    for i, (w, g) in enumerate(zip(want, got)):
        np.testing.assert_allclose(
            np.transpose(w, (0, 2, 3, 1)), np.asarray(g), atol=2e-3,
            err_msg=f"feature {i}",
        )


def test_swin_shift_mask_applied():
    """Shifted-window masking must differ from unshifted attention."""
    enc = SwinTransformerEncoder(in_channels=3, embed_dim=16, depths=(2,),
                                 num_heads=(2,), window_size=4)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 32, 32, 3)),
                    jnp.float32)
    v = enc.init(jax.random.key(0), x)
    feats = enc.apply(v, x)
    assert feats[2].shape == (1, 8, 8, 16)


def test_swin_attn_bf16_close_to_f32():
    """attn_f32=False (opt-in speed knob) must track the f32-softmax path
    closely enough that per-pixel argmax decisions are stable away from ties;
    the params trees are identical so checkpoints load into either."""
    enc32 = SwinTransformerEncoder(in_channels=3, embed_dim=32,
                                   depths=(2, 2), num_heads=(2, 4),
                                   window_size=4)
    enc16 = SwinTransformerEncoder(in_channels=3, embed_dim=32,
                                   depths=(2, 2), num_heads=(2, 4),
                                   window_size=4, attn_f32=False)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 32, 32, 3)), jnp.float32
    )
    variables = enc32.init(jax.random.key(0), x)
    a = enc32.apply(variables, x.astype(jnp.bfloat16))[-1].astype(jnp.float32)
    b = enc16.apply(variables, x.astype(jnp.bfloat16))[-1].astype(jnp.float32)
    denom = np.maximum(np.abs(np.asarray(a)), 1e-3)
    rel = np.abs(np.asarray(a - b)) / denom
    assert np.median(rel) < 0.05, np.median(rel)
