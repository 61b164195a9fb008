"""Golden parity: flax U-TAE vs torch reference (with temporal padding)."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from flair_for_aigle_tpu.models.checkpoint import convert_torch_state_dict
from flair_for_aigle_tpu.models.utae import (
    UTAE,
    UTAE_TRANSPOSE_CONV_PATTERNS,
    positional_encoding,
    temporal_pad_mask,
)
from tests.torch_refs import TUTAE, TPositionalEncoder

CFG = dict(
    input_dim=4,
    encoder_widths=(16, 16, 32),
    decoder_widths=(8, 16, 32),
    out_conv=(8, 7),
    str_conv_k=4, str_conv_s=2, str_conv_p=1,
    agg_mode="att_group", encoder_norm="group",
    n_head=4, d_model=32, d_k=4, pad_value=0,
    padding_mode="reflect",
)


def make_inputs(pad_frames=2):
    rng = np.random.default_rng(0)
    b, t, c, h, w = 2, 6, 4, 16, 16
    x = rng.normal(size=(b, t, c, h, w)).astype(np.float32)
    if pad_frames:
        x[:, -pad_frames:] = 0.0  # padded dates (pad_value=0)
    dates = np.sort(rng.integers(-180, 180, size=(b, t))).astype(np.float32)
    return x, dates


def test_positional_encoding_matches_torch():
    rng = np.random.default_rng(1)
    bp = rng.integers(-200, 200, size=(3, 9)).astype(np.float32)
    penc = TPositionalEncoder(16, T=1000, repeat=4)
    want = penc(torch.from_numpy(bp)).numpy()
    got = np.asarray(positional_encoding(jnp.asarray(bp), 16, 1000, repeat=4))
    np.testing.assert_allclose(want, got, atol=1e-4)


def test_utae_parity_with_padding():
    torch.manual_seed(0)
    tmodel = TUTAE(**CFG).eval()
    x, dates = make_inputs(pad_frames=2)
    with torch.no_grad():
        want_out, want_maps = tmodel(torch.from_numpy(x), torch.from_numpy(dates))

    model = UTAE(**{**CFG, "return_maps": True})
    x_nhwc = np.transpose(x, (0, 1, 3, 4, 2))
    variables = model.init(jax.random.key(0), jnp.asarray(x_nhwc), jnp.asarray(dates))
    sd = {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()}
    new_vars, report = convert_torch_state_dict(
        sd, {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        transpose_conv_prefixes=UTAE_TRANSPOSE_CONV_PATTERNS,
    )
    assert not report["missing"], report["missing"][:8]
    assert not report["unused"], report["unused"][:8]
    assert not report["shape_mismatch"], report["shape_mismatch"][:4]

    out, maps = model.apply(new_vars, jnp.asarray(x_nhwc), jnp.asarray(dates))
    np.testing.assert_allclose(
        np.transpose(want_out.numpy(), (0, 2, 3, 1)), np.asarray(out), atol=5e-3
    )
    assert len(maps) == len(want_maps)
    for i, (w, g) in enumerate(zip(want_maps, maps)):
        np.testing.assert_allclose(
            np.transpose(w.numpy(), (0, 2, 3, 1)), np.asarray(g), atol=5e-3,
            err_msg=f"map {i}",
        )


def test_pad_mask():
    x, _ = make_inputs(pad_frames=3)
    mask = temporal_pad_mask(jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2))), 0.0)
    want = (x == 0).all(axis=(2, 3, 4))
    np.testing.assert_array_equal(np.asarray(mask), want)
