"""Parity at a non-window-divisible resolution (the production case:
512 px input -> 128 px features with window 12)."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from flair_for_aigle_tpu.models.checkpoint import convert_torch_state_dict
from flair_for_aigle_tpu.models.swin import SwinTransformerEncoder
from tests.torch_refs import TSwinEncoder


def test_swin_parity_nondivisible_windows():
    torch.manual_seed(3)
    # input 80 -> feats 20,10,5,3(ceil); window 4 doesn't divide 20/10/5
    tenc = TSwinEncoder(in_channels=3, embed_dim=16, depths=(2, 2, 2),
                        num_heads=(2, 2, 4), ws=4).eval()
    x = np.random.default_rng(5).normal(size=(1, 3, 80, 80)).astype(np.float32)
    with torch.no_grad():
        want = [f.numpy() for f in tenc(torch.from_numpy(x))]

    enc = SwinTransformerEncoder(in_channels=3, embed_dim=16, depths=(2, 2, 2),
                                 num_heads=(2, 2, 4), window_size=4)
    variables = enc.init(jax.random.key(0), jnp.zeros((1, 80, 80, 3)))
    sd = {k: v.detach().numpy().copy() for k, v in tenc.state_dict().items()}
    new_vars, report = convert_torch_state_dict(sd, {"params": variables["params"]})
    assert not report["missing"] and not report["unused"]

    got = enc.apply(new_vars, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    for i, (w, g) in enumerate(zip(want, got)):
        np.testing.assert_allclose(
            np.transpose(w, (0, 2, 3, 1)), np.asarray(g), atol=2e-3,
            err_msg=f"feature {i}",
        )
