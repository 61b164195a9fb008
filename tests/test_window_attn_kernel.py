"""Fused Pallas window attention vs the XLA lowering (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flair_for_aigle_tpu.models.swin import (
    WindowAttention,
    _shift_attn_mask,
)
from flair_for_aigle_tpu.ops.pallas.window_attn import shift_mask_bank


def test_shift_mask_bank_matches_full_mask():
    # any padded grid: per-window mask rows must equal the banked pattern
    for (h, w, ws, ss) in [(12, 12, 4, 2), (24, 36, 12, 6), (8, 16, 4, 2)]:
        full = _shift_attn_mask(h, w, ws, ss)  # (nW, T, T)
        bank = shift_mask_bank(ws, ss)
        nwh, nww = h // ws, w // ws
        for wi in range(nwh):
            for wj in range(nww):
                p = (wi == nwh - 1) * 2 + (wj == nww - 1)
                np.testing.assert_array_equal(full[wi * nww + wj], bank[p])


@pytest.mark.parametrize("shift", [0, 2])
def test_fused_window_attention_matches_xla(shift):
    b, hp, wp, c, nh, ws = 2, 8, 12, 128, 4, 4
    y = jnp.asarray(
        np.random.default_rng(0).normal(size=(b, hp, wp, c)), jnp.float32
    )
    kw = dict(dim=c, num_heads=nh, table_window=ws, window_size=(ws, ws),
              shift_size=shift)
    ref = WindowAttention(kernel_mode="off", **kw)
    ker = WindowAttention(kernel_mode="on", **kw)
    variables = ref.init(jax.random.key(1), y)
    want = ref.apply(variables, y)
    got = ker.apply(variables, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_window_attention_bf16_close():
    b, hp, wp, c, nh, ws = 1, 8, 8, 128, 4, 4
    y32 = jnp.asarray(
        np.random.default_rng(2).normal(size=(b, hp, wp, c)), jnp.float32
    )
    kw = dict(dim=c, num_heads=nh, table_window=ws, window_size=(ws, ws),
              shift_size=2)
    ref = WindowAttention(kernel_mode="off", **kw)
    ker = WindowAttention(kernel_mode="on", **kw)
    variables = ref.init(jax.random.key(1), y32)
    want = ref.apply(variables, y32)
    got = ker.apply(variables, y32.astype(jnp.bfloat16)).astype(jnp.float32)
    # bf16 activations: tolerance is dominated by input rounding
    err = np.abs(np.asarray(got) - np.asarray(want))
    denom = np.maximum(np.abs(np.asarray(want)), 1e-2)
    assert np.median(err / denom) < 0.02
