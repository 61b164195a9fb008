"""The round-5 scatter-free rewrites are NUMERICS-PRESERVING: each new
form (matmul align-corners bilinear, repeat-based integer nearest, dense
one-hot CE pick) must match its original gather-based formulation
exactly / to f32 rounding. The originals are re-implemented here as
oracles. (The speed rationale: gather backward = TPU scatter-add,
measured pathological — see ops/resize.py and train/losses.py.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flair_for_aigle_tpu.ops.resize import (
    _torch_nearest_index,
    resize_bilinear_ac_nhwc,
    resize_nearest_nhwc,
)
from flair_for_aigle_tpu.train.losses import weighted_cross_entropy


def _gather_bilinear_ac(x, out_h, out_w):
    """The original gather+lerp align_corners=True form (oracle)."""
    h, w = x.shape[-3], x.shape[-2]

    def weights(in_size, out_size):
        if out_size == 1:
            src = np.zeros(1)
        else:
            src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, in_size - 1)
        return lo, hi, (src - lo).astype(np.float32)

    lo_h, hi_h, wh = weights(h, out_h)
    lo_w, hi_w, ww = weights(w, out_w)
    xf = np.asarray(x, np.float32)
    top = np.take(xf, lo_h, axis=-3)
    bot = np.take(xf, hi_h, axis=-3)
    rows = top * (1 - wh)[:, None, None] + bot * wh[:, None, None]
    left = np.take(rows, lo_w, axis=-2)
    right = np.take(rows, hi_w, axis=-2)
    return left * (1 - ww)[:, None] + right * ww[:, None]


@pytest.mark.parametrize("hw,out", [((4, 4), (16, 16)), ((5, 7), (13, 9)),
                                    ((3, 3), (1, 5)), ((1, 2), (4, 4))])
def test_bilinear_ac_matmul_matches_gather_form(hw, out):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, *hw, 3)), jnp.float32)
    got = np.asarray(resize_bilinear_ac_nhwc(x, *out), np.float32)
    want = _gather_bilinear_ac(x, *out)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("hw,out", [((4, 4), (8, 8)), ((3, 5), (12, 10)),
                                    ((2, 2), (2, 6))])
def test_nearest_repeat_path_matches_index_map(hw, out):
    # integer factors take the repeat fast path; it must equal the torch
    # index map the general path uses
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, 255, size=(2, *hw, 4)), jnp.uint8)
    got = np.asarray(resize_nearest_nhwc(x, *out))
    want = np.take(np.take(np.asarray(x),
                           _torch_nearest_index(hw[0], out[0]), axis=-3),
                   _torch_nearest_index(hw[1], out[1]), axis=-2)
    np.testing.assert_array_equal(got, want)


def test_weighted_ce_matches_logsoftmax_gather_form():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(size=(2, 7, 6, 6)) * 3, jnp.float32)
    targets = jnp.asarray(rng.integers(0, 7, (2, 6, 6)), jnp.int32)
    weights = jnp.asarray(rng.uniform(0.2, 2.0, 7), jnp.float32)

    got = float(weighted_cross_entropy(logits, targets, weights))
    logp = jax.nn.log_softmax(np.asarray(logits, np.float32), axis=1)
    nll = -np.take_along_axis(np.asarray(logp), np.asarray(targets)[:, None],
                              axis=1)[:, 0]
    w = np.asarray(weights)[np.asarray(targets)]
    want = float(np.sum(w * nll) / np.sum(w))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_weighted_ce_gradient_is_softmax_minus_onehot():
    # the whole point of the rewrite: the backward is dense
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(1, 4, 2, 2)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 4, (1, 2, 2)), jnp.int32)
    w = jnp.ones((4,), jnp.float32)
    g = jax.grad(lambda lg: weighted_cross_entropy(lg, targets, w))(logits)
    g = np.asarray(g)
    sm = np.asarray(jax.nn.softmax(logits, axis=1))
    onehot = np.eye(4, dtype=np.float32)[np.asarray(targets)]
    onehot = np.transpose(onehot, (0, 3, 1, 2))
    want = (sm - onehot) / targets.size
    np.testing.assert_allclose(g, want, rtol=1e-5, atol=1e-6)