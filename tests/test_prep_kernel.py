"""Parity: fused LN+shift+pad+partition prep kernel vs the XLA glue.

Runs the Pallas kernel in interpret mode on CPU against the exact
models/swin.py lowering (TorchLayerNorm + roll + pad + window_partition)
for shifted/unshifted and padded/unpadded geometries, plus the VJP
(recompute backward) against XLA autodiff.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flair_for_aigle_tpu.ops.pallas.prep import (
    _xla_forward,
    fused_ln_shift_partition,
    supports,
)

KEY = jax.random.PRNGKey(0)


def _mk(b, h, w, c, dtype=jnp.float32):
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.standard_normal((b, h, w, c), np.float32), dtype)
    s = jnp.asarray(rng.standard_normal((c,), np.float32) * 0.2 + 1.0)
    bi = jnp.asarray(rng.standard_normal((c,), np.float32) * 0.1)
    return x, s, bi


@pytest.mark.parametrize("h,w,ws,ss", [
    (24, 24, 12, 0),    # exact multiple, no shift
    (24, 24, 12, 6),    # exact multiple, shifted
    (20, 20, 12, 6),    # pad 20 -> 24, shifted
    (32, 32, 12, 0),    # pad 32 -> 36 (stage-3 geometry, small batch)
    (32, 32, 12, 6),
])
def test_prep_matches_xla(h, w, ws, ss):
    x, s, b = _mk(2, h, w, 128)
    got = fused_ln_shift_partition(x, s, b, ws=ws, ss=ss, interpret=True)
    want = _xla_forward(x, s, b, ws=ws, ss=ss, eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_prep_matches_swin_glue():
    """Against the production SwinBlock glue ops directly."""
    from flair_for_aigle_tpu.models.layers import TorchLayerNorm
    from flair_for_aigle_tpu.models.swin import window_partition

    h = w = 20
    ws, ss = 12, 6
    x, s, b = _mk(1, h, w, 128)
    ln = TorchLayerNorm()
    vars_ = {"params": {"scale": s, "bias": b}}
    y = ln.apply(vars_, x)
    y = jnp.roll(y, (-ss, -ss), axis=(1, 2))
    y = jnp.pad(y, ((0, 0), (0, 4), (0, 4), (0, 0)))
    want = window_partition(y, ws)
    got = fused_ln_shift_partition(x, s, b, ws=ws, ss=ss, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_prep_bf16_parity():
    x, s, b = _mk(2, 24, 24, 128, jnp.bfloat16)
    got = fused_ln_shift_partition(x, s, b, ws=12, ss=6, interpret=True)
    want = _xla_forward(x, s, b, ws=12, ss=6, eps=1e-5)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(got.astype(jnp.float32)),
                                  np.asarray(want.astype(jnp.float32)))


def test_prep_vjp_matches_xla_grad():
    x, s, b = _mk(1, 24, 24, 128)

    def f_kernel(x, s, b):
        o = fused_ln_shift_partition(x, s, b, ws=12, ss=6, interpret=True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def f_ref(x, s, b):
        o = _xla_forward(x, s, b, ws=12, ss=6, eps=1e-5)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    gk = jax.grad(f_kernel, argnums=(0, 1, 2))(x, s, b)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, s, b)
    for a, e in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-5, atol=1e-5)


def test_supports_gate():
    assert supports(32, 32, 512, 12)
    assert supports(128, 128, 128, 12)
    assert not supports(32, 32, 100, 12)   # lanes
    assert not supports(32, 30, 512, 12)   # sublane width


@pytest.mark.parametrize("h,w,shift", [(8, 8, False), (16, 16, True),
                                        (20, 20, True)])
def test_swin_block_kernel_on_off_parity(h, w, shift, monkeypatch):
    """Full SwinBlock: prep + attention + FFN kernels (interpret) vs the
    pure-XLA lowering, same params."""
    monkeypatch.setenv("FLAIR_SWIN_PREP", "1")
    from flair_for_aigle_tpu.models.swin import SwinBlock

    c, nh, ws = 128, 4, 4
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, h, w, c), np.float32))
    kw = dict(dim=c, num_heads=nh, window_size=ws, shift=shift)
    ref = SwinBlock(kernel_mode="off", **kw)
    ker = SwinBlock(kernel_mode="on", **kw)
    variables = ref.init(KEY, x)
    want = ref.apply(variables, x)
    got = ker.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.slow
def test_swin_block_kernel_grad_parity(monkeypatch):
    monkeypatch.setenv("FLAIR_SWIN_PREP", "1")
    from flair_for_aigle_tpu.models.swin import SwinBlock

    c, nh, ws = 128, 4, 4
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, c), np.float32))
    kw = dict(dim=c, num_heads=nh, window_size=ws, shift=True)
    ref = SwinBlock(kernel_mode="off", **kw)
    ker = SwinBlock(kernel_mode="on", **kw)
    variables = ref.init(KEY, x)

    def loss(m):
        def f(xx):
            return jnp.sum(m.apply(variables, xx) ** 2)
        return jax.grad(f)(x)

    np.testing.assert_allclose(np.asarray(loss(ker)), np.asarray(loss(ref)),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# finish kernel (window reverse + crop + un-shift + residual + LN + MLP)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("h,w,ws,ss", [
    (24, 24, 12, 0),
    (24, 24, 12, 6),
    (20, 20, 12, 6),   # padded windows
    (16, 16, 4, 2),
])
def test_finish_matches_xla(h, w, ws, ss):
    from flair_for_aigle_tpu.ops.pallas.finish import (
        _xla_forward as fin_ref,
        fused_reverse_ln_mlp_residual,
    )

    c, hidden = 128, 256
    rng = np.random.default_rng(5)
    hp = h + (ws - h % ws) % ws
    wp = w + (ws - w % ws) % ws
    nw = (hp // ws) * (wp // ws)
    win = jnp.asarray(rng.standard_normal((2 * nw, ws * ws, c), np.float32))
    x = jnp.asarray(rng.standard_normal((2, h, w, c), np.float32))
    s = jnp.asarray(rng.standard_normal((c,), np.float32) * 0.1 + 1)
    b = jnp.asarray(rng.standard_normal((c,), np.float32) * 0.1)
    w1 = jnp.asarray(rng.standard_normal((c, hidden), np.float32) * 0.05)
    b1 = jnp.asarray(rng.standard_normal((hidden,), np.float32) * 0.05)
    w2 = jnp.asarray(rng.standard_normal((hidden, c), np.float32) * 0.05)
    b2 = jnp.asarray(rng.standard_normal((c,), np.float32) * 0.05)
    got = fused_reverse_ln_mlp_residual(win, x, s, b, w1, b1, w2, b2,
                                        ws=ws, ss=ss, interpret=True)
    want = fin_ref(win, x, s, b, w1, b1, w2, b2, ws=ws, ss=ss, eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_finish_vjp_matches_xla_grad():
    from flair_for_aigle_tpu.ops.pallas.finish import (
        _xla_forward as fin_ref,
        fused_reverse_ln_mlp_residual,
    )

    c, hidden, h, w, ws, ss = 128, 256, 16, 16, 4, 2
    rng = np.random.default_rng(6)
    nw = (h // ws) * (w // ws)
    win = jnp.asarray(rng.standard_normal((nw, ws * ws, c), np.float32))
    x = jnp.asarray(rng.standard_normal((1, h, w, c), np.float32))
    s = jnp.ones((c,), jnp.float32)
    b = jnp.zeros((c,), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, hidden), np.float32) * 0.05)
    b1 = jnp.zeros((hidden,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((hidden, c), np.float32) * 0.05)
    b2 = jnp.zeros((c,), jnp.float32)

    def f_k(win, x, w1):
        o = fused_reverse_ln_mlp_residual(win, x, s, b, w1, b1, w2, b2,
                                          ws=ws, ss=ss, interpret=True)
        return jnp.sum(o ** 2)

    def f_r(win, x, w1):
        o = fin_ref(win, x, s, b, w1, b1, w2, b2, ws=ws, ss=ss, eps=1e-5)
        return jnp.sum(o ** 2)

    gk = jax.grad(f_k, argnums=(0, 1, 2))(win, x, w1)
    gr = jax.grad(f_r, argnums=(0, 1, 2))(win, x, w1)
    for a, e in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("h,w,shift", [(16, 16, True), (8, 8, False)])
def test_swin_block_fully_fused_parity(h, w, shift, monkeypatch):
    """prep + attention + finish (three kernels, zero XLA glue) vs the
    pure-XLA SwinBlock."""
    monkeypatch.setenv("FLAIR_SWIN_PREP", "1")
    monkeypatch.setenv("FLAIR_SWIN_FINISH", "1")
    from flair_for_aigle_tpu.models.swin import SwinBlock

    c, nh, ws = 128, 4, 4
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, h, w, c), np.float32))
    kw = dict(dim=c, num_heads=nh, window_size=ws, shift=shift)
    ref = SwinBlock(kernel_mode="off", **kw)
    ker = SwinBlock(kernel_mode="on", **kw)
    variables = ref.init(KEY, x)
    want = ref.apply(variables, x)
    got = ker.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)

    g1 = jax.grad(lambda xx: jnp.sum(ker.apply(variables, xx) ** 2))(x)
    g2 = jax.grad(lambda xx: jnp.sum(ref.apply(variables, xx) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# patch-merging kernel
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("h,w,c,out_c", [(8, 8, 128, 256), (16, 8, 128, 128)])
def test_merge_matches_xla(h, w, c, out_c):
    from flair_for_aigle_tpu.ops.pallas.merge import (
        _xla_forward as merge_ref,
        fused_patch_merge,
    )

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, h, w, c), np.float32))
    s = jnp.asarray(rng.standard_normal((4 * c,), np.float32) * 0.1 + 1)
    b = jnp.asarray(rng.standard_normal((4 * c,), np.float32) * 0.1)
    wr = jnp.asarray(rng.standard_normal((4 * c, out_c), np.float32) * 0.05)
    got = fused_patch_merge(x, s, b, wr, interpret=True)
    want = merge_ref(x, s, b, wr, eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_merge_module_kernel_parity(monkeypatch):
    """PatchMerging module: fused kernel (interpret) vs the XLA path with
    identical params, forward and grad."""
    monkeypatch.setenv("FLAIR_SWIN_MERGE", "1")
    from flair_for_aigle_tpu.models.swin import PatchMerging

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 128), np.float32))
    ref = PatchMerging(256, kernel_mode="off")
    ker = PatchMerging(256, kernel_mode="on")
    v = ref.init(KEY, x)
    want = ref.apply(v, x)
    got = ker.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    g1 = jax.grad(lambda xx: jnp.sum(ker.apply(v, xx) ** 2))(x)
    g2 = jax.grad(lambda xx: jnp.sum(ref.apply(v, xx) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


def test_merge_timm_segment_order():
    """The kernel's in-kernel gather must match timm's documented
    [x00, x10, x01, x11] (row, col) parity order through the reduction."""
    from flair_for_aigle_tpu.ops.pallas.merge import fused_patch_merge

    c = 128
    # x encodes (row_parity*2 + col_parity) in channel 0
    x = np.zeros((1, 4, 4, c), np.float32)
    for r in range(4):
        for cc in range(4):
            x[0, r, cc, 0] = (r % 2) * 2 + (cc % 2)
    s = jnp.ones((4 * c,)); b = jnp.zeros((4 * c,))
    # pick out each segment's channel 0 via the reduction weight
    wr = np.zeros((4 * c, 128), np.float32)
    for k in range(4):
        wr[k * c, k] = 1.0
    out = np.asarray(fused_patch_merge(jnp.asarray(x), s, b,
                                       jnp.asarray(wr), interpret=True))
    # after LN of a constant-ish pattern the ORDER of magnitudes must match
    # [x00, x10, x01, x11] = values [0, 2, 1, 3] normalized; verify ranking
    vals = out[0, 0, 0, :4]
    assert vals[0] < vals[2] < vals[1] < vals[3]


def test_swin_encoder_fully_fused_parity(monkeypatch):
    """Two-stage encoder with ALL fused kernels chained (prep + attention
    + finish per block, fused patch merging between stages) vs the pure
    XLA encoder, same params — catches inter-kernel wiring bugs."""
    monkeypatch.setenv("FLAIR_SWIN_PREP", "1")
    monkeypatch.setenv("FLAIR_SWIN_FINISH", "1")
    monkeypatch.setenv("FLAIR_SWIN_MERGE", "1")
    from flair_for_aigle_tpu.models.swin import SwinTransformerEncoder

    kw = dict(in_channels=3, embed_dim=128, depths=(1, 1),
              num_heads=(4, 8), window_size=4, patch_size=4)
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3), np.float32))
    ref = SwinTransformerEncoder(attn_kernel="off", **kw)
    ker = SwinTransformerEncoder(attn_kernel="on", **kw)
    variables = ref.init(KEY, x)
    want = ref.apply(variables, x)
    got = ker.apply(variables, x)
    assert len(got) == len(want)
    for a, e in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=3e-5, atol=3e-5)
