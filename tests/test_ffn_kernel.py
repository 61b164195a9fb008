"""Fused LN+MLP+residual kernel vs the XLA SwinBlock tail."""

import jax
import jax.numpy as jnp
import numpy as np

from flair_for_aigle_tpu.models.swin import SwinBlock
from flair_for_aigle_tpu.ops.pallas.ffn import fused_ln_mlp_residual


def test_fused_ffn_matches_xla():
    n, c, hidden = 64, 128, 512
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
    a = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
    ln_s = jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1, jnp.float32)
    ln_b = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, hidden)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(hidden,)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(hidden, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)) * 0.05, jnp.float32)

    x2 = x + a
    xf = x2.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    ln = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * ln_s + ln_b
    h = jax.nn.gelu(ln @ w1 + b1, approximate=False)
    want = np.asarray(x2 + (h @ w2 + b2))

    got = np.asarray(fused_ln_mlp_residual(x, a, ln_s, ln_b, w1, b1, w2, b2))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_swinblock_kernel_tree_and_output_match():
    # kernel_mode 'on' (interpret on CPU) must produce the SAME param tree
    # as the XLA path (shadow modules) and matching outputs
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 8, 8, 128)), jnp.float32
    )
    blk_ref = SwinBlock(dim=128, num_heads=4, window_size=4, shift=True,
                        kernel_mode="off")
    blk_ker = SwinBlock(dim=128, num_heads=4, window_size=4, shift=True,
                        kernel_mode="on")
    v_ref = blk_ref.init(jax.random.key(0), x)
    v_ker = blk_ker.init(jax.random.key(0), x)
    assert jax.tree.structure(v_ref) == jax.tree.structure(v_ker)
    for a, b in zip(jax.tree.leaves(v_ref), jax.tree.leaves(v_ker)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    want = np.asarray(blk_ref.apply(v_ref, x))
    got = np.asarray(blk_ker.apply(v_ref, x))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_swinblock_kernel_grads_match_xla():
    """Custom VJP (kernel forward, XLA-recompute backward): gradients of a
    full SwinBlock with kernels ON must match the XLA path — training now
    runs the fused kernels."""
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(1, 8, 8, 128)), jnp.float32
    )
    blk_ref = SwinBlock(dim=128, num_heads=4, window_size=4, shift=True,
                        kernel_mode="off", is_training=True)
    blk_ker = SwinBlock(dim=128, num_heads=4, window_size=4, shift=True,
                        kernel_mode="on", is_training=True)
    v = blk_ref.init(jax.random.key(0), x)

    def loss(blk, variables, inp):
        y = blk.apply(variables, inp)
        return (y.astype(jnp.float32) ** 2).mean()

    g_ref = jax.grad(lambda v_, i: loss(blk_ref, v_, i), argnums=(0, 1))(v, x)
    g_ker = jax.grad(lambda v_, i: loss(blk_ker, v_, i), argnums=(0, 1))(v, x)
    ref_leaves = jax.tree.leaves(g_ref)
    ker_leaves = jax.tree.leaves(g_ker)
    assert len(ref_leaves) == len(ker_leaves)
    for a, b in zip(ref_leaves, ker_leaves):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def test_swinblock_kernel_grads_under_remat():
    """nn.checkpoint around a kernel-mode block (the training remat path)
    must differentiate cleanly through the custom VJPs."""
    from flax import linen as nn

    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(1, 8, 8, 128)), jnp.float32
    )
    blk = nn.checkpoint(SwinBlock)(dim=128, num_heads=4, window_size=4,
                                   shift=False, kernel_mode="on",
                                   is_training=True)
    v = blk.init(jax.random.key(0), x)
    g = jax.grad(
        lambda v_: (blk.apply(v_, x).astype(jnp.float32) ** 2).mean()
    )(v)
    assert all(np.isfinite(np.asarray(leaf)).all()
               for leaf in jax.tree.leaves(g))


def _ffn_args(n, c, hidden, dt, seed=3):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(n, c)), dt),
        jnp.asarray(rng.normal(size=(n, c)), dt),
        jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1, jnp.float32),
        jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(c, hidden)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(hidden,)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(hidden, c)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(c,)) * 0.05, jnp.float32),
    )


def test_ffn_pallas_backward_matches_xla_autodiff():
    """The fused Pallas FFN backward (VERDICT r5: dx kernel + dW kernel) vs
    jax.vjp through the numerics-matched XLA twin. f32 inputs -> strict
    tolerances."""
    from functools import partial

    from flair_for_aigle_tpu.ops.pallas import ffn as ffn_mod

    n, c, hidden = 64, 128, 512
    args = _ffn_args(n, c, hidden, jnp.float32)
    g = jnp.asarray(np.random.default_rng(5).normal(size=(n, c)), jnp.float32)
    got = ffn_mod._kernel_bwd(args, g, eps=1e-5, interpret=True)
    assert got is not None
    _, pullback = jax.vjp(partial(ffn_mod._xla_forward, eps=1e-5), *args)
    want = pullback(g)
    names = ["dx", "dattn", "dlns", "dlnb", "dw1", "db1", "dw2", "db2"]
    for name, a_, b_ in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(a_, np.float32), np.asarray(b_, np.float32),
            rtol=2e-3, atol=2e-3, err_msg=name)


def test_ffn_pallas_backward_multichunk_bf16():
    """A geometry whose dW VMEM forces multiple hidden chunks, bf16 inputs:
    finite grads, bf16-regime agreement with the twin."""
    from functools import partial

    from flair_for_aigle_tpu.ops.pallas import ffn as ffn_mod

    n, c, hidden = 32, 1024, 4096  # swin stage 4 widths
    tbw, hcw = ffn_mod._pick_bwd(n, c, hidden, 2)
    assert tbw > 0 and hidden // hcw > 1  # real multi-chunk split
    args = _ffn_args(n, c, hidden, jnp.bfloat16)
    g = jnp.asarray(np.random.default_rng(7).normal(size=(n, c)),
                    jnp.bfloat16)
    got = ffn_mod._kernel_bwd(args, g, eps=1e-5, interpret=True)
    assert got is not None
    _, pullback = jax.vjp(partial(ffn_mod._xla_forward, eps=1e-5), *args)
    want = pullback(g)
    names = ["dx", "dattn", "dlns", "dlnb", "dw1", "db1", "dw2", "db2"]
    for name, a_, b_ in zip(names, got, want):
        a_ = np.asarray(a_, np.float32)
        b_ = np.asarray(b_, np.float32)
        assert np.all(np.isfinite(a_)), f"{name} not finite"
        denom = np.maximum(np.abs(b_), 1e-2)
        assert np.median(np.abs(a_ - b_) / denom) < 0.04, name


def test_ffn_backward_env_optin(monkeypatch):
    """FLAIR_FFN_BWD=kernel opts into the Pallas backward (default is the
    XLA twin, measured faster on v5e); grads agree through the public
    entry point either way."""
    from flair_for_aigle_tpu.ops.pallas import ffn as ffn_mod

    n, c, hidden = 16, 128, 512
    args = _ffn_args(n, c, hidden, jnp.float32)

    def loss(*a):
        return jnp.sum(fused_ln_mlp_residual(*a) ** 2)

    g_xla = jax.grad(loss, argnums=(0, 4))(*args)
    monkeypatch.setenv("FLAIR_FFN_BWD", "kernel")
    ffn_mod._vjp_fn.cache_clear()
    g_kernel = jax.grad(loss, argnums=(0, 4))(*args)
    ffn_mod._vjp_fn.cache_clear()
    for a_, b_ in zip(g_kernel, g_xla):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)
