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


@pytest.mark.parametrize("shift", [0, 2])
def test_pallas_backward_matches_xla_autodiff(shift):
    """The fused Pallas backward (dx + all weight grads, f32 VMEM
    accumulation) vs jax.vjp through the numerics-matched XLA twin."""
    from flair_for_aigle_tpu.ops.pallas import window_attn as wa

    nwh, nww = 2, 3
    bnw, t, c, nh, ws = 2 * nwh * nww, 16, 128, 4, 4
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(bnw, t, c)), jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(c, 3 * c)) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.normal(size=(3 * c,)) * 0.05, jnp.float32)
    wproj = jnp.asarray(rng.normal(size=(c, c)) * 0.05, jnp.float32)
    bproj = jnp.asarray(rng.normal(size=(c,)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(nh, t, t)) * 0.5, jnp.float32)
    g = jnp.asarray(rng.normal(size=(bnw, t, c)), jnp.float32)

    args = (x, wqkv, bqkv, wproj, bproj, bias)
    # the backward kernel must actually be used for this geometry
    assert wa._pick_bw_bwd(bnw, t, c, nh, 4) > 0
    got = wa._kernel_bwd(args, g, num_heads=nh, window_size=ws,
                         shift_size=shift, grid_hw=(nwh, nww),
                         interpret=True)
    assert got is not None

    from functools import partial
    ref_f = partial(wa._xla_forward, num_heads=nh, shifted=shift > 0,
                    window_size=ws, shift_size=shift, grid_hw=(nwh, nww),
                    out_dtype=jnp.float32)
    _, pullback = jax.vjp(ref_f, *args)
    want = pullback(g)

    names = ["dx", "dwqkv", "dbqkv", "dwproj", "dbproj", "dbias"]
    for name, a, b_ in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            rtol=5e-4, atol=5e-4, err_msg=name)


def test_backward_vmem_gate_falls_back_to_xla():
    """A geometry whose f32 weight-grad residents blow the VMEM budget must
    return None from the kernel path (the VJP then uses the XLA twin)."""
    from flair_for_aigle_tpu.ops.pallas import window_attn as wa

    # c=1024 (swin stage 4): 4*c*c*4 f32 grads alone exceed the budget
    assert wa._pick_bw_bwd(8, 16, 1024, 8, 4) == 0


@pytest.mark.parametrize("shift", [0, 2])
def test_grad_through_module_matches_xla(shift):
    """End-to-end jax.grad through WindowAttention with kernels on vs off."""
    b, hp, wp, c, nh, ws = 1, 8, 12, 128, 4, 4
    y = jnp.asarray(
        np.random.default_rng(5).normal(size=(b, hp, wp, c)), jnp.float32
    )
    kw = dict(dim=c, num_heads=nh, table_window=ws, window_size=(ws, ws),
              shift_size=shift)
    ref = WindowAttention(kernel_mode="off", **kw)
    ker = WindowAttention(kernel_mode="on", **kw)
    variables = ref.init(jax.random.key(1), y)

    def loss(mod):
        def f(v, inp):
            out = mod.apply(v, inp)
            return jnp.sum(out * out)
        return jax.grad(f, argnums=(0, 1))(variables, y)

    gref_v, gref_x = loss(ref)
    gker_v, gker_x = loss(ker)
    np.testing.assert_allclose(np.asarray(gker_x), np.asarray(gref_x),
                               rtol=1e-3, atol=1e-3)
    flat_ref = jax.tree_util.tree_leaves_with_path(gref_v)
    flat_ker = jax.tree_util.tree_leaves(gker_v)
    for (path, a), b_ in zip(flat_ref, flat_ker):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=2e-3, atol=2e-3,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("shift", [0, 2])
def test_fused_window_attention_attn_f32_false_f32_inputs(shift):
    """attn_f32=False with f32 inputs: acc_t == dt == f32, so the kernel
    must still match the XLA path at the strict tolerances."""
    b, hp, wp, c, nh, ws = 2, 8, 12, 128, 4, 4
    y = jnp.asarray(
        np.random.default_rng(7).normal(size=(b, hp, wp, c)), jnp.float32
    )
    kw = dict(dim=c, num_heads=nh, table_window=ws, window_size=(ws, ws),
              shift_size=shift, attn_f32=False)
    ref = WindowAttention(kernel_mode="off", **kw)
    ker = WindowAttention(kernel_mode="on", **kw)
    variables = ref.init(jax.random.key(1), y)
    want = ref.apply(variables, y)
    got = ker.apply(variables, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_window_attention_attn_f32_false_bf16():
    """attn_f32=False + bf16 inputs: the kernel's compute-dtype softmax vs
    the XLA path's (same contract) and vs the f32-softmax reference — the
    knob's error must stay in the bf16-rounding regime."""
    b, hp, wp, c, nh, ws = 1, 8, 8, 128, 4, 4
    y32 = jnp.asarray(
        np.random.default_rng(11).normal(size=(b, hp, wp, c)), jnp.float32
    )
    y16 = y32.astype(jnp.bfloat16)
    kw = dict(dim=c, num_heads=nh, table_window=ws, window_size=(ws, ws),
              shift_size=2)
    ref32 = WindowAttention(kernel_mode="off", attn_f32=True, **kw)
    xla16 = WindowAttention(kernel_mode="off", attn_f32=False, **kw)
    ker16 = WindowAttention(kernel_mode="on", attn_f32=False, **kw)
    variables = ref32.init(jax.random.key(1), y32)
    want32 = np.asarray(ref32.apply(variables, y32))
    got_x = np.asarray(xla16.apply(variables, y16)).astype(np.float32)
    got_k = np.asarray(ker16.apply(variables, y16)).astype(np.float32)
    denom = np.maximum(np.abs(want32), 1e-2)
    # both bf16-softmax lowerings stay close to the f32 reference...
    assert np.median(np.abs(got_x - want32) / denom) < 0.02
    assert np.median(np.abs(got_k - want32) / denom) < 0.02
    # ...and to each other (same reduced-precision contract)
    assert np.median(np.abs(got_k - got_x) / denom) < 0.02


@pytest.mark.parametrize("shift", [0, 2])
def test_pallas_backward_attn_f32_false(shift):
    """Backward kernel with attn_f32=False vs jax.vjp through the matching
    XLA twin (f32 inputs so dt == f32: strict tolerances apply)."""
    from functools import partial

    from flair_for_aigle_tpu.ops.pallas import window_attn as wa

    nwh, nww = 2, 3
    bnw, t, c, nh, ws = 2 * nwh * nww, 16, 128, 4, 4
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(bnw, t, c)), jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(c, 3 * c)) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.normal(size=(3 * c,)) * 0.05, jnp.float32)
    wproj = jnp.asarray(rng.normal(size=(c, c)) * 0.05, jnp.float32)
    bproj = jnp.asarray(rng.normal(size=(c,)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(nh, t, t)) * 0.5, jnp.float32)
    g = jnp.asarray(rng.normal(size=(bnw, t, c)), jnp.float32)

    args = (x, wqkv, bqkv, wproj, bproj, bias)
    got = wa._kernel_bwd(args, g, num_heads=nh, window_size=ws,
                         shift_size=shift, grid_hw=(nwh, nww),
                         interpret=True, attn_f32=False)
    assert got is not None
    ref_f = partial(wa._xla_forward, num_heads=nh, shifted=shift > 0,
                    window_size=ws, shift_size=shift, grid_hw=(nwh, nww),
                    out_dtype=jnp.float32, attn_f32=False)
    _, pullback = jax.vjp(ref_f, *args)
    want = pullback(g)
    names = ["dx", "dwqkv", "dbqkv", "dwproj", "dbproj", "dbias"]
    for name, a, b_ in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            rtol=5e-4, atol=5e-4, err_msg=name)


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


@pytest.mark.parametrize("shift", [0, 2])
def test_extreme_scores_finite_and_match_xla(shift):
    """Overflow-guard regression (VERDICT r4 ask #2): a +200 score spike
    (far beyond exp's f32 range without a shift) must produce finite
    probs/grads from the fast-softmax kernel AND agree with the safe XLA
    softmax — the min(s, 80) clamp leaves a single dominant entry's
    softmax unchanged (clamped spike still wins by e^80)."""
    from functools import partial

    from flair_for_aigle_tpu.ops.pallas import window_attn as wa

    nwh, nww = 2, 3
    bnw, t, c, nh, ws = 2 * nwh * nww, 16, 128, 4, 4
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.normal(size=(bnw, t, c)), jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(c, 3 * c)) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.normal(size=(3 * c,)) * 0.05, jnp.float32)
    wproj = jnp.asarray(rng.normal(size=(c, c)) * 0.05, jnp.float32)
    bproj = jnp.asarray(rng.normal(size=(c,)) * 0.05, jnp.float32)
    # one +200 spike per score row, scattered across columns/heads
    bias_np = rng.normal(size=(nh, t, t)).astype(np.float32) * 0.5
    for h in range(nh):
        for i in range(t):
            bias_np[h, i, (i * 7 + h) % t] = 200.0
    bias = jnp.asarray(bias_np)
    g = jnp.asarray(rng.normal(size=(bnw, t, c)), jnp.float32)

    args = (x, wqkv, bqkv, wproj, bproj, bias)
    got = wa._kernel_call(*args, num_heads=nh, window_size=ws,
                          shift_size=shift, grid_hw=(nwh, nww),
                          out_dtype=jnp.float32, interpret=True)
    assert np.all(np.isfinite(np.asarray(got))), "fwd NaN/inf at score 200"
    ref_f = partial(wa._xla_forward, num_heads=nh, shifted=shift > 0,
                    window_size=ws, shift_size=shift, grid_hw=(nwh, nww),
                    out_dtype=jnp.float32)
    want = ref_f(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    gots = wa._kernel_bwd(args, g, num_heads=nh, window_size=ws,
                          shift_size=shift, grid_hw=(nwh, nww),
                          interpret=True)
    assert gots is not None
    _, pullback = jax.vjp(ref_f, *args)
    wants = pullback(g)
    names = ["dx", "dwqkv", "dbqkv", "dwproj", "dbproj", "dbias"]
    for name, a, b_ in zip(names, gots, wants):
        a = np.asarray(a, np.float32)
        assert np.all(np.isfinite(a)), f"{name} NaN/inf at score 200"
        np.testing.assert_allclose(a, np.asarray(b_, np.float32),
                                   rtol=1e-3, atol=1e-3, err_msg=name)


def test_saturated_scores_stay_finite():
    """Every score driven past the clamp (all +200): probabilities and
    grads degrade to the saturated-uniform regime but must stay finite —
    this is exactly the pathological-spike case the clamp exists for
    (numerics intentionally diverge from XLA's max-shifted softmax here,
    so only finiteness is asserted)."""
    from flair_for_aigle_tpu.ops.pallas import window_attn as wa

    nwh, nww = 2, 2
    bnw, t, c, nh, ws = nwh * nww, 16, 128, 4, 4
    rng = np.random.default_rng(19)
    x = jnp.asarray(rng.normal(size=(bnw, t, c)), jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(c, 3 * c)) * 0.05, jnp.float32)
    bqkv = jnp.zeros((3 * c,), jnp.float32)
    wproj = jnp.asarray(rng.normal(size=(c, c)) * 0.05, jnp.float32)
    bproj = jnp.zeros((c,), jnp.float32)
    bias = jnp.full((nh, t, t), 200.0, jnp.float32)
    g = jnp.asarray(rng.normal(size=(bnw, t, c)), jnp.float32)

    args = (x, wqkv, bqkv, wproj, bproj, bias)
    got = wa._kernel_call(*args, num_heads=nh, window_size=ws,
                          shift_size=0, grid_hw=(nwh, nww),
                          out_dtype=jnp.float32, interpret=True)
    assert np.all(np.isfinite(np.asarray(got)))
    gots = wa._kernel_bwd(args, g, num_heads=nh, window_size=ws,
                          shift_size=0, grid_hw=(nwh, nww), interpret=True)
    assert gots is not None
    for a in gots:
        assert np.all(np.isfinite(np.asarray(a, np.float32)))


def test_pallas_backward_attn_f32_false_bf16():
    """bf16 backward numerics for attn_f32=False (ADVICE r4): kernel bwd
    vs the XLA twin's vjp on bf16 inputs — finite grads, median relative
    error in the bf16-rounding regime."""
    from functools import partial

    from flair_for_aigle_tpu.ops.pallas import window_attn as wa

    nwh, nww = 2, 3
    bnw, t, c, nh, ws = 2 * nwh * nww, 16, 128, 4, 4
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.normal(size=(bnw, t, c)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.normal(size=(c, 3 * c)) * 0.05, jnp.bfloat16)
    bqkv = jnp.asarray(rng.normal(size=(3 * c,)) * 0.05, jnp.bfloat16)
    wproj = jnp.asarray(rng.normal(size=(c, c)) * 0.05, jnp.bfloat16)
    bproj = jnp.asarray(rng.normal(size=(c,)) * 0.05, jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(nh, t, t)) * 0.5, jnp.float32)
    g = jnp.asarray(rng.normal(size=(bnw, t, c)), jnp.bfloat16)

    args = (x, wqkv, bqkv, wproj, bproj, bias)
    got = wa._kernel_bwd(args, g, num_heads=nh, window_size=ws,
                         shift_size=2, grid_hw=(nwh, nww),
                         interpret=True, attn_f32=False)
    assert got is not None
    ref_f = partial(wa._xla_forward, num_heads=nh, shifted=True,
                    window_size=ws, shift_size=2, grid_hw=(nwh, nww),
                    out_dtype=jnp.bfloat16, attn_f32=False)
    _, pullback = jax.vjp(ref_f, *args)
    want = pullback(g.astype(jnp.bfloat16))
    names = ["dx", "dwqkv", "dbqkv", "dwproj", "dbproj", "dbias"]
    for name, a, b_ in zip(names, got, want):
        a = np.asarray(a, np.float32)
        b_ = np.asarray(b_, np.float32)
        assert np.all(np.isfinite(a)), f"{name} not finite"
        denom = np.maximum(np.abs(b_), 1e-2)
        # 0.04: the kernel accumulates weight grads in f32 VMEM while the
        # XLA twin's autodiff reduces through bf16 intermediates, so the
        # two sides differ by bf16 accumulation-order noise (measured
        # median ~0.026 on dbqkv), not by algebra.
        assert np.median(np.abs(a - b_) / denom) < 0.04, name


@pytest.mark.parametrize("shift", [0, 2])
def test_chunked_backward_matches_xla_at_gated_geometry(shift):
    """The HEAD-CHUNKED Pallas backward (VERDICT r4 ask #3: stages 3-4,
    C=512/1024, monolithic kernel VMEM-gates) vs jax.vjp through the XLA
    twin. f32 inputs -> strict tolerances."""
    from functools import partial

    from flair_for_aigle_tpu.ops.pallas import window_attn as wa

    nwh, nww = 2, 2
    bnw, t, c, nh, ws = nwh * nww, 16, 1024, 32, 4
    # this geometry must gate the monolithic kernel and fit the chunked one
    assert wa._pick_bw_bwd(bnw, t, c, nh, 4) == 0
    hc, bw = wa._pick_hc_bwd(bnw, t, c, nh, 4)
    assert hc > 0 and nh // hc > 1  # a real multi-chunk split

    rng = np.random.default_rng(29)
    x = jnp.asarray(rng.normal(size=(bnw, t, c)), jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(c, 3 * c)) * 0.02, jnp.float32)
    bqkv = jnp.asarray(rng.normal(size=(3 * c,)) * 0.02, jnp.float32)
    wproj = jnp.asarray(rng.normal(size=(c, c)) * 0.02, jnp.float32)
    bproj = jnp.asarray(rng.normal(size=(c,)) * 0.02, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(nh, t, t)) * 0.5, jnp.float32)
    g = jnp.asarray(rng.normal(size=(bnw, t, c)), jnp.float32)

    args = (x, wqkv, bqkv, wproj, bproj, bias)
    got = wa._kernel_bwd(args, g, num_heads=nh, window_size=ws,
                         shift_size=shift, grid_hw=(nwh, nww),
                         interpret=True)
    assert got is not None
    ref_f = partial(wa._xla_forward, num_heads=nh, shifted=shift > 0,
                    window_size=ws, shift_size=shift, grid_hw=(nwh, nww),
                    out_dtype=jnp.float32)
    _, pullback = jax.vjp(ref_f, *args)
    want = pullback(g)
    names = ["dx", "dwqkv", "dbqkv", "dwproj", "dbproj", "dbias"]
    for name, a, b_ in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            rtol=2e-3, atol=2e-3, err_msg=name)


def test_chunked_backward_attn_f32_false_bf16():
    """Chunked backward at a gated geometry with bf16 inputs and
    attn_f32=False: finite grads, bf16-regime agreement with the twin."""
    from functools import partial

    from flair_for_aigle_tpu.ops.pallas import window_attn as wa

    nwh, nww = 2, 2
    bnw, t, c, nh, ws = nwh * nww, 16, 1024, 32, 4
    assert wa._pick_bw_bwd(bnw, t, c, nh, 2, 2) == 0
    assert wa._pick_hc_bwd(bnw, t, c, nh, 2, 2)[0] > 0

    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.normal(size=(bnw, t, c)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.normal(size=(c, 3 * c)) * 0.02, jnp.bfloat16)
    bqkv = jnp.asarray(rng.normal(size=(3 * c,)) * 0.02, jnp.bfloat16)
    wproj = jnp.asarray(rng.normal(size=(c, c)) * 0.02, jnp.bfloat16)
    bproj = jnp.asarray(rng.normal(size=(c,)) * 0.02, jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(nh, t, t)) * 0.5, jnp.float32)
    g = jnp.asarray(rng.normal(size=(bnw, t, c)), jnp.bfloat16)

    args = (x, wqkv, bqkv, wproj, bproj, bias)
    got = wa._kernel_bwd(args, g, num_heads=nh, window_size=ws,
                         shift_size=2, grid_hw=(nwh, nww),
                         interpret=True, attn_f32=False)
    assert got is not None
    ref_f = partial(wa._xla_forward, num_heads=nh, shifted=True,
                    window_size=ws, shift_size=2, grid_hw=(nwh, nww),
                    out_dtype=jnp.bfloat16, attn_f32=False)
    _, pullback = jax.vjp(ref_f, *args)
    want = pullback(g)
    names = ["dx", "dwqkv", "dbqkv", "dwproj", "dbproj", "dbias"]
    for name, a, b_ in zip(names, got, want):
        a = np.asarray(a, np.float32)
        b_ = np.asarray(b_, np.float32)
        assert np.all(np.isfinite(a)), f"{name} not finite"
        denom = np.maximum(np.abs(b_), 1e-2)
        assert np.median(np.abs(a - b_) / denom) < 0.04, name
