"""Fused swin window attention (Pallas TPU kernel).

Grid over window batches of the already-partitioned feature windows
(B*nW, T, C); each instance runs, entirely in VMEM with the qkv and
output-projection weights resident:

  qkv = x @ Wqkv + b -> per-head QK^T (f32 accum) -> +relative-position
  bias -> +shift mask (pattern picked from the window's position in the
  padded window grid) -> f32 softmax -> compute-dtype probs @ V ->
  head merge -> out = attn @ Wproj + b

The XLA lowering of the same math materializes the (B*nW, T, 3C) qkv
tensor, the (B*nW, nh, T, T) score tensors, six q/k/v/out head-split
transposes and the pre-projection attention output in HBM per block; at
swin-base 512px geometry those dominate the encoder's HBM traffic (the
step is bandwidth-bound). The kernel's HBM traffic is one read of the
feature windows, one write of the projected output, and one read of the
weights per grid pass.

Numerics follow the model's attn_f32 knob (swin.py:WindowAttention), in
the forward AND the backward recompute alike. Default attn_f32=True:
scores/softmax accumulate in float32 (static-shift + deferred-norm fast
form, overflow-clamped at 80), probabilities are cast to the compute
dtype before the PV matmul, bias and mask stay float32 — matching the
attn_f32=True XLA path. attn_f32=False (opt-in speed knob): scores and
softmax run in the compute dtype with the classic per-row max shift (the
static shift is invalid in bf16 — ulp at magnitude 30 is 0.125), bias is
pre-cast to the compute dtype, matching the XLA path's acc_t = x.dtype.

Shift-mask banking: timm's shifted-window mask (swin.py:_shift_attn_mask)
assigns each token a 3x3 band id; within one window the resulting (T, T)
pattern depends only on whether the window is last in its row and/or
column of the padded window grid, so four patterns cover every window and
the kernel picks one from the window index.

Mosaic constraint note: blocks must have their last two dims (8, 128)-
aligned, so the kernel consumes (BW, T, 3C) window blocks — T = ws^2 is a
multiple of 8 for every production geometry (144 for window 12) — rather
than (ws, ws) raster tiles; window partition/reverse stay one XLA copy
each.

Backward (round 4): ``fused_window_attention`` carries a custom VJP whose
backward is a second fused Pallas kernel (``_bwd_kernel_body``): it
recomputes qkv/probs in VMEM flash-style (only the raw inputs are saved as
residuals), runs the softmax/attention backward per head with f32
accumulators, and ACCUMULATES every weight gradient (dWqkv, dbqkv, dWproj,
dbproj, dbias) in f32 VMEM across the sequential TPU grid — so the
backward's HBM traffic is one read of x and g and one write of dx plus the
small weight grads, while the XLA autodiff of the same math materializes
four (B*nW, nh, T, T) score-sized tensors (s, probs, dp, ds) per block.

Widths whose all-heads-resident f32 weight-grad buffers blow the VMEM
budget (swin stages 3-4, C=512/1024) use the HEAD-CHUNKED variant
(``_bwd_chunked_body``, round 5): grid (nh//hc, n_window_batches) with the
head chunk outer, so each chunk's weight/bias grads stay VMEM-resident and
accumulate across windows; dx is emitted as nh//hc partials summed by XLA.
If even hc=1 doesn't fit, the round-3 XLA-recompute twin
(``_xla_forward``) — bit-identical to the kernel forward's semantics —
remains the fallback (also reachable via FLAIR_ATTN_BWD=xla).
"""

from __future__ import annotations

import os as _os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Static-shift softmax level (FLAIR_ATTN_FAST_SOFTMAX=0|1|2, default 2;
# read at import since kernel builders are lru_cached).
# Level 1: softmax(x) = exp(x-c)/sum(exp(x-c)) for any c, so the per-row
# max reduce+subtract passes over the (bw, nh, T, T) f32 score tensor are
# pure safety against exp overflow; a static c=30 keeps exp in f32 range
# for any realistic swin score. Level 2 (default) further defers the
# normalization past the value matmul (linear), dividing the (T, hd)
# product by the exact f32 row sums instead of the (T, T) probs.
# Still f32 exp/sum (the attn_f32 contract). Measured on v5e 2026-08-18/19
# (tools/exp_block_decomp.py / profile_zonal_step.py, same-phase A/B):
# stage-1 attn 2.59 -> 1.57 ms/block (lvl 1), stage-3 0.54 -> 0.22; full
# zonal step 282.3 -> 299.6-300.6 (lvl 1) -> 311.3-314.8 tiles/s (lvl 2,
# A/B/A 299.7 / 311.3 / 299.4). Interpret parity green vs the safe XLA
# softmax at existing tolerances for both levels.
_FAST_SOFTMAX = int(_os.getenv("FLAIR_ATTN_FAST_SOFTMAX", "2"))
# Overflow-guard clamp on the fast-softmax score tiles (see the kernel
# bodies): exp(min(s, C) - 30) stays finite in f32 for C <= ~118. Knob
# exists for A/B measurement (FLAIR_ATTN_CLAMP=inf reproduces the r4
# unguarded form); measured free on v5e — leave at 80.
_CLAMP = float(_os.getenv("FLAIR_ATTN_CLAMP", "80"))


def _guard(s):
    """min(s, clamp); FLAIR_ATTN_CLAMP=inf elides the op entirely (the r4
    unguarded form, kept only for same-phase A/B measurement)."""
    return jnp.minimum(s, _CLAMP) if np.isfinite(_CLAMP) else s


@lru_cache(maxsize=None)
def shift_mask_bank(ws: int, ss: int) -> np.ndarray:
    """(4, T, T) float32 additive masks: [interior, last-col, last-row,
    last-row+col]. Equal to the per-window rows of timm's shifted-window
    mask (models/swin.py:_shift_attn_mask) at the matching position."""
    t = ws * ws

    def groups(last: bool) -> np.ndarray:
        g = np.zeros(ws, np.int64)
        if last:
            # window spans image bands (-ws..-ss) and (-ss..)
            g[: ws - ss] = 1
            g[ws - ss:] = 2
        return g

    bank = np.zeros((4, t, t), np.float32)
    for p, (li, lj) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        gr, gc = groups(bool(li)), groups(bool(lj))
        gid = (gr[:, None] * 3 + gc[None, :]).reshape(-1)  # (T,)
        diff = gid[None, :] - gid[:, None]
        bank[p] = np.where(diff != 0, -100.0, 0.0)
    return bank


@lru_cache(maxsize=None)
def shift_mask_patterns(ws: int, ss: int) -> np.ndarray:
    """(3, T, T) float32 [ar, ac, ar*ac]: ar(i,j)=1 where the LAST-ROW
    band grouping differs between tokens i and j, ac the last-column
    analogue. The kernel rebuilds the bank row for any window position as
    -100*(li*ar + lj*ac - li*lj*ar*ac), which equals shift_mask_bank's
    entry at pattern (li, lj) — differ = (row bands differ and li) OR
    (col bands differ and lj)."""
    t = ws * ws
    g = np.zeros(ws, np.int64)
    g[: ws - ss] = 1
    g[ws - ss:] = 2
    gr = g[(np.arange(t) // ws)]
    gc = g[(np.arange(t) % ws)]
    ar = (gr[:, None] != gr[None, :]).astype(np.float32)
    ac = (gc[:, None] != gc[None, :]).astype(np.float32)
    return np.stack([ar, ac, ar * ac])


def _pick_bw(bnw: int, t: int, c: int, nh: int, itemsize: int,
             acc: int = 4) -> int:
    """Largest window-batch size that divides bnw and fits VMEM (~12 MB
    budget: resident qkv/proj weights, double-buffered x/out blocks, bias,
    mask patterns, the live (bw, T, 3C) qkv, per-head scores and the
    (bw, T, T) shift mask). ``acc`` is the softmax accumulation itemsize
    (4 for attn_f32, the compute itemsize otherwise) — keying the dominant
    score-tile terms on the actual dtype lets the bf16-score mode pick a
    bigger window batch."""
    t_pad = -(-t // 128) * 128  # scores lane padding
    fixed = (nh * t * t * 4 + 3 * t * t * 4
             + 4 * c * c * itemsize + 2 * 3 * c * itemsize)
    for bw in (32, 16, 8, 4, 2, 1):
        if bnw % bw:
            continue
        per = bw * (t * 2 * c * itemsize * 2        # x + out, double-buffered
                    + t * 3 * c * itemsize          # qkv (compute dtype)
                    + t * 3 * c * 4                 # qkv f32 accum pre-cast
                    + t * c * itemsize              # o scratch
                    + t * c * 4                     # out f32 accum pre-cast
                    + t * t_pad * (acc + itemsize)  # scores acc_t + probs
                    + t * t_pad * acc               # softmax temp
                    + t * t * acc)                  # broadcast shift mask
        if fixed + per <= int(float(_os.getenv("FLAIR_ATTN_VMEM_MB", "12")) * (1 << 20)):
            return bw
    return 1


def _kernel_body(nh: int, t: int, c: int, bw: int, shifted: bool,
                 nwh: int, nww: int, out_dtype, attn_f32: bool = True):
    hd = c // nh
    scale = hd ** -0.5

    def body(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref,
             mask_ref, out_ref, attn_scratch):
        i = pl.program_id(0)
        dt = x_ref.dtype
        # attn_f32=False (the model's opt-in speed knob, swin.py:attn_f32):
        # scores/softmax in the compute dtype, mirroring the XLA path's
        # acc_t = x.dtype — halves the VPU softmax traffic over the
        # (bw, nh, T, T) score tiles the kernel is bound by. Bias arrives
        # pre-cast to dt from _kernel_call in that mode.
        acc_t = jnp.float32 if attn_f32 else dt
        # in-kernel qkv projection over the whole window batch in ONE
        # matmul (TorchLinear epilogue: f32 accum -> compute dtype ->
        # +bias); the (B*nW, T, 3C) qkv tensor never exists in HBM.
        # Per-window matmuls are MXU-issue-latency-bound at small C.
        qkv = jnp.dot(
            x_ref[:].reshape(bw * t, c), wqkv_ref[:],
            preferred_element_type=jnp.float32,
        ).astype(dt) + bqkv_ref[0]
        qkv = qkv.reshape(bw, t, 3 * c)
        if shifted:
            # arithmetic shift mask: differ(i,j) <-> li*ar + lj*ac
            # - li*lj*ar*ac with ar/ac/arac the fixed last-row/last-col
            # difference patterns (see shift_mask_patterns) and li/lj the
            # per-window "last in grid row/col" flags -> (bw, T, T) f32,
            # equal to the bank row the old per-window select picked
            gw = i * bw + lax.broadcasted_iota(jnp.int32, (bw, 1, 1), 0)
            widx = gw % (nwh * nww)
            li = (widx // nww == nwh - 1).astype(jnp.float32)
            lj = (widx % nww == nww - 1).astype(jnp.float32)
            msel = (-100.0 * (li * mask_ref[0] + lj * mask_ref[1]
                              - (li * lj) * mask_ref[2])).astype(acc_t)
        # per-head batched matmuls (batch dim leads — Mosaic rejects
        # lane-splitting reshapes like (T, C)->(T, nh, hd), so heads
        # unroll over static lane slices)
        for h in range(nh):
            q = qkv[:, :, h * hd:(h + 1) * hd]  # (bw, T, hd)
            k = qkv[:, :, c + h * hd:c + (h + 1) * hd]
            v = qkv[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
            # (bw, T, hd) x (bw, T2, hd)^T -> (bw, T, T2). Mosaic requires
            # a 32-bit matmul accumulator, so the dot emits f32 and the
            # attn_f32=False path casts the scores down once — the VPU
            # softmax passes that bound this kernel then run in bf16.
            s = lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(acc_t) * scale
            s = s + bias_ref[h]
            if shifted:
                s = s + msel
            if not attn_f32:
                # bf16 scores: the static c=30 shift is INVALID here (bf16
                # ulp at magnitude 30 is 0.125 -> ~12% exp error); the
                # classic per-row max shift keeps the exp argument near
                # zero where bf16 is accurate (far-from-max rows land on
                # coarse ulps but contribute ~e^-20 to the sum). Deferred
                # normalization still applies.
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                denom = jnp.sum(e, axis=-1, keepdims=True) + 1e-37
                o = lax.dot_general(
                    e.astype(dt), v, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) / denom
            elif _FAST_SOFTMAX == 2:
                # deferred normalization: the value matmul is linear, so
                # divide the (T, hd) product instead of the (T, T) probs
                # (4.5x fewer divides at T=144, hd=32); sum stays f32.
                # min(s, 80) overflow guard: exp(80-30) ~ 5e21 stays finite
                # in f32, so a pathological score spike (training warmup,
                # corrupted weights) stays finite instead of inf/NaN
                # (entries above the clamp flatten to EQUAL weight — a
                # degraded but finite row, not the true argmax). One VPU
                # op; measured free on v5e (same-phase A/B, CLAUDE.md r5).
                e = jnp.exp(_guard(s) - 30.0)
                denom = jnp.sum(e, axis=-1, keepdims=True) + 1e-37
                o = lax.dot_general(
                    e.astype(dt), v, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) / denom
            else:
                if _FAST_SOFTMAX:
                    # static-shift softmax (see module note): the per-row
                    # max reduce+subtract are pure overflow safety;
                    # softmax(x) = exp(x-c)/sum(exp(x-c)) for any c, and
                    # c=30 keeps exp in f32 range for any realistic score
                    # (rows whose max sits below -57 would flush to 0/0,
                    # which LN-bounded swin scores never reach). +1e-37
                    # denom guard: a no-op below one f32 ulp of any
                    # realistic denominator, but the impossible all-
                    # underflow row degrades to zeros instead of NaN.
                    # min(s, 80): overflow guard, see the level-2 branch.
                    e = jnp.exp(_guard(s) - 30.0)
                    probs = (e / (jnp.sum(e, axis=-1, keepdims=True)
                                  + 1e-37)).astype(dt)
                else:
                    probs = jax.nn.softmax(s, axis=-1).astype(dt)
                o = lax.dot_general(
                    probs, v, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
            attn_scratch[:, :, h * hd:(h + 1) * hd] = o.astype(dt)
        # in-kernel output projection, one matmul over the window batch
        out = jnp.dot(
            attn_scratch[:].reshape(bw * t, c), wproj_ref[:],
            preferred_element_type=jnp.float32,
        ).astype(dt) + bproj_ref[0]
        out_ref[:] = out.reshape(bw, t, c).astype(out_dtype)

    return body


@lru_cache(maxsize=None)
def _build_call(bnw: int, t: int, c: int, nh: int, shifted: bool,
                nwh: int, nww: int, in_dtype_str: str, out_dtype_str: str,
                interpret: bool, attn_f32: bool = True):
    out_dtype = jnp.dtype(out_dtype_str)
    itemsize = jnp.dtype(in_dtype_str).itemsize
    bw = _pick_bw(bnw, t, c, nh, itemsize, 4 if attn_f32 else itemsize)
    body = _kernel_body(nh, t, c, bw, shifted, nwh, nww, out_dtype, attn_f32)
    hd = c // nh
    n_inst = bnw // bw
    call = pl.pallas_call(
        body,
        grid=(n_inst,),
        in_specs=[
            pl.BlockSpec((bw, t, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # x windows
            pl.BlockSpec((c, 3 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # Wqkv
            pl.BlockSpec((1, 3 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # bqkv
            pl.BlockSpec((c, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # Wproj
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # bproj
            pl.BlockSpec((nh, t, t), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, t, t), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bw, t, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bnw, t, c), out_dtype),
        scratch_shapes=[pltpu.VMEM((bw, t, c), jnp.dtype(in_dtype_str))],
        cost_estimate=pl.CostEstimate(
            flops=bnw * (4 * nh * t * t * hd + 2 * t * c * 4 * c),
            bytes_accessed=bnw * t * 2 * c * itemsize + 4 * c * c * itemsize,
            transcendentals=bnw * nh * t * t,
        ),
        interpret=interpret,
    )
    return call


@lru_cache(maxsize=None)
def _full_shift_mask(ws: int, ss: int, nwh: int, nww: int) -> np.ndarray:
    """(nW, T, T) additive mask assembled from the 4-pattern bank — the
    dense per-window mask the XLA recompute path adds (identical to what
    the kernel selects per window from its grid position)."""
    bank = shift_mask_bank(ws, ss)
    t = ws * ws
    out = np.zeros((nwh * nww, t, t), np.float32)
    for wi in range(nwh):
        for wj in range(nww):
            out[wi * nww + wj] = bank[(wi == nwh - 1) * 2 + (wj == nww - 1)]
    return out


def _xla_forward(x, wqkv, bqkv, wproj, bproj, bias, *, num_heads, shifted,
                 window_size, shift_size, grid_hw, out_dtype, attn_f32=True):
    """XLA twin of the kernel with matching numerics (acc_t score
    accumulate — f32 unless attn_f32=False, the model's opt-in speed knob —
    compute-dtype probs/PV, TorchLinear epilogues) — differentiated by the
    custom VJP's backward."""
    bnw, t, c = x.shape
    nh = num_heads
    hd = c // nh
    dt = x.dtype
    acc_t = jnp.float32 if attn_f32 else dt
    qkv = jnp.dot(x, wqkv.astype(dt),
                  preferred_element_type=jnp.float32).astype(dt)
    qkv = qkv + bqkv.astype(dt)[None, None]
    qkv = qkv.reshape(bnw, t, 3, nh, hd)
    q, k, v = (jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3))
    s = jnp.einsum("bhtd,bhsd->bhts", q * (hd ** -0.5), k,
                   preferred_element_type=acc_t)
    s = s + bias.astype(acc_t)[None]
    if shifted:
        nwh, nww = grid_hw
        mask = jnp.asarray(
            _full_shift_mask(window_size, shift_size, nwh, nww), acc_t)
        s = s.reshape(-1, nwh * nww, nh, t, t) + mask[None, :, None]
        s = s.reshape(bnw, nh, t, t)
    probs = jax.nn.softmax(s, axis=-1).astype(dt)
    o = jnp.einsum("bhts,bhsd->bhtd", probs, v,
                   preferred_element_type=acc_t).astype(dt)
    o = jnp.transpose(o, (0, 2, 1, 3)).reshape(bnw, t, c)
    out = jnp.dot(o, wproj.astype(dt),
                  preferred_element_type=jnp.float32).astype(dt)
    out = out + bproj.astype(dt)[None, None]
    return out.astype(out_dtype)


def _kernel_call(x, wqkv, bqkv, wproj, bproj, bias, *, num_heads,
                 window_size, shift_size, grid_hw, out_dtype, interpret,
                 attn_f32=True):
    bnw, t, c = x.shape
    shifted = shift_size > 0
    mask = jnp.asarray(
        shift_mask_patterns(window_size, shift_size if shifted else 1))
    call = _build_call(bnw, t, c, num_heads, shifted, grid_hw[0], grid_hw[1],
                       str(x.dtype), str(jnp.dtype(out_dtype)), interpret,
                       attn_f32)
    dt = x.dtype
    return call(x, wqkv.astype(dt), bqkv.reshape(1, 3 * c).astype(dt),
                wproj.astype(dt), bproj.reshape(1, c).astype(dt),
                bias.astype(jnp.float32 if attn_f32 else dt), mask)


def _pick_bw_bwd(bnw: int, t: int, c: int, nh: int, itemsize: int,
                 acc: int = 4) -> int:
    """Window-batch size for the backward kernel (0 = does not fit VMEM).

    Fixed residents: Wqkv/Wproj (compute dtype), their f32 grads, bias +
    its f32 grad, the 4-pattern mask bank; per-window: x/g/dx blocks
    (double-buffered) and the f32 dqkv scratch. ``acc`` is the score
    recompute itemsize (4 for attn_f32, compute itemsize otherwise)."""
    t_pad = -(-t // 128) * 128
    fixed = (4 * c * c * itemsize            # Wqkv + Wproj resident
             + 4 * c * c * 4                 # dWqkv + dWproj (f32)
             + 2 * nh * t * t * 4            # bias + dbias (f32)
             + 4 * t * t * 4                 # mask bank
             + t * 3 * c * 4                 # dqkv scratch (f32)
             + t * c * itemsize              # o scratch
             + 2 * nh * t * t_pad * acc)     # live score tiles
    for bw in (8, 4, 2, 1):
        if bnw % bw or bw * nh > 32:
            continue
        per = bw * t * 3 * c * itemsize * 2  # x + g + dx, double-buffered
        if fixed + per <= 13 * (1 << 20):
            return bw
    return 0


def _bwd_kernel_body(nh: int, t: int, c: int, bw: int, shifted: bool,
                     nwh: int, nww: int, dt, attn_f32: bool = True):
    hd = c // nh
    scale = hd ** -0.5
    # attn_f32=False: scores/probs recompute in the compute dtype (matching
    # the forward); the softmax-backward algebra and every weight-grad
    # accumulator stay f32 (p promotes where it meets f32 dp/ds).
    acc_t = jnp.float32 if attn_f32 else jnp.dtype(dt)

    def body(x_ref, g_ref, wqkv_ref, bqkv_ref, wproj_ref, bias_ref, mask_ref,
             dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref, dbias_ref,
             dqkv_scr, o_scr):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
            dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
            dwproj_ref[:] = jnp.zeros_like(dwproj_ref)
            dbproj_ref[:] = jnp.zeros_like(dbproj_ref)
            dbias_ref[:] = jnp.zeros_like(dbias_ref)

        for w in range(bw):
            x = x_ref[w]
            g = g_ref[w].astype(dt)
            # recompute qkv exactly as the forward (f32 accum -> dt -> +b)
            qkv = jnp.dot(
                x, wqkv_ref[:], preferred_element_type=jnp.float32
            ).astype(dt) + bqkv_ref[0]
            if shifted:
                widx = (i * bw + w) % (nwh * nww)
                li = (widx // nww == nwh - 1).astype(jnp.int32)
                lj = (widx % nww == nww - 1).astype(jnp.int32)
                msel = mask_ref[li * 2 + lj].astype(acc_t)  # (T, T)
            # dbproj = sum_t g ; do = g @ Wproj^T
            dbproj_ref[0] += jnp.sum(g.astype(jnp.float32), axis=0)
            do = lax.dot_general(
                g, wproj_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)  # (T, C)
            for h in range(nh):
                q = qkv[:, h * hd:(h + 1) * hd]
                k = qkv[:, c + h * hd:c + (h + 1) * hd]
                v = qkv[:, 2 * c + h * hd:2 * c + (h + 1) * hd]
                s = lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(acc_t) * scale
                s = s + bias_ref[h].astype(acc_t)
                if shifted:
                    s = s + msel
                if not attn_f32:
                    # bf16 scores: per-row max shift (the f32 static-shift
                    # trick is invalid in bf16 — see the forward body)
                    m = jnp.max(s, axis=-1, keepdims=True)
                    e = jnp.exp(s - m)
                    p = e / (jnp.sum(e, axis=-1, keepdims=True) + 1e-37)
                elif _FAST_SOFTMAX:
                    # static-shift softmax (see module note): same
                    # pass-elimination win as the forward; the softmax
                    # backward algebra below needs explicit normalized p,
                    # so the deferred-normalization trick stays fwd-only.
                    # min(s, 80) overflow guard as in the forward: a score
                    # spike under training dynamics stays finite instead of
                    # NaN-ing the gradients (the clamp's own derivative is
                    # ignored — exact whenever no clamping occurs, which is
                    # every realistic step; a clamped row's grad is that of
                    # the flattened-over-clamped-entries softmax, finite
                    # and well-scaled).
                    e = jnp.exp(_guard(s) - 30.0)
                    p = e / (jnp.sum(e, axis=-1, keepdims=True) + 1e-37)
                else:
                    p = jax.nn.softmax(s, axis=-1)      # acc_t (T, T)
                pc = p.astype(dt)
                o_scr[:, h * hd:(h + 1) * hd] = lax.dot_general(
                    pc, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dt)
                do_h = do[:, h * hd:(h + 1) * hd]
                # dv = pc^T @ do_h
                dqkv_scr[:, 2 * c + h * hd:2 * c + (h + 1) * hd] = (
                    lax.dot_general(pc, do_h, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32))
                # softmax backward in f32
                dp = lax.dot_general(do_h, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
                ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                dbias_ref[h] += ds
                dqkv_scr[:, h * hd:(h + 1) * hd] = lax.dot_general(
                    ds, k, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                dqkv_scr[:, c + h * hd:c + (h + 1) * hd] = lax.dot_general(
                    ds, q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
            # dWproj += o^T @ g ; o was rebuilt per head above
            dwproj_ref[:] += lax.dot_general(
                o_scr[:], g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dqkv = dqkv_scr[:]
            dbqkv_ref[0] += jnp.sum(dqkv, axis=0)
            dwqkv_ref[:] += lax.dot_general(
                x, dqkv.astype(dt), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dx_ref[w] = lax.dot_general(
                dqkv.astype(dt), wqkv_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)

    return body


@lru_cache(maxsize=None)
def _build_bwd_call(bnw: int, t: int, c: int, nh: int, shifted: bool,
                    nwh: int, nww: int, in_dtype_str: str, interpret: bool,
                    attn_f32: bool = True):
    dt = jnp.dtype(in_dtype_str)
    itemsize = dt.itemsize
    bw = _pick_bw_bwd(bnw, t, c, nh, itemsize, 4 if attn_f32 else itemsize)
    if bw == 0:
        return None
    body = _bwd_kernel_body(nh, t, c, bw, shifted, nwh, nww, dt, attn_f32)
    rep = lambda i: (0, 0)
    rep3 = lambda i: (0, 0, 0)
    call = pl.pallas_call(
        body,
        grid=(bnw // bw,),
        in_specs=[
            pl.BlockSpec((bw, t, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((bw, t, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # g
            pl.BlockSpec((c, 3 * c), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * c), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, t, t), rep3, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, t, t), rep3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bw, t, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),           # dx
            pl.BlockSpec((c, 3 * c), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * c), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, t, t), rep3, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bnw, t, c), dt),
            jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((nh, t, t), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((t, 3 * c), jnp.float32),  # dqkv
            pltpu.VMEM((t, c), dt),               # o (pre-projection)
        ],
        cost_estimate=pl.CostEstimate(
            flops=bnw * (10 * nh * t * t * (c // nh) + 6 * t * c * 4 * c),
            bytes_accessed=bnw * t * 3 * c * itemsize,
            transcendentals=bnw * nh * t * t,
        ),
        interpret=interpret,
    )
    return call


def _pick_hc_bwd(bnw: int, t: int, c: int, nh: int, itemsize: int,
                 acc: int = 4) -> tuple[int, int]:
    """(head-chunk size, window-batch size) for the HEAD-CHUNKED backward,
    or (0, 0) when nothing fits. Prefers the largest head chunk (fewer dx
    partials in HBM), then the largest window batch. Per chunk the VMEM
    residents scale with hc instead of nh — that is what lets C=512/1024
    (swin stages 3-4) run the Pallas backward at all."""
    hd = c // nh
    t_pad = -(-t // 128) * 128
    budget = int(15.5 * (1 << 20))
    for hc in (32, 16, 8, 4, 2, 1):
        if hc > nh or nh % hc:
            continue
        hch = hc * hd
        if hch % 128:  # lane alignment of the (3, C, hch) weight chunks
            continue
        # Mosaic DOUBLE-BUFFERS every block whose index map varies over the
        # grid — here that is all the j-sliced weight/bias chunks AND their
        # grads, hence the x2 factors (stage-4 hc=8 measured ~18 MB under
        # this accounting and indeed failed the on-chip compile before the
        # x2 was modeled; hc=4 compiles).
        fixed = (2 * 3 * c * hch * itemsize  # Wq/Wk/Wv column chunk (x2)
                 + 2 * 3 * c * hch * 4       # its f32 grad (x2)
                 + 2 * hch * c * itemsize    # Wproj row chunk (x2)
                 + 2 * hch * c * 4           # its f32 grad (x2)
                 + 4 * hc * t * t * 4        # bias + dbias chunk (f32, x2)
                 + 4 * t * t * 4             # mask bank (constant block)
                 + t * 3 * hch * 4           # dqkv scratch (f32)
                 + t * hch * itemsize        # o scratch
                 + t * hch * 4               # do chunk (f32 accum)
                 + 2 * hc * t * t_pad * acc)  # live score tiles
        for bw in (8, 4, 2, 1):
            if bnw % bw or bw * hc > 32:
                continue
            # x + g in blocks + dxp out block, each double-buffered
            per = bw * t * c * itemsize * 6
            if fixed + per <= budget:
                return hc, bw
    return 0, 0


def _bwd_chunked_body(nh: int, hc: int, t: int, c: int, bw: int,
                      shifted: bool, nwh: int, nww: int, dt,
                      attn_f32: bool = True):
    """Head-chunked backward: grid (nh//hc, bnw//bw), head chunk OUTER so
    the chunk's weight/bias grads stay VMEM-resident and accumulate across
    the window dimension (the inner, fastest grid axis). dx cannot
    accumulate across head chunks (its block is revisited non-consecutively
    there), so it is emitted as (nh//hc) partials summed by XLA. The
    output-projection math is sliced by Wproj ROWS (= attention feature
    columns), so no flops are duplicated across chunks."""
    hd = c // nh
    hch = hc * hd
    scale = hd ** -0.5
    acc_t = jnp.float32 if attn_f32 else jnp.dtype(dt)

    def body(x_ref, g_ref, wq3_ref, bq3_ref, wproj_ref, bias_ref, mask_ref,
             dxp_ref, dwq3_ref, dbq3_ref, dwproj_ref, dbproj_ref, dbias_ref,
             dqkv_scr, o_scr):
        j = pl.program_id(0)
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _init_chunk():
            dwq3_ref[:] = jnp.zeros_like(dwq3_ref)
            dbq3_ref[:] = jnp.zeros_like(dbq3_ref)
            dwproj_ref[:] = jnp.zeros_like(dwproj_ref)
            dbias_ref[:] = jnp.zeros_like(dbias_ref)

        @pl.when((i == 0) & (j == 0))
        def _init_global():
            dbproj_ref[:] = jnp.zeros_like(dbproj_ref)

        for w in range(bw):
            x = x_ref[w]
            g = g_ref[w].astype(dt)
            # chunk's q/k/v: x @ Wq3[s] (f32 accum -> dt -> +b), exactly the
            # forward's TorchLinear epilogue restricted to hch columns
            qs, ks, vs = (
                jnp.dot(x, wq3_ref[s], preferred_element_type=jnp.float32)
                .astype(dt) + bq3_ref[s]
                for s in range(3)
            )
            if shifted:
                widx = (i * bw + w) % (nwh * nww)
                li = (widx // nww == nwh - 1).astype(jnp.int32)
                lj = (widx % nww == nww - 1).astype(jnp.int32)
                msel = mask_ref[li * 2 + lj].astype(acc_t)  # (T, T)
            gf = g.astype(jnp.float32)

            @pl.when(j == 0)
            def _dbproj():
                dbproj_ref[0] += jnp.sum(gf, axis=0)

            # do chunk (T, hch): g @ Wproj_rows^T — this chunk's slice of
            # the full do = g @ Wproj^T (do columns are Wproj rows)
            do_c = lax.dot_general(
                g, wproj_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)
            for h in range(hc):
                q = qs[:, h * hd:(h + 1) * hd]
                k = ks[:, h * hd:(h + 1) * hd]
                v = vs[:, h * hd:(h + 1) * hd]
                s = lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(acc_t) * scale
                s = s + bias_ref[h].astype(acc_t)
                if shifted:
                    s = s + msel
                if not attn_f32:
                    m = jnp.max(s, axis=-1, keepdims=True)
                    e = jnp.exp(s - m)
                    p = e / (jnp.sum(e, axis=-1, keepdims=True) + 1e-37)
                elif _FAST_SOFTMAX:
                    e = jnp.exp(_guard(s) - 30.0)
                    p = e / (jnp.sum(e, axis=-1, keepdims=True) + 1e-37)
                else:
                    p = jax.nn.softmax(s, axis=-1)
                pc = p.astype(dt)
                o_scr[:, h * hd:(h + 1) * hd] = lax.dot_general(
                    pc, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dt)
                do_h = do_c[:, h * hd:(h + 1) * hd]
                dqkv_scr[:, 2 * hch + h * hd:2 * hch + (h + 1) * hd] = (
                    lax.dot_general(pc, do_h, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32))
                dp = lax.dot_general(do_h, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
                ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                dbias_ref[h] += ds
                dqkv_scr[:, h * hd:(h + 1) * hd] = lax.dot_general(
                    ds, k, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                dqkv_scr[:, hch + h * hd:hch + (h + 1) * hd] = lax.dot_general(
                    ds, q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
            # dWproj rows for this chunk: o_chunk^T @ g
            dwproj_ref[:] += lax.dot_general(
                o_scr[:], g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dqkv = dqkv_scr[:]
            dxw = None
            for s_i in range(3):
                sl = dqkv[:, s_i * hch:(s_i + 1) * hch]
                dbq3_ref[s_i] += jnp.sum(sl, axis=0)
                dwq3_ref[s_i] += lax.dot_general(
                    x, sl.astype(dt), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                part = lax.dot_general(
                    sl.astype(dt), wq3_ref[s_i], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dxw = part if dxw is None else dxw + part
            dxp_ref[0, w] = dxw.astype(dt)

    return body


@lru_cache(maxsize=None)
def _build_bwd_chunked_call(bnw: int, t: int, c: int, nh: int, shifted: bool,
                            nwh: int, nww: int, in_dtype_str: str,
                            interpret: bool, attn_f32: bool = True):
    dt = jnp.dtype(in_dtype_str)
    itemsize = dt.itemsize
    hc, bw = _pick_hc_bwd(bnw, t, c, nh, itemsize,
                          4 if attn_f32 else itemsize)
    if hc == 0:
        return None
    nhc = nh // hc
    hch = hc * (c // nh)
    body = _bwd_chunked_body(nh, hc, t, c, bw, shifted, nwh, nww, dt,
                             attn_f32)
    call = pl.pallas_call(
        body,
        grid=(nhc, bnw // bw),
        in_specs=[
            pl.BlockSpec((bw, t, c), lambda j, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((bw, t, c), lambda j, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # g
            pl.BlockSpec((3, c, hch), lambda j, i: (0, 0, j),
                         memory_space=pltpu.VMEM),  # Wq/Wk/Wv chunk
            pl.BlockSpec((3, hch), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),  # bq/bk/bv chunk
            pl.BlockSpec((hch, c), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),  # Wproj row chunk
            pl.BlockSpec((hc, t, t), lambda j, i: (j, 0, 0),
                         memory_space=pltpu.VMEM),  # bias chunk
            pl.BlockSpec((4, t, t), lambda j, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # mask bank
        ],
        out_specs=[
            pl.BlockSpec((1, bw, t, c), lambda j, i: (j, i, 0, 0),
                         memory_space=pltpu.VMEM),  # dx partials
            pl.BlockSpec((3, c, hch), lambda j, i: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, hch), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hch, c), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hc, t, t), lambda j, i: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nhc, bnw, t, c), dt),
            jax.ShapeDtypeStruct((3, c, c), jnp.float32),
            jax.ShapeDtypeStruct((3, c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((nh, t, t), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((t, 3 * hch), jnp.float32),  # dqkv chunk
            pltpu.VMEM((t, hch), dt),               # o chunk
        ],
        cost_estimate=pl.CostEstimate(
            flops=bnw * (10 * nh * t * t * (c // nh) + 6 * t * c * 4 * c),
            bytes_accessed=(nh // hc) * bnw * t * c * itemsize * 4,
            transcendentals=bnw * nh * t * t,
        ),
        interpret=interpret,
    )
    return call, nhc


def _probe_compiles(call, arg_avals) -> bool:
    """AOT-compile the pallas_call alone against abstract inputs; True if
    the backend accepts it. The VMEM pickers model Mosaic's accounting
    analytically (incl. its double-buffering of grid-varying blocks) and
    are validated at every swin-base geometry, but an unmodeled user
    geometry must degrade to the XLA twin instead of failing the CALLER's
    whole train-step compile with an opaque remote-compile error. Probes
    run once per geometry (the builders are lru_cached) and land in the
    persistent compile cache. Inputs are fed from an op, not entry params
    — entry-param feeding over-reports scoped-VMEM pressure (round-3
    gotcha), making the probe falsely conservative."""
    try:
        def f(*args):
            return call(args[0] + args[1].astype(args[0].dtype), *args[1:])

        jax.jit(f).lower(*arg_avals).compile()
        return True
    except Exception as e:  # noqa: BLE001 — any compile failure means "next"
        # Log the cause: a VMEM rejection is expected gating, but a
        # transient backend/RPC error here demotes this geometry for the
        # PROCESS lifetime (the builders are lru-cached) — the message is
        # the only way to tell the two apart post hoc.
        import logging

        logging.getLogger(__name__).warning(
            "attention-backward kernel probe failed for shape %s (%s: %s)"
            " — falling back to the next variant for this process",
            tuple(a.shape for a in arg_avals[:1]), type(e).__name__,
            str(e)[:300])
        return False


def _bwd_probe_avals(bnw, t, c, nh, dt, chunked: bool):
    sds = jax.ShapeDtypeStruct
    if chunked:
        return (sds((bnw, t, c), dt), sds((bnw, t, c), dt),
                sds((3, c, c), dt), sds((3, c), dt), sds((c, c), dt),
                sds((nh, t, t), jnp.float32), sds((4, t, t), jnp.float32))
    return (sds((bnw, t, c), dt), sds((bnw, t, c), dt),
            sds((c, 3 * c), dt), sds((1, 3 * c), dt), sds((c, c), dt),
            sds((nh, t, t), jnp.float32), sds((4, t, t), jnp.float32))


@lru_cache(maxsize=None)
def _bwd_call_validated(bnw: int, t: int, c: int, nh: int, shifted: bool,
                        nwh: int, nww: int, in_dtype_str: str,
                        interpret: bool, attn_f32: bool):
    """(kind, call) with kind in {"mono", "chunked"} — the first backward
    kernel whose compile the backend accepts — or None. In interpret mode
    (CPU tests) the analytic pickers are trusted as-is."""
    dt = jnp.dtype(in_dtype_str)
    call = _build_bwd_call(bnw, t, c, nh, shifted, nwh, nww, in_dtype_str,
                           interpret, attn_f32)
    if call is not None and (
            interpret or _probe_compiles(
                call, _bwd_probe_avals(bnw, t, c, nh, dt, chunked=False))):
        return "mono", call
    built = _build_bwd_chunked_call(bnw, t, c, nh, shifted, nwh, nww,
                                    in_dtype_str, interpret, attn_f32)
    if built is not None:
        ccall, _ = built
        if interpret or _probe_compiles(
                ccall, _bwd_probe_avals(bnw, t, c, nh, dt, chunked=True)):
            return "chunked", ccall
    return None


def _kernel_bwd(res, g, *, num_heads, window_size, shift_size, grid_hw,
                interpret, attn_f32=True):
    """Pallas backward; returns None when no kernel geometry fits VMEM or
    passes the compile probe. Tries the monolithic kernel first (all heads
    resident, dx written once), then the head-chunked variant (stages 3-4,
    C=512/1024)."""
    x, wqkv, bqkv, wproj, bproj, bias = res
    bnw, t, c = x.shape
    shifted = shift_size > 0
    dt = x.dtype
    picked = _bwd_call_validated(bnw, t, c, num_heads, shifted,
                                 grid_hw[0], grid_hw[1], str(x.dtype),
                                 interpret, attn_f32)
    if picked is None:
        return None
    kind, call = picked
    if kind == "mono":
        mask = jnp.asarray(
            shift_mask_bank(window_size, shift_size if shifted else 1))
        dx, dwqkv, dbqkv, dwproj, dbproj, dbias = call(
            x, g.astype(dt), wqkv.astype(dt),
            bqkv.reshape(1, 3 * c).astype(dt),
            wproj.astype(dt), bias.astype(jnp.float32), mask)
        return (dx,
                dwqkv.astype(wqkv.dtype),
                dbqkv.reshape(3 * c).astype(bqkv.dtype),
                dwproj.astype(wproj.dtype),
                dbproj.reshape(c).astype(bproj.dtype),
                dbias.astype(bias.dtype))
    mask = jnp.asarray(
        shift_mask_bank(window_size, shift_size if shifted else 1))
    # Wqkv (C, 3C) columns are [q | k | v]: reorganize to (3, C, C) so a
    # BlockSpec can slice one head chunk of all three at once
    wq3 = wqkv.astype(dt).reshape(c, 3, c).transpose(1, 0, 2)
    bq3 = bqkv.reshape(3, c).astype(dt)
    dxp, dwq3, dbq3, dwproj, dbproj, dbias = call(
        x, g.astype(dt), wq3, bq3, wproj.astype(dt),
        bias.astype(jnp.float32), mask)
    dx = jnp.sum(dxp.astype(jnp.float32), axis=0).astype(dt)
    dwqkv = jnp.transpose(dwq3, (1, 0, 2)).reshape(c, 3 * c)
    return (dx,
            dwqkv.astype(wqkv.dtype),
            dbq3.reshape(3 * c).astype(bqkv.dtype),
            dwproj.astype(wproj.dtype),
            dbproj.reshape(c).astype(bproj.dtype),
            dbias.astype(bias.dtype))


@lru_cache(maxsize=None)
def _vjp_fn(num_heads, window_size, shift_size, nwh, nww, out_dtype_str,
            interpret, attn_f32=True):
    statics = dict(num_heads=num_heads, window_size=window_size,
                   shift_size=shift_size, grid_hw=(nwh, nww),
                   out_dtype=jnp.dtype(out_dtype_str), attn_f32=attn_f32)

    @jax.custom_vjp
    def f(x, wqkv, bqkv, wproj, bproj, bias):
        return _kernel_call(x, wqkv, bqkv, wproj, bproj, bias,
                            interpret=interpret, **statics)

    def f_fwd(x, wqkv, bqkv, wproj, bproj, bias):
        # flash-style: save only the raw inputs; scores are recomputed
        return f(x, wqkv, bqkv, wproj, bproj, bias), (
            x, wqkv, bqkv, wproj, bproj, bias
        )

    def f_bwd(res, g):
        # FLAIR_ATTN_BWD=xla opts out of the Pallas backward (falls back to
        # the XLA-recompute twin); read at trace time, not import time
        if _os.getenv("FLAIR_ATTN_BWD", "kernel") != "xla":
            grads = _kernel_bwd(res, g, num_heads=num_heads,
                                window_size=window_size,
                                shift_size=shift_size,
                                grid_hw=(nwh, nww), interpret=interpret,
                                attn_f32=attn_f32)
            if grads is not None:
                return grads
        # geometry too wide for the backward kernel's VMEM budget
        # (swin stage 4): XLA-recompute twin, numerics-matched
        ref = partial(_xla_forward, shifted=shift_size > 0, **statics)
        _, pullback = jax.vjp(ref, *res)
        return pullback(g)

    f.defvjp(f_fwd, f_bwd)
    return f


def fused_window_attention(x: jax.Array, wqkv, bqkv, wproj, bproj,
                           bias: jax.Array, *,
                           num_heads: int, window_size: int, shift_size: int,
                           grid_hw: tuple[int, int],
                           out_dtype=None, interpret: bool | None = None,
                           attn_f32: bool = True) -> jax.Array:
    """Windowed MHA (qkv projection -> attention -> output projection) over
    partitioned feature windows, weights VMEM-resident. Differentiable: the
    custom VJP recomputes through the XLA twin (see module docstring).

    x: (B*nW, T, C) from window_partition (already cyclic-shifted when
    shift_size > 0, windows in row-major (wi, wj) order per image).
    wqkv/bqkv/wproj/bproj: TorchLinear params. bias: (nh, T, T) float32
    relative-position bias (gathered from the table). grid_hw: (nwh, nww)
    padded window grid, for mask selection. attn_f32=False is the model's
    opt-in speed knob (swin.py:WindowAttention.attn_f32): scores/softmax in
    the compute dtype instead of f32, forward and backward recompute alike.
    Returns (B*nW, T, C).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    out_dtype = out_dtype or x.dtype
    f = _vjp_fn(num_heads, window_size, shift_size, grid_hw[0], grid_hw[1],
                str(jnp.dtype(out_dtype)), interpret, attn_f32)
    return f(x, wqkv, bqkv, wproj, bproj, bias)


def supports(c: int, num_heads: int, ws: int) -> bool:
    """Shape gate: lane-aligned channels and (8,128)-tileable windows."""
    t = ws * ws
    return (c % num_heads == 0 and c % 128 == 0 and t % 8 == 0)
