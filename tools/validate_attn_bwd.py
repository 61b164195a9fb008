"""Validate the Pallas window-attention BACKWARD kernel on the real TPU.

For each swin-base @512px stage geometry that fits the backward's VMEM
budget: run jax.vjp through fused_window_attention (Pallas fwd + Pallas
bwd) vs jax.vjp through the numerics-matched XLA twin, report per-grad
max-abs / median-rel error, then time a full value_and_grad over an
18-block stage-3 stack with FLAIR_ATTN_BWD=kernel vs =xla for the wall
delta the kernel backward buys.

Usage: python tools/validate_attn_bwd.py
"""
import json
import os
import sys
import time
from functools import partial

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".tmp", "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from flair_for_aigle_tpu.ops.pallas import window_attn as wa
from flair_for_aigle_tpu.models.swin import SwinBlock

B = int(os.getenv("PB", "8"))
# VAF32=0: run the parity sweep with attn_f32=False (bf16 scores/softmax
# in both kernels — the train-speed knob's backward numerics on-chip)
VAF32 = os.getenv("VAF32", "1") == "1"
WS = 12
# (nwh*nww windows per image, C, nh) swin-base @512px padded grids
STAGES = [
    ("stage1", 11 * 11, 128, 4),
    ("stage2", 6 * 6, 256, 8),
    ("stage3", 3 * 3, 512, 16),
    ("stage4", 2 * 2, 1024, 32),
]


def parity(name, nw, c, nh, shift):
    t = WS * WS
    nwh = nww = int(round(nw ** 0.5))
    bnw = 2 * nw
    acc = 4 if VAF32 else 2
    mono_bw = wa._pick_bw_bwd(bnw, t, c, nh, 2, acc)
    hc, _cbw = wa._pick_hc_bwd(bnw, t, c, nh, 2, acc)
    if mono_bw == 0 and hc == 0:
        return {"skipped": "VMEM gate (XLA fallback path)"}
    variant = "monolithic" if mono_bw else f"chunked hc={hc} bw={_cbw}"
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    args = (
        jnp.asarray(rng.normal(size=(bnw, t, c)), dt),
        jnp.asarray(rng.normal(size=(c, 3 * c)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(3 * c,)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(c, c)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(c,)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(nh, t, t)) * 0.5, jnp.float32),
    )
    g = jnp.asarray(rng.normal(size=(bnw, t, c)), dt)
    kw = dict(num_heads=nh, window_size=WS, shift_size=WS // 2 if shift else 0,
              grid_hw=(nwh, nww), attn_f32=VAF32)

    def grads(mode):
        os.environ["FLAIR_ATTN_BWD"] = mode

        def f(*a):
            return (fused(*a).astype(jnp.float32) * g.astype(jnp.float32)).sum()

        fused = partial(wa.fused_window_attention, **kw)
        return jax.jit(jax.grad(f, argnums=tuple(range(6))))(*args)

    got = grads("kernel")
    want = grads("xla")
    os.environ.pop("FLAIR_ATTN_BWD", None)
    out = {"variant": variant}
    for nm, a, b in zip(("dx", "dwqkv", "dbqkv", "dwproj", "dbproj", "dbias"),
                        got, want):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        err = np.abs(a - b)
        denom = np.maximum(np.abs(b), 1e-2)
        out[nm] = {"max_abs": round(float(err.max()), 5),
                   "med_rel": round(float(np.median(err / denom)), 6)}
    return out


def stage3_train_wall(mode):
    os.environ["FLAIR_ATTN_BWD"] = mode

    class Stage(nn.Module):
        @nn.compact
        def __call__(self, y):
            for j in range(18):
                y = SwinBlock(dim=512, num_heads=16, window_size=WS,
                              shift=(j % 2 == 1), attn_f32=False,
                              name=f"blocks.{j}")(y)
            return y

    m = Stage()
    xs = jax.device_put(np.random.default_rng(0)
                        .standard_normal((B, 32, 32, 512), np.float32)
                        .astype("bfloat16"))
    vs = jax.jit(m.init)(jax.random.PRNGKey(0), xs)

    def loss(v, x):
        o = m.apply(v, x).astype(jnp.float32)
        return jnp.mean(o * o)

    step = jax.jit(jax.value_and_grad(loss))

    def run(k):
        for _ in range(k):
            l, gr = step(vs, xs)
        float(l)

    run(2)
    t0 = time.perf_counter(); run(2); t2 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(12); tn = time.perf_counter() - t0
    os.environ.pop("FLAIR_ATTN_BWD", None)
    return round((tn - t2) / 10 * 1e3, 1)


def main():
    for name, nw, c, nh in STAGES:
        for shift in (False, True):
            try:
                r = parity(name, nw, c, nh, shift)
            except Exception as e:
                r = {"error": str(e)[:300]}
            print(json.dumps({"stage": name, "shift": int(shift), **r}),
                  flush=True)
    for mode in ("xla", "kernel"):
        try:
            ms = stage3_train_wall(mode)
            print(json.dumps({"stage3_18blk_train_ms": ms, "bwd": mode}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"bwd": mode, "train_error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
