"""Validate the fused swin prologue/epilogue kernels on the real TPU.

For each encoder stage geometry (swin-base @512px): compile SwinBlock
with FLAIR_SWIN_PREP/FINISH on, check bf16 parity vs the XLA lowering,
then time an 18-block stage-3 stack for the wall delta vs the current
production path.

Usage: FLAIR_SWIN_PREP=1 FLAIR_SWIN_FINISH=1 python tools/validate_fused_block.py
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".tmp", "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from flair_for_aigle_tpu.models.swin import SwinBlock

B = int(os.getenv("PB", "16"))
STAGES = [  # (hw, c, nh) swin-base @512px
    (128, 128, 4),
    (64, 256, 8),
    (32, 512, 16),
    (16, 1024, 32),
]


def parity(hw, c, nh):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, hw, hw, c), np.float32),
                    jnp.bfloat16)
    out = {}
    for shift in (False, True):
        kw = dict(dim=c, num_heads=nh, window_size=12, shift=shift,
                  attn_f32=False)
        ref = SwinBlock(kernel_mode="off", **kw)
        ker = SwinBlock(kernel_mode="on", **kw)
        v = jax.jit(ref.init)(jax.random.PRNGKey(0), x)
        a = np.asarray(jax.jit(ker.apply)(v, x).astype(jnp.float32))
        b = np.asarray(jax.jit(ref.apply)(v, x).astype(jnp.float32))
        err = np.abs(a - b)
        denom = np.maximum(np.abs(b), 1e-2)
        out[f"shift={int(shift)}"] = {
            "max_abs": round(float(err.max()), 5),
            "med_rel": round(float(np.median(err / denom)), 6),
        }
    return out


def stage3_wall():
    class Stage(nn.Module):
        @nn.compact
        def __call__(self, y):
            for j in range(18):
                y = SwinBlock(dim=512, num_heads=16, window_size=12,
                              shift=(j % 2 == 1), attn_f32=False,
                              name=f"blocks.{j}")(y)
            return y

    m = Stage()
    xs = jax.device_put(np.random.default_rng(0)
                        .standard_normal((B, 32, 32, 512), np.float32)
                        .astype("bfloat16"))
    vs = jax.jit(m.init)(jax.random.PRNGKey(0), xs)
    f = jax.jit(m.apply)

    def run(k, x):
        for _ in range(k):
            x = f(vs, x)
        float(jnp.sum(x[0, 0, 0, :4].astype(jnp.float32)))

    run(2, xs)
    t0 = time.perf_counter(); run(2, xs); t2 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(12, xs); tn = time.perf_counter() - t0
    return round((tn - t2) / 10 * 1e3, 1)


def main():
    flags = {k: os.getenv(k, "0") for k in
             ("FLAIR_SWIN_PREP", "FLAIR_SWIN_FINISH")}
    print(json.dumps({"flags": flags}), flush=True)
    for hw, c, nh in STAGES:
        try:
            r = parity(hw, c, nh)
            print(json.dumps({"stage": f"{hw}px_c{c}", **r}), flush=True)
        except Exception as e:
            print(json.dumps({"stage": f"{hw}px_c{c}",
                              "error": str(e)[:300]}), flush=True)
    try:
        print(json.dumps({"stage3_18blk_ms": stage3_wall()}), flush=True)
    except Exception as e:
        print(json.dumps({"stage3_error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
