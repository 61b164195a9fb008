"""Experiment: stage-3 swin glue lowering variants (roll/pad) on real TPU.

Variant A = production SwinBlock (jnp.roll + jnp.pad).
Variant B = concat-based roll + lax.pad.
Times 18-block stages via chained dispatch; prints wall ms each.
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
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".tmp", "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from flair_for_aigle_tpu.models.swin import SwinBlock, WindowAttention
from flair_for_aigle_tpu.models.layers import (
    LayerNormParams,
    MLPParams,
    TorchLayerNorm,
)
from flair_for_aigle_tpu.ops.pallas import ffn as ffnk

B, HW, DIM, HEADS, DEPTH = 16, 32, 512, 16, 18
DT = jnp.bfloat16


def roll_concat(y, sh, sw):
    if sh:
        y = jnp.concatenate([y[:, sh:], y[:, :sh]], axis=1) if sh > 0 else \
            jnp.concatenate([y[:, sh:], y[:, :sh]], axis=1)
    if sw:
        y = jnp.concatenate([y[:, :, sw:], y[:, :, :sw]], axis=2)
    return y


class BlockB(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: bool

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        ss = ws // 2 if (self.shift and min(h, w) > ws) else 0
        shortcut = x
        y = TorchLayerNorm(name="norm1")(x)
        if ss:
            y = roll_concat(y, ss, ss)
        pad_h = (ws - h % ws) % ws
        pad_w = (ws - w % ws) % ws
        if pad_h or pad_w:
            y = lax.pad(y, jnp.zeros((), y.dtype),
                        ((0, 0, 0), (0, pad_h, 0), (0, pad_w, 0), (0, 0, 0)))
        y = WindowAttention(self.dim, self.num_heads, self.window_size,
                            (ws, ws), shift_size=ss, attn_f32=False,
                            kernel_mode="auto", name="attn")(y)
        if pad_h or pad_w:
            y = y[:, :h, :w, :]
        if ss:
            y = roll_concat(y, -ss, -ss)
        hidden = int(self.dim * 4.0)
        ln_s, ln_b = LayerNormParams(name="norm2")(c)
        (w1, b1), (w2, b2) = MLPParams(hidden, self.dim, name="mlp")(c)
        return ffnk.fused_ln_mlp_residual(shortcut, y, ln_s, ln_b,
                                          w1, b1, w2, b2)


def build_stage(block_cls, **kw):
    class Stage(nn.Module):
        @nn.compact
        def __call__(self, y):
            for j in range(DEPTH):
                y = block_cls(dim=DIM, num_heads=HEADS, window_size=12,
                              shift=(j % 2 == 1), name=f"blocks.{j}", **kw)(y)
            return y

    return Stage()


def wall_ms(m, vs, xs, iters=12):
    f = jax.jit(m.apply)

    def run(k, x):
        for _ in range(k):
            x = f(vs, x)
        float(jnp.sum(x[0, 0, 0, :4].astype(jnp.float32)))

    run(2, xs)
    t0 = time.perf_counter(); run(2, xs); t2 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(iters, xs); tn = time.perf_counter() - t0
    return (tn - t2) / (iters - 2) * 1e3


def main():
    xs = jax.device_put(np.random.default_rng(0)
                        .standard_normal((B, HW, HW, DIM), np.float32)
                        .astype("bfloat16"))
    key = jax.random.PRNGKey(0)

    mA = build_stage(SwinBlock, attn_f32=False, kernel_mode="auto",
                     is_training=False)
    vA = jax.jit(mA.init)(key, xs)
    tA = wall_ms(mA, vA, xs)
    print(json.dumps({"variant": "A_prod_roll_pad", "stage3_ms": round(tA, 1)}),
          flush=True)

    mB = build_stage(BlockB)
    vB = jax.jit(mB.init)(key, xs)
    tB = wall_ms(mB, vB, xs)
    print(json.dumps({"variant": "B_concat_laxpad", "stage3_ms": round(tB, 1)}),
          flush=True)
    # parity
    a = jax.jit(mA.apply)(vA, xs)
    b = jax.jit(mB.apply)(vB, xs)
    print("max_diff:", float(jnp.max(jnp.abs(
        a.astype(jnp.float32) - b.astype(jnp.float32)))))


if __name__ == "__main__":
    main()
