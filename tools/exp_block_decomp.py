"""Decompose a stage-3 swin block's 1.77 ms: attn kernel vs FFN kernel vs
XLA glue (LN1 + roll + pad + partition + reverse + slice).

All tensors pass as jit ARGUMENTS (closure constants change pallas VMEM
allocation and blow the remote-compile payload). Chained dispatch timing.
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

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".tmp", "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from flair_for_aigle_tpu.models.swin import window_partition, window_reverse
from flair_for_aigle_tpu.ops.pallas.window_attn import fused_window_attention
from flair_for_aigle_tpu.ops.pallas.ffn import fused_ln_mlp_residual

import os as _os
B = int(_os.getenv("DB", "16"))
HW = int(_os.getenv("DHW", "32"))
C = int(_os.getenv("DC", "512"))
NH = int(_os.getenv("DNH", "16"))
WS = 12
DT = jnp.bfloat16
rng = np.random.default_rng(0)


def t_chain(jf, x, extra, iters=16):
    def run(k, x):
        for _ in range(k):
            x = jf(x, *extra)
        float(jnp.sum(x.reshape(-1)[:4].astype(jnp.float32)))

    run(2, x)
    t0 = time.perf_counter(); run(2, x); t2 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(iters, x); tn = time.perf_counter() - t0
    return (tn - t2) / (iters - 2) * 1e3


def main():
    hp = HW + (WS - HW % WS) % WS  # 36
    nw = (hp // WS) ** 2

    wqkv = jnp.asarray(rng.standard_normal((C, 3 * C), np.float32), DT)
    bqkv = jnp.zeros((3 * C,), DT)
    wproj = jnp.asarray(rng.standard_normal((C, C), np.float32) * .02, DT)
    bproj = jnp.zeros((C,), DT)
    bias = jnp.zeros((NH, WS * WS, WS * WS), jnp.float32)
    xw = jnp.asarray(rng.standard_normal((B * nw, WS * WS, C), np.float32),
                     DT)

    @jax.jit
    def attn_only(x, wqkv, bqkv, wproj, bproj, bias):
        # feed the kernel from an op, not entry params: bitcast-constrained
        # parameter layouts make Mosaic stage extra VMEM copies (scoped OOM)
        # that the in-model call never sees
        x = x + jnp.float32(0).astype(x.dtype)
        o = fused_window_attention(x, wqkv, bqkv, wproj, bproj, bias,
                                   num_heads=NH, window_size=WS,
                                   shift_size=0, grid_hw=(hp // WS, hp // WS))
        return o + x * jnp.float32(1e-6).astype(DT)

    ms = t_chain(attn_only, xw, (wqkv, bqkv, wproj, bproj, bias))
    print(json.dumps({"part": "attn_kernel", "ms": round(ms, 2)}), flush=True)

    ln_s = jnp.ones((C,), jnp.float32)
    ln_b = jnp.zeros((C,), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((C, 4 * C), np.float32) * .02, DT)
    b1 = jnp.zeros((4 * C,), DT)
    w2 = jnp.asarray(rng.standard_normal((4 * C, C), np.float32) * .02, DT)
    b2 = jnp.zeros((C,), DT)
    xt = jnp.asarray(rng.standard_normal((B, HW, HW, C), np.float32), DT)
    at = jnp.asarray(rng.standard_normal((B, HW, HW, C), np.float32), DT)

    @jax.jit
    def ffn_only(x, at, ln_s, ln_b, w1, b1, w2, b2):
        # feed the kernel from ops, not entry params: bitcast-constrained
        # parameter layouts make Mosaic stage extra VMEM copies (observed
        # 17.9M > 16M scoped OOM), which the in-model call never sees
        x = x + at * jnp.float32(1e-6).astype(x.dtype)
        return fused_ln_mlp_residual(x, at, ln_s, ln_b, w1, b1, w2, b2)

    ms = t_chain(ffn_only, xt, (at, ln_s, ln_b, w1, b1, w2, b2))
    print(json.dumps({"part": "ffn_kernel", "ms": round(ms, 2)}), flush=True)

    @jax.jit
    def glue_only(x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, -1, keepdims=True)
        var = jnp.var(xf, -1, keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
        y = jnp.roll(y, (-6, -6), axis=(1, 2))
        y = jnp.pad(y, ((0, 0), (0, hp - HW), (0, hp - HW), (0, 0)))
        w = window_partition(y, WS)
        y = window_reverse(w, WS, hp, hp)
        y = y[:, :HW, :HW, :]
        y = jnp.roll(y, (6, 6), axis=(1, 2))
        return x + y

    ms = t_chain(glue_only, xt, ())
    print(json.dumps({"part": "glue_xla", "ms": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
