"""Time the prep / attention / finish kernels individually at one swin
stage geometry (default stage-3 of swin-base@512: 32px, C=512), plus the
fully-fused block chain — isolates which fused kernel holds the remaining
per-block time (exp_block_decomp only covers attn/ffn/glue).

Env: DC (channels), DHW (feature px), DNH (heads), DB (batch), DSS (shift).
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

from flair_for_aigle_tpu.ops.pallas.prep import fused_ln_shift_partition
from flair_for_aigle_tpu.ops.pallas.finish import fused_reverse_ln_mlp_residual
from flair_for_aigle_tpu.ops.pallas.window_attn import fused_window_attention

B = int(os.getenv("DB", "16"))
HW = int(os.getenv("DHW", "32"))
C = int(os.getenv("DC", "512"))
NH = int(os.getenv("DNH", "16"))
SS = int(os.getenv("DSS", "0"))
WS = 12
DT = jnp.bfloat16
rng = np.random.default_rng(0)


def t_chain(jf, args, n_out=0, iters=16):
    """args[n_out] is the chained operand."""
    def run(k, x):
        a = list(args)
        for _ in range(k):
            a[n_out] = x
            x = jf(*a)
        float(jnp.sum(x.reshape(-1)[:4].astype(jnp.float32)))

    x0 = args[n_out]
    run(2, x0)
    t0 = time.perf_counter(); run(2, x0); t2 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(iters, x0); tn = time.perf_counter() - t0
    return (tn - t2) / (iters - 2) * 1e3


def main():
    hp = HW + (WS - HW % WS) % WS
    nwh = hp // WS
    nw = nwh * nwh
    t = WS * WS

    x = jnp.asarray(rng.standard_normal((B, HW, HW, C), np.float32), DT)
    xw = jnp.asarray(rng.standard_normal((B * nw, t, C), np.float32), DT)
    ln_s = jnp.ones((C,), jnp.float32)
    ln_b = jnp.zeros((C,), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * C), np.float32) * .02, DT)
    bqkv = jnp.zeros((3 * C,), DT)
    wproj = jnp.asarray(rng.standard_normal((C, C), np.float32) * .02, DT)
    bproj = jnp.zeros((C,), DT)
    bias = jnp.zeros((NH, t, t), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((C, 4 * C), np.float32) * .02, DT)
    b1 = jnp.zeros((4 * C,), DT)
    w2 = jnp.asarray(rng.standard_normal((4 * C, C), np.float32) * .02, DT)
    b2 = jnp.zeros((C,), DT)

    eps = jnp.float32(1e-6)

    @jax.jit
    def prep_only(x, s, b):
        x = x + eps.astype(x.dtype)  # feed from an op (layout gotcha)
        w = fused_ln_shift_partition(x, s, b, ws=WS, ss=SS)
        # chain back to raster shape cheaply (reverse + crop, one copy)
        from flair_for_aigle_tpu.models.swin import window_reverse
        return window_reverse(w, WS, hp, hp)[:, :HW, :HW, :]

    @jax.jit
    def attn_only(xw, wqkv, bqkv, wproj, bproj, bias):
        xw = xw + eps.astype(xw.dtype)
        return fused_window_attention(xw, wqkv, bqkv, wproj, bproj, bias,
                                      num_heads=NH, window_size=WS,
                                      shift_size=SS, grid_hw=(nwh, nwh))

    @jax.jit
    def finish_only(x, xw, s, b, w1, b1, w2, b2):
        x = x + eps.astype(x.dtype)
        return fused_reverse_ln_mlp_residual(xw, x, s, b, w1, b1, w2, b2,
                                             ws=WS, ss=SS)

    @jax.jit
    def full_block(x, s, b, wqkv, bqkv, wproj, bproj, bias, w1, b1, w2, b2):
        x = x + eps.astype(x.dtype)
        w = fused_ln_shift_partition(x, s, b, ws=WS, ss=SS)
        w = fused_window_attention(w, wqkv, bqkv, wproj, bproj, bias,
                                   num_heads=NH, window_size=WS,
                                   shift_size=SS, grid_hw=(nwh, nwh))
        return fused_reverse_ln_mlp_residual(w, x, s, b, w1, b1, w2, b2,
                                             ws=WS, ss=SS)

    out = {
        "geom": {"B": B, "HW": HW, "C": C, "NH": NH, "SS": SS},
        "prep_ms": round(t_chain(prep_only, [x, ln_s, ln_b]), 3),
        "attn_ms": round(
            t_chain(attn_only, [xw, wqkv, bqkv, wproj, bproj, bias]), 3),
        "finish_ms": round(
            t_chain(finish_only, [x, xw, ln_s, ln_b, w1, b1, w2, b2]), 3),
        "block_ms": round(
            t_chain(full_block,
                    [x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, bias,
                     w1, b1, w2, b2]), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
