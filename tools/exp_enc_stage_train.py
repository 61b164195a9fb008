"""Attribute the swin encoder's TRAINING cost (~115 ms of the bench
step, tools/exp_train_decomp.py) across stages by timing value_and_grad
of each stage's full block stack at its real swin-base@512 batch-8
geometry (stage i: depth blocks on (B, H_i, W_i, C_i)).

Usage: python tools/exp_enc_stage_train.py  (PB=, REMAT=)
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

B = int(os.getenv("PB", "8"))
REMAT = bool(int(os.getenv("REMAT", "0")))
WS = 12
STAGES = [
    ("stage1", 2, 128, 128, 4),
    ("stage2", 2, 64, 256, 8),
    ("stage3", 18, 32, 512, 16),
    ("stage4", 2, 16, 1024, 32),
]


def stage_wall(depth, hw, c, nh):
    block_cls = nn.checkpoint(SwinBlock) if REMAT else SwinBlock

    class Stage(nn.Module):
        @nn.compact
        def __call__(self, y):
            for j in range(depth):
                y = block_cls(dim=c, num_heads=nh, window_size=WS,
                              shift=(j % 2 == 1), attn_f32=False,
                              name=f"blocks.{j}")(y)
            return y

    m = Stage()
    xs = jax.device_put(np.random.default_rng(0)
                        .standard_normal((B, hw, hw, c), np.float32)
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
    t0 = time.perf_counter(); run(10); tn = time.perf_counter() - t0
    return round((tn - t2) / 8 * 1e3, 1)


def main():
    total = 0.0
    for name, depth, hw, c, nh in STAGES:
        ms = stage_wall(depth, hw, c, nh)
        total += ms
        print(json.dumps({"stage": name, "blocks": depth,
                          "train_ms": ms,
                          "ms_per_block": round(ms / depth, 2)}), flush=True)
    print(json.dumps({"stages_total_ms": round(total, 1), "remat": REMAT,
                      "note": "encoder total minus this = patch embed + "
                              "merges + stage glue"}), flush=True)


if __name__ == "__main__":
    main()
