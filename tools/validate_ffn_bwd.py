"""Validate the Pallas FFN BACKWARD kernels on the real TPU.

Per swin-base@512 stage geometry: jax.vjp through fused_ln_mlp_residual
(Pallas fwd + Pallas bwd) vs jax.vjp through the numerics-matched XLA
twin, reporting per-grad max-abs / median-rel error; then a full
value_and_grad over an 18-block stage-3 SwinBlock stack with
FLAIR_FFN_BWD=kernel vs =xla for the wall delta.

Usage: python tools/validate_ffn_bwd.py
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

from flair_for_aigle_tpu.ops.pallas import ffn as ffn_mod
from flair_for_aigle_tpu.models.swin import SwinBlock

B = int(os.getenv("PB", "8"))
# (tokens per image at 512px, C) per swin-base stage; hidden = 4C
STAGES = [
    ("stage1", 128 * 128, 128),
    ("stage2", 64 * 64, 256),
    ("stage3", 32 * 32, 512),
    ("stage4", 16 * 16, 1024),
]


def parity(name, n_img, c):
    n = min(B, 2) * n_img  # cap the parity problem size
    hidden = 4 * c
    tb, hc = ffn_mod._pick_bwd(n, c, hidden, 2)
    if tb == 0:
        return {"skipped": "VMEM gate (XLA fallback path)"}
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    args = (
        jnp.asarray(rng.normal(size=(n, c)), dt),
        jnp.asarray(rng.normal(size=(n, c)), dt),
        jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1, jnp.float32),
        jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(c, hidden)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(hidden,)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(hidden, c)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(c,)) * 0.05, jnp.float32),
    )
    g = jnp.asarray(rng.normal(size=(n, c)), dt)

    def grads(mode):
        os.environ["FLAIR_FFN_BWD"] = mode
        ffn_mod._vjp_fn.cache_clear()

        def f(*a):
            return (ffn_mod.fused_ln_mlp_residual(*a).astype(jnp.float32)
                    * g.astype(jnp.float32)).sum()

        return jax.jit(jax.grad(f, argnums=tuple(range(8))))(*args)

    got = grads("kernel")
    want = grads("xla")
    os.environ.pop("FLAIR_FFN_BWD", None)
    ffn_mod._vjp_fn.cache_clear()
    out = {"pick": [tb, hc]}
    names = ("dx", "dattn", "dlns", "dlnb", "dw1", "db1", "dw2", "db2")
    for nm, a, b in zip(names, got, want):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        err = np.abs(a - b)
        denom = np.maximum(np.abs(b), 1e-2)
        out[nm] = {"max_abs": round(float(err.max()), 5),
                   "med_rel": round(float(np.median(err / denom)), 6)}
    return out


def stage3_train_wall(mode):
    os.environ["FLAIR_FFN_BWD"] = mode
    ffn_mod._vjp_fn.cache_clear()

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
    os.environ.pop("FLAIR_FFN_BWD", None)
    ffn_mod._vjp_fn.cache_clear()
    return round((tn - t2) / 10 * 1e3, 1)


def main():
    for name, n_img, c in STAGES:
        try:
            r = parity(name, n_img, c)
        except Exception as e:
            r = {"error": str(e)[:300]}
        print(json.dumps({"stage": name, **r}), flush=True)
    for mode in ("xla", "kernel", "xla"):
        try:
            ms = stage3_train_wall(mode)
            print(json.dumps({"stage3_18blk_train_ms": ms, "ffn_bwd": mode}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"ffn_bwd": mode, "train_error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
