"""Time the monotemp training step on the real TPU (swin-base 512px).

Matches the round-2 bench config: batch 8, bfloat16 compute + remat,
aerial RGB only, 19 classes. The fused Pallas kernels now carry custom
VJPs (XLA-recompute backward), so the training forward runs the kernels;
set ATTN_KERNEL=off to compare against the pure-XLA lowering.

Usage: python tools/profile_train_step.py   (PB=, ATTN_F32=1, ATTN_KERNEL=)
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
import optax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".tmp", "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from flair_for_aigle_tpu.models.swin import SwinTransformerEncoder
from flair_for_aigle_tpu.models.upernet import (
    UPerNetDecoder,
    UPerNetSegmentationHead,
)
import flax.linen as nn

B = int(os.getenv("PB", "8"))
S = 512
NC = 19
DT = jnp.bfloat16
ATTN_F32 = bool(int(os.getenv("ATTN_F32", "0")))
KMODE = os.getenv("ATTN_KERNEL", "auto")
REMAT = bool(int(os.getenv("REMAT", "1")))


class Seg(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = SwinTransformerEncoder(
            in_channels=3, remat=REMAT, attn_f32=ATTN_F32,
            attn_kernel=KMODE, name="enc")(x, train=train)
        y = UPerNetDecoder(name="dec")(*feats, train=train)
        lg = UPerNetSegmentationHead(classes=NC, upsampling=4,
                                     name="head")(y)
        return lg


def main():
    model = Seg()
    x = jnp.zeros((B, S, S, 3), DT)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnums=2)(key, x, True)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    tx = optax.sgd(1e-3, momentum=0.9)
    opt_state = jax.jit(tx.init)(params)
    labels = jnp.zeros((B, S, S), jnp.int32)

    # the framework's torch-parity CE (train/losses.py): dense one-hot
    # target pick, scatter-free backward. optax's integer-label CE uses
    # take_along_axis whose backward is a scatter into (B,512,512,19) —
    # measured 33.4 vs 0.6 ms at this geometry (tools/exp_head_decomp.py),
    # and the real trainer (train/task.py) uses ours.
    from flair_for_aigle_tpu.train.losses import weighted_cross_entropy

    cls_w = jnp.ones((NC,), jnp.float32)

    def loss_fn(p, bs, x, y):
        out, mut = model.apply({"params": p, "batch_stats": bs}, x, True,
                               mutable=["batch_stats"])
        ll = weighted_cross_entropy(
            jnp.transpose(out, (0, 3, 1, 2)), y, cls_w)
        return ll, mut["batch_stats"]

    @jax.jit
    def train_step(p, bs, opt, x, y):
        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, bs, x, y)
        updates, opt = tx.update(grads, opt, p)
        p = optax.apply_updates(p, updates)
        return p, new_bs, opt, loss

    xr = jax.device_put(np.random.default_rng(0)
                        .standard_normal((B, S, S, 3), np.float32)
                        .astype("bfloat16"))
    yr = jax.device_put(np.random.default_rng(1)
                        .integers(0, NC, (B, S, S)).astype(np.int32))

    def run(k):
        nonlocal params, bstats, opt_state
        loss = None
        for _ in range(k):
            params, bstats, opt_state, loss = train_step(
                params, bstats, opt_state, xr, yr)
        float(loss)

    print("compiling ...", flush=True)
    t0 = time.perf_counter()
    run(1)
    print(f"compiled+step1 in {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    run(2)
    t2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(8)
    t8 = time.perf_counter() - t0
    per = (t8 - t2) / 6
    print(json.dumps({
        "train_step_ms": round(per * 1e3, 1),
        "img_per_s": round(B / per, 1),
        "batch": B, "attn_f32": ATTN_F32, "attn_kernel": KMODE, "remat": REMAT,
    }))


if __name__ == "__main__":
    main()
