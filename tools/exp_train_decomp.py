"""Attribute the training-step wall (swin-base@512 bf16 batch 8, remat)
across encoder / decoder+head / optimizer by timing value_and_grad of
nested subgraphs:

  enc     — encoder stack only (mean-square loss on the stride-4 feature)
  encdec  — encoder + UPerNet decoder (no head/upsampling)
  full    — the bench train step (head + CE loss + SGD update)

Per-part cost = difference of consecutive rows. Chained dependent
dispatches; params as jit args (tunnel rules).

Usage: python tools/exp_train_decomp.py   (PB=, FLAIR_FFN_BWD=, FLAIR_ATTN_BWD=)
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
import flax.linen as nn

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".tmp", "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from flair_for_aigle_tpu.models.swin import SwinTransformerEncoder
from flair_for_aigle_tpu.models.upernet import (
    UPerNetDecoder,
    UPerNetSegmentationHead,
)

B = int(os.getenv("PB", "8"))
S = 512
NC = 19
DT = jnp.bfloat16


class Enc(nn.Module):
    @nn.compact
    def __call__(self, x):
        feats = SwinTransformerEncoder(in_channels=3, remat=True,
                                       attn_f32=False, name="enc")(x, True)
        # consume EVERY stage output — returning a single stage lets XLA
        # DCE the others and silently shifts their cost into the next
        # decomposition bucket (the r5 first run mis-attributed ~90 ms of
        # encoder stages 2-4 to the "decoder" this way)
        return sum(jnp.sum(f.astype(jnp.float32) ** 2) for f in feats[2:])


class EncDec(nn.Module):
    @nn.compact
    def __call__(self, x):
        feats = SwinTransformerEncoder(in_channels=3, remat=True,
                                       attn_f32=False, name="enc")(x, True)
        return UPerNetDecoder(name="dec")(*feats, train=True)


class Full(nn.Module):
    @nn.compact
    def __call__(self, x):
        feats = SwinTransformerEncoder(in_channels=3, remat=True,
                                       attn_f32=False, name="enc")(x, True)
        y = UPerNetDecoder(name="dec")(*feats, train=True)
        return UPerNetSegmentationHead(classes=NC, upsampling=4,
                                       name="head")(y)


def time_grad(model, with_ce=False):
    x = jnp.zeros((B, S, S, 3), DT)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    labels = jax.device_put(np.random.default_rng(1)
                            .integers(0, NC, (B, S, S)).astype(np.int32))

    def loss_fn(p, xx):
        out = model.apply({"params": p, "batch_stats": bstats}, xx,
                          mutable=["batch_stats"])[0]
        if with_ce:
            lg = out.astype(jnp.float32)
            return optax.softmax_cross_entropy_with_integer_labels(
                lg, labels).mean()
        o = out.astype(jnp.float32)
        return jnp.mean(o * o)

    step = jax.jit(jax.value_and_grad(loss_fn))
    xr = jax.device_put(np.random.default_rng(0)
                        .standard_normal((B, S, S, 3), np.float32)
                        .astype("bfloat16"))

    def run(k):
        loss = None
        for _ in range(k):
            loss, _ = step(params, xr)
        float(loss)

    run(2)
    t0 = time.perf_counter(); run(2); t2 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(8); t8 = time.perf_counter() - t0
    return round((t8 - t2) / 6 * 1e3, 1)


def main():
    rows = {}
    for name, model, ce in (("enc", Enc(), False),
                            ("encdec", EncDec(), False),
                            ("full", Full(), True)):
        rows[name] = time_grad(model, ce)
        print(json.dumps({"part": name, "train_ms": rows[name]}), flush=True)
    print(json.dumps({
        "enc_ms": rows["enc"],
        "dec_ms": round(rows["encdec"] - rows["enc"], 1),
        "head_ce_ms": round(rows["full"] - rows["encdec"], 1),
        "ffn_bwd": os.getenv("FLAIR_FFN_BWD", "kernel"),
        "attn_bwd": os.getenv("FLAIR_ATTN_BWD", "kernel"),
    }), flush=True)


if __name__ == "__main__":
    main()
