"""Attribute the UPerNet decoder's TRAINING cost (96.7 of the 156.5 ms
bench train step after the r5 resize fixes) across its components by
timing value_and_grad of each in isolation at the real swin-base@512
batch-8 shapes.

Usage: python tools/exp_dec_decomp.py  (PB=)
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

from flair_for_aigle_tpu.models.upernet import (
    FPNBlock,
    PSPModule,
    SplitInputConvBNReLU,
    UPerNetDecoder,
)
from flair_for_aigle_tpu.ops.resize import resize_bilinear_nhwc

B = int(os.getenv("PB", "8"))
DT = jnp.bfloat16
# swin-base@512 encoder feature shapes (NHWC), stages 1-4
SHAPES = [(B, 128, 128, 128), (B, 64, 64, 256),
          (B, 32, 32, 512), (B, 16, 16, 1024)]


def feats(rng):
    return [jnp.asarray(rng.standard_normal(s, np.float32), DT)
            for s in SHAPES]


class PSPOnly(nn.Module):
    @nn.compact
    def __call__(self, f4):
        return PSPModule(256, name="psp")(f4, train=True)


class FPNOnly(nn.Module):
    @nn.compact
    def __call__(self, psp_out, f1, f2, f3):
        outs = [psp_out]
        for i, skip in ((2, f3), (1, f2), (0, f1)):
            outs.append(FPNBlock(256, name=f"fpn_stages.{i}")(
                outs[-1], skip, train=True))
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)


class TailOnly(nn.Module):
    """The 4 resizes to stride 4 + the split bottleneck."""

    @nn.compact
    def __call__(self, p0, p1, p2, p3):
        resized = [resize_bilinear_nhwc(p, 128, 128)
                   for p in (p0, p1, p2, p3)]
        return SplitInputConvBNReLU(64, 3, name="fpn_bottleneck")(
            resized, train=True)


class Full(nn.Module):
    @nn.compact
    def __call__(self, f1, f2, f3, f4):
        return UPerNetDecoder(name="dec")(None, None, f1, f2, f3, f4,
                                          train=True)


def time_grad(model, *xs):
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *xs)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    def loss_fn(p, *a):
        out = model.apply({"params": p, "batch_stats": bstats}, *a,
                          mutable=["batch_stats"])[0]
        if isinstance(out, jax.Array) and out.ndim == 0:
            return out
        return jnp.mean(out.astype(jnp.float32) ** 2)

    step = jax.jit(jax.value_and_grad(loss_fn))

    def run(k):
        loss = None
        for _ in range(k):
            loss, _ = step(params, *xs)
        float(loss)

    run(2)
    t0 = time.perf_counter(); run(2); t2 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(8); t8 = time.perf_counter() - t0
    return round((t8 - t2) / 6 * 1e3, 1)


def main():
    rng = np.random.default_rng(0)
    f1, f2, f3, f4 = feats(rng)
    psp_shape = (B, 16, 16, 256)
    pyr = [jnp.asarray(rng.standard_normal((B, r, r, 256), np.float32), DT)
           for r in (16, 32, 64, 128)]

    rows = {}
    rows["psp"] = time_grad(PSPOnly(), f4)
    print(json.dumps({"part": "psp", "ms": rows["psp"]}), flush=True)
    psp_out = jnp.asarray(rng.standard_normal(psp_shape, np.float32), DT)
    rows["fpn"] = time_grad(FPNOnly(), psp_out, f1, f2, f3)
    print(json.dumps({"part": "fpn", "ms": rows["fpn"]}), flush=True)
    rows["tail"] = time_grad(TailOnly(), *pyr)
    print(json.dumps({"part": "tail", "ms": rows["tail"]}), flush=True)
    rows["full"] = time_grad(Full(), f1, f2, f3, f4)
    print(json.dumps({"part": "full_decoder", "ms": rows["full"]}),
          flush=True)


if __name__ == "__main__":
    main()
