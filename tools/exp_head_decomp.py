"""Split the segmentation head + CE training cost (33.6 ms of the bench
train step, tools/exp_train_decomp.py) into conv / x4-upsample / CE by
timing value_and_grad of nested subgraphs on a fixed (B,128,128,64) input.

Usage: python tools/exp_head_decomp.py  (PB=)
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

from flair_for_aigle_tpu.models.layers import TorchConv
from flair_for_aigle_tpu.ops.resize import resize_bilinear_ac_nhwc
from flair_for_aigle_tpu.train.losses import weighted_cross_entropy
import flax.linen as nn

B = int(os.getenv("PB", "8"))
NC = 19
DT = jnp.bfloat16


class Head(nn.Module):
    upsample: bool = False

    @nn.compact
    def __call__(self, x):
        x = TorchConv(NC, 3, 1, 1, name="0")(x)
        if self.upsample:
            x = resize_bilinear_ac_nhwc(x, 512, 512)
        return x


def time_grad(loss_kind):
    model = Head(upsample=loss_kind != "conv")
    x = jnp.zeros((B, 128, 128, 64), DT)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    labels = jax.device_put(np.random.default_rng(1)
                            .integers(0, NC, (B, 512, 512)).astype(np.int32))
    w = jnp.ones((NC,), jnp.float32)

    def loss_fn(p, xx):
        lg = model.apply({"params": p}, xx)
        if loss_kind == "wce":
            return weighted_cross_entropy(
                jnp.transpose(lg, (0, 3, 1, 2)), labels, w)
        if loss_kind == "optax_ce":
            return optax.softmax_cross_entropy_with_integer_labels(
                lg.astype(jnp.float32), labels).mean()
        return jnp.mean(lg.astype(jnp.float32) ** 2)

    step = jax.jit(jax.value_and_grad(loss_fn))
    xr = jax.device_put(np.random.default_rng(0)
                        .standard_normal((B, 128, 128, 64), np.float32)
                        .astype("bfloat16"))

    def run(k):
        loss = None
        for _ in range(k):
            loss, _ = step(params, xr)
        float(loss)

    run(2)
    t0 = time.perf_counter(); run(2); t2 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(10); tn = time.perf_counter() - t0
    return round((tn - t2) / 8 * 1e3, 1)


def main():
    for kind in ("conv", "up", "optax_ce", "wce"):
        ms = time_grad(kind)
        print(json.dumps({"part": kind, "ms": ms}), flush=True)


if __name__ == "__main__":
    main()
