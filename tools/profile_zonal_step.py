"""Profile the stride-4 zonal device step on the real TPU.

Measures swin-base encoder + UPerNet decoder + stride-4 head + fused
upsample-crop-argmax epilogue (the zonal hot path) via chained dependent
dispatches + one scalar fetch — the axon plugin's block_until_ready does
NOT synchronize with device execution, so naive timing reads ~0 ms.

Usage: python tools/profile_zonal_step.py   (PB=<batch> to override)
"""
import os, sys, time, json
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".tmp", "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from flair_for_aigle_tpu.models.swin import SwinTransformerEncoder
from flair_for_aigle_tpu.models.upernet import UPerNetDecoder, UPerNetSegmentationHead
from flair_for_aigle_tpu.ops.pallas.epilogue import upsample_crop_convert

import os as _o
B, S, MARGIN = int(_o.getenv("PB", "16")), 512, 40
DT = jnp.bfloat16
AF32 = _o.getenv("PAF32", "1") == "1"  # PAF32=0: bf16 scores (attn_f32 knob)
enc = SwinTransformerEncoder(in_channels=3, attn_f32=AF32)
x = jnp.zeros((B, S, S, 3), DT)
enc_vars = jax.jit(enc.init)(jax.random.PRNGKey(0), x)
dec = UPerNetDecoder()
head = UPerNetSegmentationHead(classes=19, upsampling=1)
feats = jax.jit(enc.apply)(enc_vars, x)
dec_vars = jax.jit(dec.init)(jax.random.PRNGKey(1), *feats)
y0 = jax.jit(dec.apply)(dec_vars, *feats)
head_vars = jax.jit(head.init)(jax.random.PRNGKey(2), y0)

BARE = _o.getenv("BARE") == "1"  # bare model step: no epilogue/transpose


def zonal_fwd(ev, dv, hv, x):
    feats = enc.apply(ev, x)
    y = dec.apply(dv, *feats)
    lg = head.apply(hv, y)  # (B, 128, 128, 19) stride-4
    if BARE:
        return lg
    lgs4 = jnp.transpose(lg, (0, 3, 1, 2))
    return upsample_crop_convert(lgs4, margin=MARGIN, scale=4,
                                 output_type="argmax")

f = jax.jit(zonal_fwd)

def run(k, y):
    for _ in range(k):
        out = f(enc_vars, dec_vars, head_vars, y)
        y = y + (out[0, 0, 0, 0].astype(DT) * 0)
    int(out[0, 0, 0, 0])
    return y

xr = jax.device_put(np.random.default_rng(0).standard_normal((B, S, S, 3), np.float32).astype("bfloat16"))
run(2, xr)
t0 = time.perf_counter(); run(2, xr); t2 = time.perf_counter() - t0
t0 = time.perf_counter(); run(10, xr); t10 = time.perf_counter() - t0
per = (t10 - t2) / 8
print(json.dumps({"t_step_ms": round(per * 1e3, 1),
                  "tiles_per_s": round(B / per, 1)}))
