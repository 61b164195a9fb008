"""Decompose the zonal step: encoder vs UPerNet decoder vs head vs
epilogue, by timing successively longer prefixes of the real pipeline
(keeps XLA layouts realistic, unlike stage ablation inside the encoder).

Chained dependent dispatches; params as jit args (tunnel rules).
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

B, S, MARGIN = int(os.getenv("PB", "16")), 512, 40
DT = jnp.bfloat16
enc = SwinTransformerEncoder(in_channels=3)
x = jnp.zeros((B, S, S, 3), DT)
enc_vars = jax.jit(enc.init)(jax.random.PRNGKey(0), x)
dec = UPerNetDecoder()
head = UPerNetSegmentationHead(classes=19, upsampling=1)
feats = jax.jit(enc.apply)(enc_vars, x)
dec_vars = jax.jit(dec.init)(jax.random.PRNGKey(1), *feats)
y0 = jax.jit(dec.apply)(dec_vars, *feats)
head_vars = jax.jit(head.init)(jax.random.PRNGKey(2), y0)


def _r(*ts):
    # cheap reduction over every tensor so nothing is DCE'd
    return jnp.stack([jnp.sum(t.astype(jnp.float32)) for t in ts])


def enc_only(ev, dv, hv, x):
    feats = enc.apply(ev, x)
    return _r(*feats)


def enc_dec(ev, dv, hv, x):
    feats = enc.apply(ev, x)
    y = dec.apply(dv, *feats)
    return _r(y)


def enc_dec_head(ev, dv, hv, x):
    feats = enc.apply(ev, x)
    y = dec.apply(dv, *feats)
    lg = head.apply(hv, y)
    return _r(lg)


def full(ev, dv, hv, x):
    feats = enc.apply(ev, x)
    y = dec.apply(dv, *feats)
    lg = head.apply(hv, y)
    lgs4 = jnp.transpose(lg, (0, 3, 1, 2))
    out = upsample_crop_convert(lgs4, margin=MARGIN, scale=4,
                                output_type="argmax")
    return _r(out)


def t_chain(fn, iters=10):
    f = jax.jit(fn)

    def run(k, y):
        for _ in range(k):
            o = f(enc_vars, dec_vars, head_vars, y)
            y = y + (o.reshape(-1)[0].astype(DT) * 0)
        float(jnp.sum(o.astype(jnp.float32)))

    xr = jax.device_put(np.random.default_rng(0)
                        .standard_normal((B, S, S, 3), np.float32)
                        .astype("bfloat16"))
    run(2, xr)
    t0 = time.perf_counter(); run(2, xr); t2 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(iters, xr); tn = time.perf_counter() - t0
    return (tn - t2) / (iters - 2) * 1e3


t_enc = t_chain(enc_only)
print(json.dumps({"enc_ms": round(t_enc, 1)}))
t_dec = t_chain(enc_dec)
print(json.dumps({"enc_dec_ms": round(t_dec, 1)}))
t_head = t_chain(enc_dec_head)
print(json.dumps({"enc_dec_head_ms": round(t_head, 1)}))
t_full = t_chain(full)
print(json.dumps({"full_ms": round(t_full, 1)}))
print(json.dumps({
    "enc": round(t_enc, 1),
    "decoder": round(t_dec - t_enc, 1),
    "head": round(t_head - t_dec, 1),
    "epilogue": round(t_full - t_head, 1),
}))
