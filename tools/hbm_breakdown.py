"""Attribute the zonal device step's HBM traffic per stage (XLA cost model).

Compiles each piece of the hot path (the four swin stages, patch
mergings, UPerNet decoder, head, fused epilogue) separately for the real
TPU and reads ``compiled.cost_analysis()`` — 'bytes accessed' is XLA's
post-fusion HBM traffic estimate, 'flops' the MXU work. The per-stage sum
differs from the fused whole (stage boundaries force materialization),
but the ranking tells where the remaining bandwidth goes.

Usage: python tools/hbm_breakdown.py   (PB=<batch> to override)
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import flax.linen as nn

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".tmp", "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from flair_for_aigle_tpu.models.swin import (
    PatchMerging,
    SwinBlock,
    SwinTransformerEncoder,
)
from flair_for_aigle_tpu.models.upernet import (
    UPerNetDecoder,
    UPerNetSegmentationHead,
)
from flair_for_aigle_tpu.ops.pallas.epilogue import upsample_crop_convert

B = int(os.getenv("PB", "16"))
S = 512
DT = jnp.bfloat16
KEY = jax.random.PRNGKey(0)


WALL = os.getenv("WALL")  # also measure per-stage wall time (chained)


def _wall_ms(fn, *args):
    """Wall time per call via chained dependent dispatches + scalar fetch
    (the axon plugin's block_until_ready does not sync)."""
    import time

    f = jax.jit(fn)

    def dep(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.reshape(leaf, (-1,))[0].astype(jnp.float32)

    def run(k, args):
        args = list(args)
        acc = jnp.float32(0)
        for _ in range(k):
            out = f(*args)
            acc = acc + dep(out)
            # perturb the LAST arg (activation tensor) so runs chain
            a = args[-1]
            args[-1] = a + (acc * 0).astype(a.dtype)
        float(acc)

    run(2, args)
    t0 = time.perf_counter()
    run(2, args)
    t2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(10, args)
    t10 = time.perf_counter() - t0
    return (t10 - t2) / 8 * 1e3


def cost(name, fn, *args):
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        gb = float(ca.get("bytes accessed", 0.0)) / 1e9
        tf = float(ca.get("flops", 0.0)) / 1e12
        rec = {"stage": name, "hbm_gb": round(gb, 3),
               "tflops": round(tf, 3),
               "ms_at_820gbps": round(gb / 0.82, 2),
               "ms_at_197tfps": round(tf / 0.197, 2)}
        if WALL:
            rec["wall_ms"] = round(_wall_ms(fn, *args), 1)
        print(json.dumps(rec), flush=True)
        return gb
    except Exception as e:  # cost model may be absent on some plugins
        print(json.dumps({"stage": name, "error": str(e)[:200]}), flush=True)
        return 0.0


def swin_stage(dim, heads, depth, hw, name):
    xs = jnp.zeros((B, hw, hw, dim), DT)

    class Stage(nn.Module):
        @nn.compact
        def __call__(self, y):
            for j in range(depth):
                y = SwinBlock(dim=dim, num_heads=heads, window_size=12,
                              shift=(j % 2 == 1), attn_f32=False,
                              name=f"blocks.{j}")(y)
            return y

    m = Stage()
    vs = jax.jit(m.init)(KEY, xs)
    return cost(name, m.apply, vs, xs)


def main():
    x = jnp.zeros((B, S, S, 3), DT)
    enc = SwinTransformerEncoder(in_channels=3, attn_f32=False)
    enc_vars = jax.jit(enc.init)(KEY, x)
    dec = UPerNetDecoder()
    feats = jax.jit(enc.apply)(enc_vars, x)
    dec_vars = jax.jit(dec.init)(KEY, *feats)
    head = UPerNetSegmentationHead(classes=19, upsampling=1)
    y0 = jax.jit(dec.apply)(dec_vars, *feats)
    head_vars = jax.jit(head.init)(KEY, y0)
    lg = jax.jit(head.apply)(head_vars, y0)

    def whole(ev, dv, hv, x):
        fs = enc.apply(ev, x)
        y = dec.apply(dv, *fs)
        lg = head.apply(hv, y)
        lgs4 = jnp.transpose(lg, (0, 3, 1, 2))
        return upsample_crop_convert(lgs4, margin=40, scale=4,
                                     output_type="argmax")

    cost("WHOLE_STEP", whole, enc_vars, dec_vars, head_vars, x)
    cost("encoder_only", enc.apply, enc_vars, x)

    total = 0.0
    total += swin_stage(128, 4, 2, 128, "swin_stage1_2blk_128px")
    total += swin_stage(256, 8, 2, 64, "swin_stage2_2blk_64px")
    total += swin_stage(512, 16, 18, 32, "swin_stage3_18blk_32px")
    total += swin_stage(1024, 32, 2, 16, "swin_stage4_2blk_16px")

    for i, (dim, hw) in enumerate([(256, 128), (512, 64), (1024, 32)]):
        xm = jnp.zeros((B, hw, hw, dim // 2), DT)
        m = PatchMerging(dim)
        vs = jax.jit(m.init)(KEY, xm)
        total += cost(f"patch_merge_{i + 1}", m.apply, vs, xm)

    total += cost("upernet_decoder", dec.apply, dec_vars, *feats)
    total += cost("seg_head_s4", head.apply, head_vars, y0)

    def epi(lg):
        lgs4 = jnp.transpose(lg, (0, 3, 1, 2))
        return upsample_crop_convert(lgs4, margin=40, scale=4,
                                     output_type="argmax")

    total += cost("fused_epilogue", epi, lg)
    print(json.dumps({"stage": "SUM_OF_PARTS", "hbm_gb": round(total, 3)}),
          flush=True)


if __name__ == "__main__":
    main()
