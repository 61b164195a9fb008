"""Two bounded perf probes on the real chip.

1. GELU headroom in the fused FFN kernel: time fused_ln_mlp_residual at
   swin-base stage-1/2 geometry with the exact-erf GELU vs an identity
   patch. If identity is much faster the VPU transcendental is the
   bottleneck at small C (VPU work scales with rows*hidden while MXU work
   scales with rows*hidden*C, so stage 1 C=128 is worst-case).
2. Patch-embed lowering: XLA conv (4x4 stride-4 on C_in=3) vs
   space-to-depth reshape + single K=48 matmul. The conv measured ~1.4 ms
   for ~3 GFLOP (reference hot path: the timm patch embed inside the
   flagship swin — /root/reference/flair_hub/models/monotemp_model.py:76).

Usage: python tools/exp_gelu_patchembed.py
"""
import os, sys, time, json
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".tmp", "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from flair_for_aigle_tpu.ops.pallas import ffn as ffnk

B, DT = 16, jnp.bfloat16
rng = np.random.default_rng(0)


def t_chain(jf, x, extra, iters=16):
    def run(k, x):
        for _ in range(k):
            x = jf(x, *extra)
        float(jnp.sum(x.reshape(-1)[:4].astype(jnp.float32)))
    run(2, x)
    t0 = time.perf_counter(); run(2, x); t2 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(iters, x); tn = time.perf_counter() - t0
    return (tn - t2) / (iters - 2) * 1e3


def ffn_probe(hw, c, tag):
    hidden = 4 * c
    ln_s = jnp.ones((c,), jnp.float32)
    ln_b = jnp.zeros((c,), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, hidden), np.float32) * .02, DT)
    b1 = jnp.zeros((hidden,), DT)
    w2 = jnp.asarray(rng.standard_normal((hidden, c), np.float32) * .02, DT)
    b2 = jnp.zeros((c,), DT)
    xt = jnp.asarray(rng.standard_normal((B, hw, hw, c), np.float32), DT)
    at = jnp.asarray(rng.standard_normal((B, hw, hw, c), np.float32), DT)

    @jax.jit
    def f(x, at, *w):
        x = x + at * jnp.float32(1e-6).astype(x.dtype)
        return ffnk.fused_ln_mlp_residual(x, at, *w)

    ms = t_chain(f, xt, (at, ln_s, ln_b, w1, b1, w2, b2))
    print(json.dumps({"part": f"ffn_{tag}", "ms": round(ms, 2)}), flush=True)
    return ms


def main():
    # --- 1) GELU headroom ---
    # kernel builders are lru_cached, so the GELU variant must be patched
    # before any tracing: select by env and run this script once per mode.
    mode = os.getenv("FFN_GELU", "gelu")
    if mode == "identity":
        ffnk._gelu_exact = lambda x: x
    elif mode == "a727":
        # A&S 7.1.27: no exp — poly6 + reciprocal + 4 squarings, |err|<=3e-7
        def _gelu_a727(x):
            xf = x.astype(jnp.float32) * np.float32(0.7071067811865476)
            za = jnp.abs(xf)
            a = (np.float32(0.0705230784), np.float32(0.0422820123),
                 np.float32(0.0092705272), np.float32(0.0001520143),
                 np.float32(0.0002765672), np.float32(0.0000430638))
            p = np.float32(1.0)
            acc = a[5]
            for c in (a[4], a[3], a[2], a[1], a[0]):
                acc = acc * za + c
            u = p + za * acc
            r = 1.0 / u
            r2 = r * r; r4 = r2 * r2; r8 = r4 * r4; r16 = r8 * r8
            erf = jnp.sign(xf) * (1.0 - r16)
            return (0.5 * x.astype(jnp.float32) * (1.0 + erf)).astype(x.dtype)
        ffnk._gelu_exact = _gelu_a727
    elif mode == "bf16":
        orig = ffnk._gelu_exact
        ffnk._gelu_exact = lambda x: orig(x.astype(jnp.bfloat16))
    for hw, c in ((128, 128), (64, 256)):
        ffn_probe(hw, c, f"{mode}_c{c}")
    if os.getenv("SKIP_PATCH_EMBED") == "1":
        return

    # --- 2) patch embed ---
    S, P, E = 512, 4, 128
    x = jnp.asarray(rng.standard_normal((B, S, S, 3), np.float32), DT)
    wconv = jnp.asarray(rng.standard_normal((P, P, 3, E), np.float32) * .02, DT)
    bconv = jnp.zeros((E,), DT)

    @jax.jit
    def conv(x, w, b):
        x = x + jnp.float32(1e-6).astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x, w, (P, P), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + b
        return x.at[:, : S // P, : S // P, :3].add(
            y[..., :3] * jnp.float32(1e-6).astype(x.dtype))

    ms = t_chain(conv, x, (wconv, bconv))
    print(json.dumps({"part": "patch_conv", "ms": round(ms, 2)}), flush=True)

    wmat = jnp.reshape(wconv, (P * P * 3, E))

    @jax.jit
    def s2d(x, w, b):
        x = x + jnp.float32(1e-6).astype(x.dtype)
        h = S // P
        y = x.reshape(B, h, P, h, P, 3)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(B, h, h, P * P * 3)
        y = jnp.dot(y, w, preferred_element_type=jnp.float32).astype(DT) + b
        return x.at[:, :h, :h, :3].add(
            y[..., :3] * jnp.float32(1e-6).astype(x.dtype))

    ms = t_chain(s2d, x, (wmat, bconv))
    print(json.dumps({"part": "patch_s2d_matmul", "ms": round(ms, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
