"""Encoder prefix timing: patch-embed, then through stage 1..4. The delta
between consecutive prefixes is that stage's in-situ cost (incl. its patch
merge). DCE-proof: every prefix ends in a scalar reduction of ALL live
tensors. Chained dependent dispatches; params as jit args (tunnel rules).
"""
import os, sys, time, json
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".tmp", "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from flax.core import FrozenDict
from flair_for_aigle_tpu.models.swin import SwinTransformerEncoder

B, S = int(os.getenv("PB", "16")), 512
DT = jnp.bfloat16

enc = SwinTransformerEncoder(in_channels=3)
x0 = jnp.zeros((B, S, S, 3), DT)
enc_vars = jax.jit(enc.init)(jax.random.PRNGKey(0), x0)


def make_prefix(n_stages):
    """Forward through patch-embed and the first n_stages stages."""
    def fn(ev, x):
        # Known gotcha (CLAUDE.md round-3): kernels fed from entry params
        # (bitcast layouts) can OOM scoped VMEM in standalone harnesses
        # where the in-model call compiles fine. Feed every param through a
        # data-dependent no-op so layouts match the in-model case.
        eps = (x.reshape(-1)[0] * 0).astype(jnp.float32)
        ev = jax.tree_util.tree_map(
            lambda a: a + eps.astype(a.dtype)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            ev,
        )

        def run(mod, xx):
            from flair_for_aigle_tpu.models.layers import TorchConv, TorchLayerNorm
            from flair_for_aigle_tpu.models.swin import PatchMerging, SwinBlock
            y = TorchConv(mod.embed_dim, mod.patch_size, mod.patch_size, 0,
                          name="patch_embed.proj")(xx)
            y = TorchLayerNorm(name="patch_embed.norm")(y)
            outs = [y]
            for i in range(n_stages):
                depth, heads = mod.depths[i], mod.num_heads[i]
                dim = mod.embed_dim * (2 ** i)
                if i > 0:
                    y = PatchMerging(dim, kernel_mode=mod.attn_kernel,
                                     name=f"layers.{i}.downsample")(y)
                for j in range(depth):
                    y = SwinBlock(dim=dim, num_heads=heads,
                                  window_size=mod.window_size,
                                  shift=(j % 2 == 1), attn_f32=mod.attn_f32,
                                  kernel_mode=mod.attn_kernel,
                                  name=f"layers.{i}.blocks.{j}")(y)
                outs.append(y)
            return jnp.stack([jnp.sum(o.astype(jnp.float32)) for o in outs])
        return _apply(ev, x, fn=run)
    return fn


def _apply(ev, x, fn):
    import flax.linen as nn

    class Prefix(nn.Module):
        @nn.compact
        def __call__(self, xx):
            return fn(enc, xx)

    return Prefix().apply(ev, x)


def t_chain(fn, iters=10):
    f = jax.jit(fn)

    def run(k, y):
        for _ in range(k):
            o = f(enc_vars, y)
            y = y + (o.reshape(-1)[0].astype(DT) * 0)
        float(jnp.sum(o.astype(jnp.float32)))

    xr = jax.device_put(np.random.default_rng(0)
                        .standard_normal((B, S, S, 3), np.float32)
                        .astype("bfloat16"))
    run(2, xr)
    t0 = time.perf_counter(); run(2, xr); t2 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(iters, xr); tn = time.perf_counter() - t0
    return (tn - t2) / (iters - 2) * 1e3


ts = []
for n in range(0, 5):
    t = t_chain(make_prefix(n))
    ts.append(t)
    print(json.dumps({f"prefix_{n}_ms": round(t, 1)}), flush=True)
print(json.dumps({
    "patch_embed": round(ts[0], 1),
    "s1": round(ts[1] - ts[0], 1),
    "s2": round(ts[2] - ts[1], 1),
    "s3": round(ts[3] - ts[2], 1),
    "s4": round(ts[4] - ts[3], 1),
}))
