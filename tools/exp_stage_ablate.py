"""Attribute encoder wall time per stage by depth ablation: time the full
swin-base@512 encoder forward, then with one stage's blocks removed —
the difference is that stage's in-situ cost (incl. its prep/attn/ffn
kernels and glue, excl. patch merges which stay).

Chained dependent dispatches; params passed as jit args (tunnel rules).
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

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".tmp", "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from flair_for_aigle_tpu.models.swin import SwinTransformerEncoder

B = int(os.getenv("PB", "16"))
S = 512
DT = jnp.bfloat16


def t_chain(jf, params, x, iters=8):
    def run(k):
        y = x
        for _ in range(k):
            f = jf(params, y)
            # chain: feed the stride-4 feature's mean back into the input
            y = x * (1 + 0 * jnp.mean(f[2]).astype(DT))
        float(jnp.sum(y.reshape(-1)[:4].astype(jnp.float32)))

    run(2)
    t0 = time.perf_counter(); run(2); t2 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(iters); tn = time.perf_counter() - t0
    return (tn - t2) / (iters - 2) * 1e3


def main():
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, S, S, 3)), DT)

    variants = {
        "full": (2, 2, 18, 2),
        "no_s1": (0, 2, 18, 2),
        "no_s2": (2, 0, 18, 2),
        "no_s3": (2, 2, 0, 2),
        "no_s4": (2, 2, 18, 0),
    }
    times = {}
    for name, depths in variants.items():
        enc = SwinTransformerEncoder(depths=depths)
        params = jax.jit(enc.init, static_argnames=())(rng, x)

        @jax.jit
        def fwd(p, y, _enc=enc):
            return _enc.apply(p, y)

        ms = t_chain(fwd, params, x)
        times[name] = round(ms, 1)
        print(json.dumps({name: times[name]}), flush=True)
    full = times["full"]
    attrib = {k[3:]: round(full - v, 1) for k, v in times.items()
              if k != "full"}
    print(json.dumps({"full_ms": full, "stage_cost_ms": attrib}))


if __name__ == "__main__":
    main()
