"""Dump optimized HLO for one stage-3 swin block and rank ops by bytes.

Answers "where do stage 3's 14 GB go": lists every HLO op in the
optimized module whose output tensor exceeds 4 MB, grouped by opcode.
"""
import json
import os
import re
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import flax.linen as nn

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".tmp", "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from flair_for_aigle_tpu.models.swin import SwinBlock

B = int(os.getenv("PB", "16"))
DIM, HEADS, HW = 512, 16, 32
DT = jnp.bfloat16
NBLK = int(os.getenv("NBLK", "2"))


class Stage(nn.Module):
    @nn.compact
    def __call__(self, y):
        for j in range(NBLK):
            y = SwinBlock(dim=DIM, num_heads=HEADS, window_size=12,
                          shift=(j % 2 == 1), attn_f32=False,
                          name=f"blocks.{j}")(y)
        return y


DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
               "pred": 1, "f16": 2, "s64": 8, "u64": 8}


def shape_bytes(s):
    m = re.match(r"(\w+)\[([\d,]*)\]", s)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    if dt not in DTYPE_BYTES:
        return 0
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES[dt]


def main():
    xs = jnp.zeros((B, HW, HW, DIM), DT)
    m = Stage()
    vs = jax.jit(m.init)(jax.random.PRNGKey(0), xs)
    compiled = jax.jit(m.apply).lower(vs, xs).compile()
    txt = compiled.as_text()
    by_op = defaultdict(lambda: [0, 0])
    rows = []
    for line in txt.splitlines():
        line = line.strip()
        m2 = re.match(r"%?[\w.\-]+ = ((?:\([^)]*\)|\w+\[[\d,]*\][^ ]*)) (\w+)",
                      line)
        if not m2:
            continue
        shape, op = m2.group(1), m2.group(2)
        if op in ("parameter", "constant", "tuple", "get-tuple-element"):
            continue
        nb = sum(shape_bytes(p) for p in re.findall(r"\w+\[[\d,]*\]", shape.split("{")[0]))
        by_op[op][0] += nb
        by_op[op][1] += 1
        if nb > 4 << 20:
            rows.append((nb, op, line[:160]))
    rows.sort(reverse=True)
    print("== ops > 4MB output ==")
    for nb, op, line in rows[:40]:
        print(f"{nb / 1e6:9.1f} MB  {op:12s} {line}")
    print("\n== total output bytes by opcode ==")
    for op, (nb, cnt) in sorted(by_op.items(), key=lambda kv: -kv[1][0]):
        if nb > 1 << 20:
            print(f"{nb / 1e6:9.1f} MB  x{cnt:4d}  {op}")
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print("\ncost:", json.dumps({"hbm_gb": round(float(ca.get("bytes accessed", 0)) / 1e9, 3),
                                  "flops_tf": round(float(ca.get("flops", 0)) / 1e12, 3)}))


if __name__ == "__main__":
    main()
