"""A/B the window-attention score/out matmul strategies at a given stage
geometry, isolated from softmax/projections.

A (current): per-head batched dot_generals, K=hd.
B (grouped): heads packed 128/hd per dot via block-diagonal K/V panels,
  K=128, N=(128/hd)*Tp.

Chained dependent dispatches; tensors as jit args (tunnel rules).
"""
import os, sys, time, json
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".tmp", "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

B = int(os.getenv("DB", "16"))
HW = int(os.getenv("DHW", "128"))
C = int(os.getenv("DC", "128"))
NH = int(os.getenv("DNH", "4"))
WS = 12
T = WS * WS
HD = C // NH
TP = -(-T // 128) * 128
G = 128 // HD            # heads per group
NG = NH // G
DT = jnp.bfloat16

hp = HW + (WS - HW % WS) % WS
BNW = B * (hp // WS) ** 2
BW = int(os.getenv("BW", "4"))
N_INST = BNW // BW

rng = np.random.default_rng(0)
xq = jnp.asarray(rng.standard_normal((BNW, T, C), np.float32), DT)
xk = jnp.asarray(rng.standard_normal((BNW, T, C), np.float32), DT)
xv = jnp.asarray(rng.standard_normal((BNW, T, C), np.float32), DT)


def body_a(q_ref, k_ref, v_ref, out_ref):
    for h in range(NH):
        q = q_ref[:, :, h * HD:(h + 1) * HD]
        k = k_ref[:, :, h * HD:(h + 1) * HD]
        v = v_ref[:, :, h * HD:(h + 1) * HD]
        s = lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
        p = s.astype(DT)
        o = lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
        out_ref[:, :, h * HD:(h + 1) * HD] = o.astype(DT)


def body_b(q_ref, k_ref, v_ref, out_ref, kbd_ref, vbd_ref, s_ref):
    # row masks: which of the 128 K-rows belong to head i of the group
    for g in range(NG):
        qg = q_ref[:, :, g * 128:(g + 1) * 128]          # (BW, T, 128)
        for i in range(G):
            h = g * G + i
            k = k_ref[:, :, h * HD:(h + 1) * HD]          # (BW, T, HD)
            v = v_ref[:, :, h * HD:(h + 1) * HD]
            # K panel: rows i*HD..(i+1)*HD at cols i*TP.. hold k^T
            kt = jnp.swapaxes(k, 1, 2)                    # (BW, HD, T)
            kbd_ref[:, i * HD:(i + 1) * HD, i * TP:i * TP + T] = kt
            vbd_ref[:, i * TP:i * TP + T, i * HD:(i + 1) * HD] = v
        s = lax.dot_general(qg, kbd_ref[:],
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
        s_ref[:] = s
        p = s_ref[:].astype(DT)
        o = lax.dot_general(p, vbd_ref[:], (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
        out_ref[:, :, g * 128:(g + 1) * 128] = o.astype(DT)


def build(body, extra_scratch):
    return pl.pallas_call(
        body,
        grid=(N_INST,),
        in_specs=[pl.BlockSpec((BW, T, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((BW, T, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BNW, T, C), DT),
        scratch_shapes=extra_scratch,
    )


call_a = build(body_a, [])
call_b = build(body_b, [
    pltpu.VMEM((BW, 128, G * TP), DT),
    pltpu.VMEM((BW, G * TP, 128), DT),
    pltpu.VMEM((BW, T, G * TP), jnp.float32),
])


def t_chain(call, iters=12):
    @jax.jit
    def f(q, k, v):
        q = q + jnp.float32(0).astype(DT)
        return call(q, k, v)

    def run(k_, q):
        o = None
        for _ in range(k_):
            o = f(q, xk, xv)
            q = o
        float(jnp.sum(o[0, 0, :8].astype(jnp.float32)))

    run(2, xq)
    t0 = time.perf_counter(); run(2, xq); t2 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(iters, xq); tn = time.perf_counter() - t0
    return (tn - t2) / (iters - 2) * 1e3


# numeric sanity: B must equal A
oa = jax.jit(lambda q, k, v: call_a(q, k, v))(xq, xk, xv)
ob = jax.jit(lambda q, k, v: call_b(q, k, v))(xq, xk, xv)
d = float(jnp.max(jnp.abs(oa.astype(jnp.float32) - ob.astype(jnp.float32))))
print(json.dumps({"max_abs_diff": d}), flush=True)
print(json.dumps({"per_head_ms": round(t_chain(call_a), 2)}), flush=True)
print(json.dumps({"grouped_ms": round(t_chain(call_b), 2)}), flush=True)
