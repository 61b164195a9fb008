"""Probe the axon tunnel's D2H profile: one big pull vs striped async
fetches at several stripe sizes, plus whether host work overlaps in-flight
transfers. Informs the zonal finalize stripe sizing (bench tail is D2H).

Usage: python tools/probe_d2h.py
"""
import os, sys, time, json
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp, numpy as np

dev = jax.devices()[0]
MB = 1 << 20

# 15.6 MB uint8 payload, same scale as a packed 1 km2 canvas
N = 15_625_000
buf = jax.device_put(np.zeros(N, np.uint8))
buf.block_until_ready()

# warmup D2H path
np.asarray(jax.device_put(np.zeros(1 << 16, np.uint8)))

out = {}

t0 = time.perf_counter()
np.asarray(buf)
dt = time.perf_counter() - t0
out["one_pull_s"] = round(dt, 3)
out["one_pull_mbps"] = round(N / MB / dt, 1)

for n_stripes in (4, 20, 60):
    rows = N // n_stripes
    parts = [jax.lax.dynamic_slice(buf, (i * rows,), (rows,))
             for i in range(n_stripes)]
    for p in parts:
        p.block_until_ready()
    t0 = time.perf_counter()
    for p in parts:
        p.copy_to_host_async()
    t_issue = time.perf_counter() - t0
    arrs = [np.asarray(p) for p in parts]
    dt = time.perf_counter() - t0
    out[f"stripes{n_stripes}_s"] = round(dt, 3)
    out[f"stripes{n_stripes}_mbps"] = round(rows * n_stripes / MB / dt, 1)
    out[f"stripes{n_stripes}_issue_s"] = round(t_issue, 3)
    del arrs

# does host work overlap with in-flight async copies?
n_stripes, rows = 20, N // 20
parts = [jax.lax.dynamic_slice(buf, (i * rows,), (rows,))
         for i in range(n_stripes)]
for p in parts:
    p.block_until_ready()
t0 = time.perf_counter()
for p in parts:
    p.copy_to_host_async()
busy = 0.0
for p in parts:
    a = np.asarray(p)
    tb = time.perf_counter()
    x = a[::97].sum() + np.random.default_rng(0).standard_normal(4 << 20).sum()
    busy += time.perf_counter() - tb
dt = time.perf_counter() - t0
out["overlap_total_s"] = round(dt, 3)
out["overlap_hostwork_s"] = round(busy, 3)

print(json.dumps(out))
