"""Grounded A100 baseline derivation (BASELINE.md round-2 section).

Measures eager-torch efficiency on this host (torch_refs swin-base
geometry) against the practical BLAS peak and projects the reference's
A100 compute-bound throughput. Re-run after hardware changes.
"""
import sys, time
import os
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO); sys.path.insert(0, os.path.join(REPO, "tests"))
import numpy as np, torch
torch.set_num_threads(1)

# practical CPU fp32 peak via BLAS sgemm
a = np.random.rand(1536, 1536).astype(np.float32)
b = np.random.rand(1536, 1536).astype(np.float32)
for _ in range(2): a @ b
t0 = time.time(); n = 6
for _ in range(n): a @ b
dt = (time.time() - t0) / n
peak = 2 * 1536**3 / dt / 1e9
print(f"BLAS sgemm: {peak:.1f} GFLOP/s (practical 1-core fp32 peak)")

from torch_refs import TSwinEncoder
enc = TSwinEncoder(in_channels=3, embed_dim=128, depths=(2, 2, 18, 2),
                   num_heads=(4, 8, 16, 32), ws=12).eval()
x = torch.zeros(1, 3, 512, 512)
with torch.no_grad():
    enc(x)  # warmup
    t0 = time.time()
    enc(x)
    t_torch = time.time() - t0
# encoder FLOPs: swin-base ~47 GF @384^2 (published), x(512/384)^2 spatial
f_enc = 47e9 * (512 / 384) ** 2
eff = f_enc / t_torch / (peak * 1e9)
print(f"torch eager swin-base-encoder fwd @512: {t_torch:.1f}s "
      f"-> {f_enc / t_torch / 1e9:.1f} GFLOP/s -> eager efficiency "
      f"{100 * eff:.0f}% of practical peak")
# A100 projection documented in BASELINE.md
a100_tf32 = 156e12
f_tile = 299e9  # published mmseg figure, upernet swin-base 512^2
tiles_s = eff * a100_tf32 / f_tile
km2_h = tiles_s / 144 * 3600
print(f"A100 projection: {tiles_s:.0f} tiles/s compute-bound -> "
      f"{km2_h:.0f} km2/h upper bound (no host costs)")
