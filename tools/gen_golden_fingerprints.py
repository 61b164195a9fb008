"""Regenerate tests/golden/multimodal_fingerprints.json.

Run after an INTENTIONAL numerics change to the multimodal pipeline; the
pinned per-stage activation statistics (mean/std/absmax) are what
tests/test_multimodal_golden.py compares against so silent drift —
including a coordinated repo+oracle change — fails loudly.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

from tests.test_multimodal_golden import (  # noqa: E402
    FINGERPRINT_PATH,
    FLAGSHIP_KW,
    MICRO_KW,
    build_pair,
    capture_fingerprints,
)


def main():
    out = {}
    print("micro geometry ...", flush=True)
    model, variables, _, _, jb = build_pair(
        n_classes=7, img=128, s2=8, t_steps=3, **MICRO_KW)
    out["micro"] = capture_fingerprints(model, variables, jb)
    print("flagship geometry (swin-base 512px — takes minutes on CPU) ...",
          flush=True)
    model, variables, _, _, jb = build_pair(
        n_classes=19, img=512, s2=16, t_steps=4, **FLAGSHIP_KW)
    out["flagship"] = capture_fingerprints(model, variables, jb)
    os.makedirs(os.path.dirname(FINGERPRINT_PATH), exist_ok=True)
    with open(FINGERPRINT_PATH, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {FINGERPRINT_PATH}")


if __name__ == "__main__":
    main()
