#!/bin/sh
# Runs the round-3 TPU validation queue; each step blocks until the axon
# tunnel is back (the plugin retries internally). Logs to $1.
set -x
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_queue.log}"
{
  echo "=== queue start $(date) ==="
  python tools/tpu_wait.py
  echo "--- 1. baseline step (no fused prologue) ---"
  timeout 1800 python tools/profile_zonal_step.py
  echo "--- 2. fused-block validation: prep only ---"
  FLAIR_SWIN_PREP=1 timeout 2400 python tools/validate_fused_block.py
  echo "--- 3. fused-block validation: prep+finish ---"
  FLAIR_SWIN_PREP=1 FLAIR_SWIN_FINISH=1 timeout 2400 python tools/validate_fused_block.py
  echo "--- 4. step with all fused kernels ---"
  FLAIR_SWIN_PREP=1 FLAIR_SWIN_FINISH=1 FLAIR_SWIN_MERGE=1 timeout 1800 python tools/profile_zonal_step.py
  echo "--- 5. window-attention Pallas backward validation ---"
  timeout 2400 python tools/validate_attn_bwd.py
  echo "--- 6. train step (kernels on via VJP) ---"
  timeout 2400 python tools/profile_train_step.py
  echo "--- 7. bench ---"
  timeout 1800 python bench.py
  echo "=== queue done $(date) ==="
} >"$LOG" 2>&1
