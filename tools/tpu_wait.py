"""Block until the axon TPU backend answers (subprocess probes)."""
import subprocess
import sys
import time

while True:
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('up')"],
            capture_output=True, text=True, timeout=120,
        )
        if r.returncode == 0 and "up" in r.stdout:
            print("tunnel up", flush=True)
            break
    except subprocess.TimeoutExpired:
        pass
    print("tunnel still down", time.strftime("%H:%M:%S"), flush=True)
    time.sleep(60)
