# Test environment: force CPU JAX with a virtual 8-device mesh so multi-chip
# sharding paths (data-parallel pjit, psum'd confusion matrices) are exercised
# without TPU hardware. Must run before the first `import jax` anywhere.
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

# Some environments register an out-of-tree TPU platform plugin that wins over
# the env var; the config knob takes final precedence.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
