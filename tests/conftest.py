import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Tests run on the CPU backend with a virtual 8-device mesh so multi-chip
# sharding logic is exercised without TPU hardware.
#
# Notes discovered on this image:
# - The axon TPU plugin ignores the JAX_PLATFORMS env var; jax.config works.
# - torch must not be imported before the JAX backend initializes (OpenMP
#   clash hangs device init), so we initialize JAX here, first.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8
