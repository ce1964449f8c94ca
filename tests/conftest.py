"""Test configuration: force an 8-virtual-device CPU mesh.

This is the TPU-native analog of "test multi-node without a cluster" (see
SURVEY.md §4): sharding/pjit tests run against 8 virtual CPU devices so the
data-parallel code paths compile and execute without TPU hardware.
"""

import os
import sys

# Must happen before jax is imported anywhere. Force CPU (the ambient
# environment may point JAX at a tunneled TPU backend; the axon plugin
# overrides the env var, so we also set the config flag explicitly below).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
