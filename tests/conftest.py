"""Test configuration: force CPU with 8 virtual devices (multi-chip sharding
tests run on a virtual mesh per the build contract) and x64 for bit-exact
parity arithmetic.  Must run before jax is imported anywhere."""

import os
import sys

# Force local CPU: the ambient environment pins jax_platforms to
# "axon,cpu" (a tunneled single-client TPU) even when JAX_PLATFORMS=cpu is
# exported, which would route every test dispatch over the network and
# deadlock against any other process holding the TPU client.  The config
# update below (post-import) is what actually takes effect.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: the suite is dominated by x64 scan
# compiles (~10 of >30s each); repeat runs and xdist workers share them
jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_test_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

# Make the reference checkout importable for golden-trajectory generation.
REFERENCE_PATH = "/root/reference"
if os.path.isdir(REFERENCE_PATH) and REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)
