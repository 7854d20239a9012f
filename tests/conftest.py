"""Test harness: force an 8-device virtual CPU mesh before JAX import.

Multi-chip sharding paths are validated on a virtual device mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), per the TPU build
plan; the real chip is reserved for bench.py.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# this image's TPU plugin ignores JAX_PLATFORMS; the legacy var does work
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

# persistent compilation cache: ResNet-scale jits dominate test wall-clock
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_ivosw_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
