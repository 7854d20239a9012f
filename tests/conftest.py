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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
