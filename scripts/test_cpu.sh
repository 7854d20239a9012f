#!/usr/bin/env bash
# Run the test suite on an 8-device virtual CPU mesh. This image pre-imports
# jax at interpreter startup, so these variables MUST be set before python
# starts (conftest.py cannot do it).
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORM_NAME=cpu
export JAX_PLATFORMS=cpu
export XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=8"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache_ivosw_tests}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
exec python -m pytest "$@"
