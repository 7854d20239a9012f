"""Seeding, meters, timers, logging.

Capability parity with reference ``utils/misc.py:11-38`` (set_random_seed,
AverageMeter) and the per-driver stream-logger factory
(``eval_agent_atnet.py:36-44``). JAX has no global RNG; we seed numpy/random
for host-side decisions and hand out an explicit ``jax.random`` key chain.
"""

from __future__ import annotations

import logging
import random
import time
from typing import Optional

import numpy as np


def set_random_seed(seed: int) -> "np.random.Generator":
    """Seed host RNGs. Returns a numpy Generator for stream-local randomness.

    Reference (utils/misc.py:11-15) seeds numpy/random/torch/cuda globals.
    On TPU the device RNG is explicit (jax.random keys, see rng_chain), so
    only the host globals need seeding here.
    """
    np.random.seed(seed)
    random.seed(seed)
    return np.random.default_rng(seed)


def enable_compile_cache(path: str = "/tmp/jax_cache_ivosw") -> None:
    """Turn on jax's persistent compilation cache programmatically.

    This image pre-imports jax at interpreter startup, so the usual
    JAX_COMPILATION_CACHE_DIR env var is read too early to set from Python;
    jax.config.update works at any time. Called by every CLI entry point —
    480p ResNet-scale programs take minutes to compile on this host.
    """
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def rng_chain(seed: int):
    """Infinite deterministic stream of jax.random keys from one seed."""
    import jax

    key = jax.random.PRNGKey(seed)
    while True:
        key, sub = jax.random.split(key)
        yield sub


class AverageMeter:
    """Running average tracker (reference utils/misc.py:18-38)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


class PhaseTimer:
    """Wall-clock phase timer that blocks on device completion.

    The reference brackets phases with bare time.time() calls
    (eval_agent_atnet.py:196-197,277-304). On TPU, dispatch is async, so a
    correct timer must block_until_ready before reading the clock.
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.meters = {}

    def _now(self, result=None) -> float:
        if self.sync and result is not None:
            import jax

            jax.block_until_ready(result)
        return time.perf_counter()

    def start(self) -> float:
        return time.perf_counter()

    def stop(self, name: str, tic: float, result=None) -> float:
        elapsed = self._now(result) - tic
        self.meters.setdefault(name, AverageMeter()).update(elapsed)
        return elapsed

    def summary(self) -> dict:
        return {k: {"avg": m.avg, "count": m.count} for k, m in self.meters.items()}


class profile_trace:
    """Optional jax.profiler trace capture around a code region.

    The reference's only tracing is wall-clock AverageMeters
    (eval_agent_atnet.py:196-197); the TPU rebuild adds real profiler
    capture: ``with profile_trace("/tmp/ivosw_trace"): ...`` then inspect
    with TensorBoard/xprof. No-op when trace_dir is falsy.
    """

    def __init__(self, trace_dir=None):
        self.trace_dir = trace_dir

    def __enter__(self):
        if self.trace_dir:
            import jax

            jax.profiler.start_trace(self.trace_dir)
        return self

    def __exit__(self, exc_type, exc, tb):
        if self.trace_dir:
            import jax

            jax.profiler.stop_trace()
        return False


def create_stream_logger(
    name: str = "ivosw_tpu", fmt: str = "%(name)s - %(message)s"
) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers = []
    ch = logging.StreamHandler()
    ch.setFormatter(logging.Formatter(fmt))
    logger.addHandler(ch)
    logger.propagate = False
    return logger
