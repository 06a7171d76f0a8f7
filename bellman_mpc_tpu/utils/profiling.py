"""Profiling/observability helpers.

The reference's observability is `log` trace/error in multicore.rs plus
manual Instant timing in the MiMC bench (SURVEY.md §5).  The TPU framework
exposes:

  * `trace(dir)`  — context manager around jax.profiler (XLA/TPU traces,
    viewable in TensorBoard/Perfetto),
  * `timed(name)` — wall-clock block timing with device synchronization,
  * module-level `logger` — structured logging (BMT_LOG=debug for verbose).
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Iterator, Optional

logger = logging.getLogger("bellman_mpc_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("[%(name)s %(levelname)s] %(message)s"))
    logger.addHandler(_h)
logger.setLevel(
    logging.DEBUG if os.environ.get("BMT_LOG") == "debug" else logging.WARNING
)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/bmt_trace") -> Iterator[None]:
    """Capture a JAX profiler trace around the block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


@contextlib.contextmanager
def timed(name: str, sync: bool = True) -> Iterator[None]:
    """Wall-clock timing with optional device barrier (Instant-style)."""
    import jax

    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            (jax.device_put(0) + 0).block_until_ready()
        logger.info("%s: %.4fs", name, time.perf_counter() - t0)
