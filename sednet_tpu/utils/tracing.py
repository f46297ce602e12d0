"""Profiling annotations and numeric guards (aux subsystems, SURVEY §5).

The reference has no tracing beyond ad-hoc time.time() prints
(fitting_utils.py:666-667); here every pipeline stage can be wrapped in a
jax.profiler trace annotation (visible in a TPU profile / Perfetto) and a
lightweight wall-clock stopwatch, and NaN guards make silent numeric
corruption loud.
"""
from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("sednet_tpu.trace")


@contextlib.contextmanager
def trace(name: str, timings: Dict[str, float] | None = None,
          log: bool = False):
    """jax.profiler.TraceAnnotation + wall clock. Accumulates into
    `timings[name]` when given."""
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    dt = time.perf_counter() - t0
    if timings is not None:
        timings[name] = timings.get(name, 0.0) + dt
    if log:
        logger.info("%s: %.1fms", name, dt * 1e3)


def start_profile(log_dir: str) -> None:
    jax.profiler.start_trace(log_dir)


def stop_profile() -> None:
    jax.profiler.stop_trace()


def check_finite(tree, name: str = "tree") -> None:
    """Host-side NaN/Inf guard over a pytree; raises with the leaf path."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}: "
                f"nan={np.isnan(arr).sum()}, inf={np.isinf(arr).sum()}")


def debug_assert_finite(x: jax.Array, name: str = "value") -> jax.Array:
    """In-jit NaN guard via jax.debug (no-op for compiled performance when
    not triggered)."""
    bad = ~jnp.isfinite(x)

    def _report(count):
        if int(count) > 0:
            logger.error("non-finite values in %s: %d", name, int(count))

    jax.debug.callback(_report, bad.sum())
    return x
