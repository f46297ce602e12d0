"""Trace-time kernel dispatch target.

Every op that picks between its fused Pallas kernel and the portable XLA
fallback gates on the backend AT TRACE TIME (the choice is baked into the
jaxpr). `target_backend()` is that gate; by default it is the process
backend, but `force_backend("tpu")` overrides it so an AOT export
(sednet_tpu.export) performed on a CPU host can embed the TPU kernel
path into a TPU serving artifact.

CAUTION: the override is trace-time state that is NOT part of jit cache
keys. Mixing forced and unforced calls of the SAME jitted function at
the SAME shapes within one process can reuse a trace made under the
other setting. Use force_backend only around export-time tracing (a
dedicated process in the CLI), never to steer runtime execution.
"""
from __future__ import annotations

import contextlib

import jax

_override: str | None = None


def target_backend() -> str:
    """The backend kernels should be selected for (trace-time)."""
    return _override or jax.default_backend()


@contextlib.contextmanager
def force_backend(name: str):
    """Temporarily pretend to be on `name` for kernel dispatch."""
    global _override
    prev = _override
    _override = name
    try:
        yield
    finally:
        _override = prev
