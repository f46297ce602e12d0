"""Persistent XLA compilation cache.

The 10k-point SEDNet forward takes minutes to compile through the remote
TPU compiler (ROADMAP round-1 item 3); the persistent cache makes every
CLI invocation after the first reuse the serialized executables. Enabled by
the train/predict/bench entry points; set SEDNET_TPU_NO_CACHE=1 to disable.
"""
from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/sednet_tpu_xla")


def enable_compilation_cache(path: str | None = None) -> str | None:
    if os.environ.get("SEDNET_TPU_NO_CACHE"):
        return None
    import jax

    path = path or os.environ.get("SEDNET_TPU_CACHE_DIR", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that took meaningful compile time
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
