"""Persistent XLA compilation cache setup.

First jit-compiles of the big backbones take 20s-4min on TPU; the
persistent cache makes every later process start warm. Call
:func:`enable_compile_cache` early (the trainers and web app call it on
startup).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "facerecognition_tpu", "xla"
)


def enable_compile_cache(directory: str | None = None) -> str:
    """Enable the JAX persistent compilation cache (idempotent)."""
    import jax

    cache_dir = directory or os.environ.get(
        "FRT_COMPILE_CACHE", _DEFAULT_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except AttributeError:
        pass  # older jax without the knobs
    return cache_dir
