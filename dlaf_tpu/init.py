"""Runtime initialization.

Analog of the reference's ``dlaf::initialize/finalize/ScopedInitializer``
(``src/init.cpp:306-379``): one place that brings up the runtime — multi-host
JAX distributed init when requested, the persistent compilation cache (the
TPU analog of warmed-up pika thread pools: first-compile latency is the
startup cost here), tune-parameter resolution, and an optional config dump
(reference ``--dlaf:print-config``).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax

from .tune import get_tune_parameters

_initialized = False


def initialize(cache_dir: Optional[str] = None, print_config: bool = False,
               distributed: bool = False, **distributed_kw) -> None:
    """Idempotent runtime bring-up."""
    global _initialized
    if _initialized:
        return
    cache = cache_dir or os.environ.get(
        "DLAF_TPU_COMPILATION_CACHE", os.path.expanduser("~/.cache/dlaf_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # Finite max_size enables the filelock-guarded LRUCache mode: cache
        # put() is otherwise a non-atomic write_bytes, and a concurrent
        # process (multihost ranks, xdist workers) reading a half-written
        # entry segfaults in deserialize_executable. 4 GiB is far above any
        # working set, so this buys locking without real evictions.
        jax.config.update("jax_compilation_cache_max_size", 4 * 1024**3)
    except Exception:
        pass
    if distributed:
        jax.distributed.initialize(**distributed_kw)
    if print_config:
        tp = get_tune_parameters()
        print("dlaf_tpu configuration:")
        print(f"  backend: {jax.default_backend()}  devices: {len(jax.devices())}")
        print(f"  compilation cache: {cache}")
        for f in dataclasses.fields(tp):
            print(f"  {f.name}: {getattr(tp, f.name)}")
    _initialized = True


def finalize() -> None:
    global _initialized
    _initialized = False


class ScopedInitializer:
    """``with ScopedInitializer(): ...`` (reference ``dlaf::ScopedInitializer``)."""

    def __init__(self, **kw):
        self._kw = kw

    def __enter__(self):
        initialize(**self._kw)
        return self

    def __exit__(self, *exc):
        finalize()
        return False
