"""Persistent-compile-cache directory selection.

XLA:CPU AOT executables are machine-specific: loading an entry compiled on
a previous driver host emits 'Target machine feature not supported ...
could lead to SIGILL' and has produced real segfaults (round-5 full-suite
SIGSEGV in _pjit_call_impl_python). The workspace outlives the host, so
CPU entries live under a subdirectory keyed by the host's CPU feature set;
TPU entries (.jax_cache) are compiled server-side and stay host-portable.

This module stays jax-free so any launcher can import it first; the cache
dir is read at compile time, so setting it after jax imports is safe.
"""
from __future__ import annotations

import hashlib
import platform

_REPO_CPU_CACHE = "/root/repo/.jax_cache_cpu"


def cpu_cache_dir() -> str:
    """Machine-keyed XLA:CPU compile-cache directory."""
    try:
        with open("/proc/cpuinfo") as f:
            key = next(line for line in f if line.startswith("flags"))
    except (OSError, StopIteration):
        key = platform.platform() + platform.processor()
    h = hashlib.sha1(key.encode()).hexdigest()[:10]
    return f"{_REPO_CPU_CACHE}/{h}"
