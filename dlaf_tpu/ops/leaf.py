"""Leaf (single-tile) kernels with backend dispatch.

Blocked recursions in :mod:`dlaf_tpu.ops.blocked` bottom out here on tiles of
``leaf_block_size``. Two implementations exist per kernel:

  - XLA: ``jax.lax.linalg`` primitives — correct for every dtype/backend and
    the only option for complex/f64 on CPU.
  - Pallas: MXU/VPU kernels in :mod:`dlaf_tpu.ops.pallas` used on TPU for
    f32/bf16 (the hot path).

This mirrors the reference's split between vendor-library tile ops
(``include/dlaf/lapack/tile.h:610-618``) and its custom GPU kernels
(``src/lapack/gpu/*.cu``), with dispatch by backend instead of ``Policy``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_FORCE_BACKEND = None  # None = auto, "xla", "pallas"


def set_leaf_backend(backend):
    """Force leaf kernel backend: None (auto), 'xla' or 'pallas'."""
    global _FORCE_BACKEND
    assert backend in (None, "xla", "pallas")
    _FORCE_BACKEND = backend


def _use_pallas(dtype) -> bool:
    if _FORCE_BACKEND == "xla":
        return False
    if _FORCE_BACKEND == "pallas":
        return True
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return jnp.dtype(dtype) in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16))


def potrf_leaf(a, upper: bool = False):
    """Cholesky factor of a single SPD tile; the other triangle is zeroed.
    ``upper`` selects A = U^H U on the upper triangle (strictly-lower zeroed)."""
    if _use_pallas(a.dtype):
        try:
            from .pallas.potrf import potrf_tile
        except ImportError:
            pass
        else:
            return potrf_tile(a, upper=upper)
    if upper:
        from .core import ct
        return ct(jax.lax.linalg.cholesky(ct(a), symmetrize_input=False))
    return jax.lax.linalg.cholesky(a, symmetrize_input=False)


def trsm_leaf(a, b, *, left: bool, lower: bool, trans: str, unit: bool):
    """Solve op(a) x = b (left) or x op(a) = b (right) on a single tile."""
    if _use_pallas(a.dtype):
        try:
            from .pallas.trsm import trsm_tile
        except ImportError:
            pass
        else:
            return trsm_tile(a, b, left=left, lower=lower, trans=trans, unit=unit)
    return jax.lax.linalg.triangular_solve(
        a, b,
        left_side=left, lower=lower,
        transpose_a=trans in ("T", "C"),
        conjugate_a=trans == "C",
        unit_diagonal=unit,
    )
