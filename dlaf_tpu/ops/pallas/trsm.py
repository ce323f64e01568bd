"""TPU-optimized single-tile triangular solve.

The analog of the reference's cuBLAS trsm tile call (``blas/tile.h``
``tile::trsm``). On TPU the fastest formulation is the one cuBLAS itself uses
internally: invert the (small) triangular tile once via blocked recursion
(log2(nb) levels of MXU GEMMs, :func:`dlaf_tpu.ops.householder.tri_inv`) and
apply it with a single large MXU GEMM. XLA's native TriangularSolve lowers to
a sequential substitution loop that leaves the MXU idle; this path keeps every
flop on the systolic array. Accuracy: the inverse is only formed at leaf-tile
scope (<= leaf_block_size), matching cuBLAS' inverted-diagonal-block scheme.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import matmul_precision
from ..householder import tri_inv


def trsm_tile(a, b, *, left: bool, lower: bool, trans: str, unit: bool):
    """Solve op(a) x = b (left) or x op(a) = b (right) for one tile."""
    if unit:
        n = a.shape[0]
        a = jnp.where(jnp.eye(n, dtype=bool), 1.0, a)
    inv = tri_inv(a, lower=lower, nb=64)
    if trans == "T":
        inv = inv.T
    elif trans == "C":
        inv = inv.conj().T
    if left:
        return jnp.matmul(inv, b, precision=matmul_precision())
    return jnp.matmul(b, inv, precision=matmul_precision())
