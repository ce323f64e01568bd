"""Row/column permutations of (distributed) matrices.

Reference: ``dlaf::permutations::permute``
(``permutations/general/impl.h:135`` local, ``:616`` distributed with a
hand-rolled all-to-all). Local permutation is a single gather (XLA lowers to
one vectorized take, the equivalent of the reference's
``applyPermutationsOnDevice`` CUDA kernel ``src/permutations/general/perms.cu``).
The distributed path re-shards through the canonical global layout, letting
XLA emit the all-to-all.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..matrix.dist_matrix import DistMatrix


def permute_local(a, perm, axis: int = 0):
    """out[i] = a[perm[i]] along ``axis`` (reference Coord::Row/Col)."""
    return jnp.take(a, perm, axis=axis)


def permute(a: DistMatrix, perm, axis: int = 0) -> DistMatrix:
    """Distributed permutation: out rows/cols gathered by ``perm``."""
    g = jnp.asarray(a.to_global())
    out = jnp.take(g, jnp.asarray(perm), axis=axis)
    return DistMatrix.from_global(out, a.block_size, a.grid)
