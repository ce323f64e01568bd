"""Max-norm of (distributed) matrices.

Reference: ``dlaf::auxiliary::max_norm`` (``auxiliary/norm.h:26-50``,
``norm/mc.h:34-150``): per-tile lange/lantr + reduction to one rank. Here the
local reduction is one fused masked max; the distributed reduction is a
``psum``-style max over the mesh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from ..comm.mesh import COL_AXIS, ROW_AXIS
from ..matrix.dist_matrix import DistMatrix


def max_norm_local(a, uplo: str = "G"):
    """uplo='G' full matrix, 'L'/'U' referenced triangle only (incl. diag)."""
    if uplo == "G":
        v = jnp.abs(a)
    elif uplo == "L":
        v = jnp.abs(jnp.tril(a))
    else:
        v = jnp.abs(jnp.triu(a))
    return jnp.max(v) if a.size else jnp.zeros((), jnp.float32)


def _shard_norm(a4, *, nb, uplo, mrow, ncol):
    a = a4[0, 0]
    p = lax.axis_index(ROW_AXIS)
    q = lax.axis_index(COL_AXIS)
    Pn = lax.axis_size(ROW_AXIS)
    Qn = lax.axis_size(COL_AXIS)
    lm, ln = a.shape
    grow = (jnp.arange(lm // nb) * Pn + p).repeat(nb) * nb + \
        jnp.tile(jnp.arange(nb), lm // nb)
    gcol = (jnp.arange(ln // nb) * Qn + q).repeat(nb) * nb + \
        jnp.tile(jnp.arange(nb), ln // nb)
    mask = (grow[:, None] < mrow) & (gcol[None, :] < ncol)
    if uplo == "L":
        mask &= grow[:, None] >= gcol[None, :]
    elif uplo == "U":
        mask &= grow[:, None] <= gcol[None, :]
    v = jnp.where(mask, jnp.abs(a), 0)
    m = jnp.max(v)
    m = lax.pmax(lax.pmax(m, ROW_AXIS), COL_AXIS)
    return m.reshape(1, 1)


def max_norm(a: DistMatrix, uplo: str = "G"):
    """Distributed max-norm (all ranks receive the result)."""
    nb = a.block_size
    m, n = a.dist.size
    spec = P(ROW_AXIS, COL_AXIS, None, None)
    fn = jax.shard_map(
        functools.partial(_shard_norm, nb=nb, uplo=uplo, mrow=m, ncol=n),
        mesh=a.grid.mesh, in_specs=(spec,), out_specs=P(ROW_AXIS, COL_AXIS))
    out = fn(a.data)
    return jnp.max(out)
