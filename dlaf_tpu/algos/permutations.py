"""Row/column permutations of (distributed) matrices.

Reference: ``dlaf::permutations::permute``
(``permutations/general/impl.h:135`` local, ``:616`` distributed with a
hand-rolled per-partner all-to-all, ``:230-303``). Local permutation is a
single gather (XLA lowers to one vectorized take, the equivalent of the
reference's ``applyPermutationsOnDevice`` CUDA kernel
``src/permutations/general/perms.cu``).

The distributed path is device-resident: one ``all_gather`` along the
permuted axis's mesh dimension inside ``shard_map`` (a row permutation only
exchanges data within a grid column and vice versa), then a local gather
into each rank's block-cyclic shard. Transient memory is O(n * l) per device
(the grid-column/row slab) — the bandwidth-optimal padded all-to-all is a
future refinement; the reference's count-exact Isend/Irecv exchange has no
uniform-size collective equivalent.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from ..comm.mesh import COL_AXIS, ROW_AXIS
from ..matrix.dist_matrix import DistMatrix


def permute_local(a, perm, axis: int = 0):
    """out[i] = a[perm[i]] along ``axis`` (reference Coord::Row/Col)."""
    return jnp.take(a, perm, axis=axis)


def _permute_shardfn(a4, perm, *, nb, n, axis):
    a = a4[0, 0]
    p = lax.axis_index(ROW_AXIS)
    q = lax.axis_index(COL_AXIS)
    Pn = lax.axis_size(ROW_AXIS)
    Qn = lax.axis_size(COL_AXIS)
    lm, ln = a.shape

    if axis == 0:
        lmt = lm // nb
        # replicate the grid column's rows in global order
        allr = lax.all_gather(a, ROW_AXIS)               # (P, lm, ln)
        glob = allr.reshape(Pn, lmt, nb, ln).transpose(1, 0, 2, 3) \
            .reshape(Pn * lmt * nb, ln)
        grow = (jnp.arange(lmt) * Pn + p).repeat(nb) * nb + \
            jnp.tile(jnp.arange(nb), lmt)                # my target rows
        src = jnp.where(grow < n, perm[jnp.minimum(grow, n - 1)], grow)
        out = jnp.take(glob, jnp.minimum(src, Pn * lmt * nb - 1), axis=0)
        out = jnp.where((grow < n)[:, None], out, 0)   # zeroed padding
    else:
        lnt = ln // nb
        allc = lax.all_gather(a, COL_AXIS)               # (Q, lm, ln)
        glob = allc.reshape(Qn, lm, lnt, nb).transpose(1, 2, 0, 3) \
            .reshape(lm, Qn * lnt * nb)
        gcol = (jnp.arange(lnt) * Qn + q).repeat(nb) * nb + \
            jnp.tile(jnp.arange(nb), lnt)
        src = jnp.where(gcol < n, perm[jnp.minimum(gcol, n - 1)], gcol)
        out = jnp.take(glob, jnp.minimum(src, Qn * lnt * nb - 1), axis=1)
        out = jnp.where((gcol < n)[None, :], out, 0)   # zeroed padding
    return out[None, None]


@functools.partial(jax.jit, static_argnames=("nb", "n", "axis", "mesh"))
def _permute_dist(data, perm, *, nb, n, axis, mesh):
    spec = P(ROW_AXIS, COL_AXIS, None, None)
    fn = jax.shard_map(
        functools.partial(_permute_shardfn, nb=nb, n=n, axis=axis),
        mesh=mesh, in_specs=(spec, P()), out_specs=spec, check_vma=False)
    return fn(data, perm)


def permute(a: DistMatrix, perm, axis: int = 0) -> DistMatrix:
    """Distributed permutation: out rows/cols gathered by ``perm``;
    device-resident (no host round-trip), padding rows/cols preserved."""
    n = a.dist.size[axis]
    perm = jnp.asarray(perm, jnp.int32)
    out = _permute_dist(a.data, perm, nb=a.block_size, n=n, axis=axis,
                        mesh=a.grid.mesh)
    return DistMatrix(out, a.dist, a.grid)
