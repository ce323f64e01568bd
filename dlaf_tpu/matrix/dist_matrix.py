"""Distributed matrix in canonical block-cyclic shard layout.

TPU-native analog of the reference's ``Matrix<T, Device>``
(``matrix/matrix.h:58``): a ``jax.Array`` of shape (P, Q, lm, ln) sharded so
device (p, q) holds its packed local matrix (see
:mod:`dlaf_tpu.dist.layout`), plus the ``Distribution`` metadata. Tile
pipelines/senders have no equivalent: inside ``shard_map`` the local shard is
a dense array and XLA orders all accesses by dataflow.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..comm.mesh import Grid
from ..dist import Distribution, gather_from_shards, scatter_to_shards


@dataclasses.dataclass
class DistMatrix:
    data: jax.Array            # (P, Q, lm, ln), sharded over the grid
    dist: Distribution
    grid: Grid

    @classmethod
    def from_global(cls, a, nb: int, grid: Grid, pad_identity: bool = False):
        """Scatter a host/global (m, n) array onto the grid.

        ``pad_identity`` puts an identity block on the padded diagonal
        (needed so triangular/SPD algorithms can run on the padded shape).
        """
        m, n = a.shape
        d = Distribution((m, n), (nb, nb), grid.grid_size)
        pm, pn = d.padded_size
        ap = jnp.pad(a, ((0, pm - m), (0, pn - n)))
        if pad_identity:
            k = min(pm, pn)
            eye = jnp.eye(k, dtype=a.dtype)
            mask = jnp.pad(jnp.ones((m, n), jnp.bool_), ((0, pm - m), (0, pn - n)))
            ap = jnp.where(mask, ap, jnp.pad(eye, ((0, pm - k), (0, pn - k))))
        shards = scatter_to_shards(ap, d)
        data = jax.device_put(shards, grid.canonical_sharding())
        return cls(data, d, grid)

    @classmethod
    def from_callback(cls, cb, size, nb: int, grid: Grid, dtype):
        """Build a DistMatrix without ever materializing the global array:
        ``cb((row_slice, col_slice)) -> ndarray`` is called once per needed
        global region, only for shards addressable by THIS process — the
        multi-host construction path (each host fills only its devices'
        shards; the reference reads user/ScaLAPACK-owned local memory the
        same way, ``src/c_api/utils.cpp:68``). Out-of-range (padding)
        regions are requested clamped and zero-filled here.
        """
        import numpy as np

        m, n = size
        d = Distribution((m, n), (nb, nb), grid.grid_size)
        pm, pn = d.padded_size
        Pg, Qg = grid.grid_size
        lmt, lnt = d.max_local_nr_tiles
        lm, ln = lmt * nb, lnt * nb

        def shard_cb(index):
            # index: the (P, Q, lm, ln) global-array slices of this shard
            p = index[0].start or 0
            q = index[1].start or 0
            out = np.zeros((1, 1, lm, ln), dtype)
            for lt in range(lmt):
                gr = (lt * Pg + p) * nb
                if gr >= m:
                    continue
                for ct in range(lnt):
                    gc = (ct * Qg + q) * nb
                    if gc >= n:
                        continue
                    blk = np.asarray(cb((slice(gr, min(gr + nb, m)),
                                         slice(gc, min(gc + nb, n)))))
                    out[0, 0, lt * nb:lt * nb + blk.shape[0],
                        ct * nb:ct * nb + blk.shape[1]] = blk
            return out

        data = jax.make_array_from_callback(
            (Pg, Qg, lm, ln), grid.canonical_sharding(), shard_cb)
        return cls(data, d, grid)

    def to_global(self):
        """Gather to a single (m, n) array (unpadded)."""
        full = gather_from_shards(jax.device_get(self.data), self.dist)
        m, n = self.dist.size
        return full[:m, :n]

    def diagonal(self) -> jax.Array:
        """Replicated (min(m, n),) diagonal, extracted device-side with one
        masked pass per shard + psum (no host gather)."""
        nb = self.dist.block_size[0]
        pm = self.dist.padded_size[0]
        d = _dist_diagonal(self.data, nb=nb, pm=pm, mesh=self.grid.mesh)
        return d[: min(self.dist.size)]

    def transpose(self, conj: bool = True) -> "DistMatrix":
        """Distributed (conjugate) transpose, fully device-resident.

        On square grids this is a pure axis swap of the canonical layout
        (shard (p,q) -> (q,p), local shards transposed) — XLA lowers the
        resharding to a collective permute over ICI. Non-square grids run a
        jitted global-view relayout (gather_from_shards -> T ->
        scatter_to_shards under a canonical sharding constraint): GSPMD
        inserts the redistribution collectives; no host round-trip
        (reference analog: the transposed-Panel + all-to-all machinery,
        ``matrix/panel.h:483``, ``permutations/general/impl.h:230-303``).
        """
        from ..dist import Distribution

        P, Q = self.grid.grid_size
        m, n = self.dist.size
        newdist = Distribution((n, m), self.dist.block_size[::-1],
                               self.grid.grid_size, self.src_rank_t())
        if P == Q:
            data = self.data.transpose(1, 0, 3, 2)
            if conj:
                data = jnp.conj(data)
            data = jax.device_put(data, self.grid.canonical_sharding())
            return DistMatrix(data, newdist, self.grid)
        newdist = Distribution((n, m), self.dist.block_size[::-1],
                               self.grid.grid_size)
        data = _transpose_global(self.data, dist=self.dist, newdist=newdist,
                                 conj=conj, sharding=self.grid.canonical_sharding())
        return DistMatrix(data, newdist, self.grid)

    def symmetrize(self, lower: bool = True) -> "DistMatrix":
        """Fill the other triangle from the stored one, device-resident
        (A <- tril(A) + tril(A,-1)^H for ``lower``)."""
        data = _symmetrize_global(self.data, dist=self.dist, lower=lower,
                                  sharding=self.grid.canonical_sharding())
        return DistMatrix(data, self.dist, self.grid)

    def src_rank_t(self):
        return (self.dist.src_rank[1] % self.grid.grid_size[0],
                self.dist.src_rank[0] % self.grid.grid_size[1])

    @property
    def block_size(self) -> int:
        return self.dist.block_size[0]

    @property
    def local_shape(self):
        return self.data.shape[-2:]


@functools.partial(jax.jit, static_argnames=("dist", "newdist", "conj", "sharding"))
def _transpose_global(data, *, dist, newdist, conj, sharding):
    from ..dist import gather_from_shards, scatter_to_shards
    g = gather_from_shards(data, dist)
    m, n = dist.size
    gt = g[:m, :n].conj().T if conj else g[:m, :n].T
    pm2, pn2 = newdist.padded_size
    gt = jnp.pad(gt, ((0, pm2 - n), (0, pn2 - m)))
    return jax.lax.with_sharding_constraint(scatter_to_shards(gt, newdist),
                                            sharding)


@functools.partial(jax.jit, static_argnames=("dist", "lower", "sharding"))
def _symmetrize_global(data, *, dist, lower, sharding):
    from ..dist import gather_from_shards, scatter_to_shards
    from ..ops.core import symmetrize_tri
    g = gather_from_shards(data, dist)
    m, n = dist.size
    full = symmetrize_tri(g[:m, :n], lower)
    pm, pn = dist.padded_size
    full = jnp.pad(full, ((0, pm - m), (0, pn - n)))
    return jax.lax.with_sharding_constraint(scatter_to_shards(full, dist),
                                            sharding)


def _diag_shardfn(a4, *, nb, pm):
    import jax.numpy as jnp
    from jax import lax
    from ..comm.mesh import COL_AXIS, ROW_AXIS
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
    eq = grow[:, None] == gcol[None, :]
    loc = jnp.sum(jnp.where(eq, a, 0), axis=1)
    owned = jnp.any(eq, axis=1)
    out = jnp.zeros((pm,), a.dtype)
    out = out.at[jnp.minimum(grow, pm - 1)].add(
        jnp.where(owned & (grow < pm), loc, 0))
    return lax.psum(lax.psum(out, ROW_AXIS), COL_AXIS)


@functools.partial(jax.jit, static_argnames=("nb", "pm", "mesh"))
def _dist_diagonal(data, *, nb, pm, mesh):
    from jax.sharding import PartitionSpec as P
    from ..comm.mesh import COL_AXIS, ROW_AXIS
    fn = jax.shard_map(
        functools.partial(_diag_shardfn, nb=nb, pm=pm),
        mesh=mesh, in_specs=(P(ROW_AXIS, COL_AXIS, None, None),),
        out_specs=P())
    return fn(data)


jax.tree_util.register_pytree_node(
    DistMatrix,
    lambda dm: ((dm.data,), (dm.dist, dm.grid)),
    lambda aux, children: DistMatrix(children[0], aux[0], aux[1]),
)
