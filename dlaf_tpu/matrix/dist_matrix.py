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

    def to_global(self):
        """Gather to a single (m, n) array (unpadded)."""
        full = gather_from_shards(jax.device_get(self.data), self.dist)
        m, n = self.dist.size
        return full[:m, :n]

    def transpose(self, conj: bool = True) -> "DistMatrix":
        """Distributed (conjugate) transpose.

        On square grids this is a pure axis swap of the canonical layout
        (shard (p,q) -> (q,p), local shards transposed) — XLA lowers the
        resharding to a collective permute over ICI. Non-square grids fall
        back to gather/rescatter on the host.
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
        g = self.to_global()
        g = g.conj().T if conj else g.T
        return DistMatrix.from_global(jnp.asarray(g), self.dist.block_size[1],
                                      self.grid)

    def src_rank_t(self):
        return (self.dist.src_rank[1] % self.grid.grid_size[0],
                self.dist.src_rank[0] % self.grid.grid_size[1])

    @property
    def block_size(self) -> int:
        return self.dist.block_size[0]

    @property
    def local_shape(self):
        return self.data.shape[-2:]


jax.tree_util.register_pytree_node(
    DistMatrix,
    lambda dm: ((dm.data,), (dm.dist, dm.grid)),
    lambda aux, children: DistMatrix(children[0], aux[0], aux[1]),
)
