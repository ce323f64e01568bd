"""Distributed tiled Cholesky factorization (POTRF).

TPU-native re-design of the reference's distributed right-looking Cholesky
(``factorization/cholesky/impl.h:192-313``): the same k-loop over diagonal
tiles, but expressed as one SPMD program over a 2-D device mesh:

  - diagonal-tile broadcast down the grid column -> masked ``psum`` over both
    axes (reference ``impl.h:241-251`` col-comm ``MPI_Ibcast``),
  - panel TRSM on the owning grid column -> local slab solve + row-broadcast
    (reference ``impl.h:253-270``, ``broadcast_panel.h:61,125``),
  - transposed-panel redistribution -> ``all_gather`` over the row axis
    (reference's transposed Panel with StoreTransposed),
  - trailing HERK/GEMM -> one masked local GEMM per rank per step.

The reference's look-ahead/round-robin-workspace machinery is unnecessary:
XLA overlaps the collectives of step k+1 with the trailing GEMM of step k by
dataflow. Static shapes are kept by masking with global row/col indices
instead of shrinking the trailing window.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from ..comm import collectives as coll
from ..comm.mesh import COL_AXIS, ROW_AXIS
from ..matrix.dist_matrix import DistMatrix
from ..ops import blocked
from ..ops.core import ct, matmul_precision
from ..tune import get_tune_parameters


def _local_potrf_step(a, kt, *, nb, leaf_nb, glob_row, glob_col, row_tile, col_tile):
    """One k-step on the local shard ``a`` (lm, ln)."""
    p = lax.axis_index(ROW_AXIS)
    q = lax.axis_index(COL_AXIS)
    Pn = lax.axis_size(ROW_AXIS)
    Qn = lax.axis_size(COL_AXIS)
    lm, ln = a.shape

    owner_p = kt % Pn
    owner_q = kt % Qn
    lk_r = kt // Pn
    lk_c = kt // Qn

    # 1. factor the diagonal tile and broadcast it (non-owners compute junk
    #    that the masked psum discards)
    tile = lax.dynamic_slice(a, (lk_r * nb, lk_c * nb), (nb, nb))
    lkk = blocked.potrf_lower(tile, leaf_nb)
    lkk = coll.bcast2d(lkk, (owner_p, owner_q), (ROW_AXIS, COL_AXIS))

    # 2. panel solve on the owning grid column: slab <- slab * Lkk^-H
    slab = lax.dynamic_slice(a, (0, lk_c * nb), (lm, nb))
    solved = blocked.trsm(slab, lkk, side="R", lower=True, trans="C",
                          unit=False, nb=leaf_nb)
    below = (row_tile > kt)[:, None]
    newslab = jnp.where(below, solved, slab)
    cur = lax.dynamic_slice(newslab, (lk_r * nb, 0), (nb, nb))
    # write only the lower triangle of the factored tile; its strict upper
    # keeps the original content (reference potrf tile semantics)
    merged = jnp.where(jnp.tril(jnp.ones((nb, nb), jnp.bool_)), lkk, cur)
    newslab = lax.dynamic_update_slice(
        newslab, jnp.where(p == owner_p, merged, cur), (lk_r * nb, 0))
    a = lax.dynamic_update_slice(
        a, jnp.where(q == owner_q, newslab, slab), (0, lk_c * nb))

    # 3. broadcast the solved panel along the row axis (reference
    #    broadcast_panel col->rows): W holds L(i, kt) for local row tiles i>kt
    wl = jnp.where(below, newslab, jnp.zeros_like(newslab))
    w = coll.bcast(jnp.where(q == owner_q, wl, jnp.zeros_like(wl)),
                   owner_q, COL_AXIS)

    # 4. transposed panel: every rank needs L(j, kt) for its local col tiles.
    #    all_gather over the row axis then gather the owned rows.
    wall = lax.all_gather(w, ROW_AXIS)                   # (P, lm, nb)
    lmt = lm // nb
    wg = wall.reshape(Pn, lmt, nb, nb).transpose(1, 0, 2, 3).reshape(Pn * lmt, nb, nb)
    # invariant: on non-square grids ceil(nrt/Q)*Q can exceed wg's extent
    # Pn*lmt; jnp.take's clamp ('clip') gather semantics then return the last
    # row-tile, but only for col_tile entries that index PADDING column tiles
    # (global tile >= nrt), whose values are masked/ignored downstream — a
    # layout change that breaks this must mask col_tile explicitly
    wt = jnp.take(wg, col_tile, axis=0).reshape(ln, nb)  # row c -> L(gcol(c), kt)
    wt = jnp.where((col_tile.repeat(nb) > kt)[:, None], wt, jnp.zeros_like(wt))

    # 5. trailing update restricted to the global lower triangle
    upd = jnp.matmul(w, ct(wt), precision=matmul_precision())
    tril = glob_row[:, None] >= glob_col[None, :]
    return a - jnp.where(tril, upd, jnp.zeros_like(upd))


def _dist_potrf_shardfn(a4, *, nb, nrt, leaf_nb):
    a = a4[0, 0]
    p = lax.axis_index(ROW_AXIS)
    q = lax.axis_index(COL_AXIS)
    Pn = lax.axis_size(ROW_AXIS)
    Qn = lax.axis_size(COL_AXIS)
    lm, ln = a.shape
    row_tile = (jnp.arange(lm // nb) * Pn + p)
    col_tile = (jnp.arange(ln // nb) * Qn + q)
    glob_row = row_tile.repeat(nb) * nb + jnp.tile(jnp.arange(nb), lm // nb)
    glob_col = col_tile.repeat(nb) * nb + jnp.tile(jnp.arange(nb), ln // nb)
    row_tile_el = row_tile.repeat(nb)

    step = functools.partial(_local_potrf_step, nb=nb, leaf_nb=leaf_nb,
                             glob_row=glob_row, glob_col=glob_col,
                             row_tile=row_tile_el, col_tile=col_tile)
    a = lax.fori_loop(0, nrt, lambda k, x: step(x, k), a)
    return a[None, None]


@functools.partial(jax.jit, static_argnames=("nb", "nrt", "leaf_nb", "mesh"))
def _dist_potrf(data, *, nb, nrt, leaf_nb, mesh):
    spec = P(ROW_AXIS, COL_AXIS, None, None)
    fn = jax.shard_map(
        functools.partial(_dist_potrf_shardfn, nb=nb, nrt=nrt, leaf_nb=leaf_nb),
        mesh=mesh, in_specs=(spec,), out_specs=spec)
    return fn(data)


def cholesky(a: DistMatrix) -> DistMatrix:
    """Distributed lower Cholesky: factor in the global lower triangle, the
    strict upper triangle keeps the original content (reference semantics).
    """
    m, n = a.dist.size
    assert m == n, "cholesky needs a square matrix"
    nb = a.block_size
    nrt = a.dist.nr_tiles[0]
    leaf = min(get_tune_parameters().leaf_block_size, nb)
    out = _dist_potrf(a.data, nb=nb, nrt=nrt, leaf_nb=leaf, mesh=a.grid.mesh)
    return DistMatrix(out, a.dist, a.grid)


def cholesky_info(a: DistMatrix):
    """Distributed Cholesky plus LAPACK-style info: (L, info).

    info == 0 on success, else the 1-based index of the first non-positive /
    non-finite factor pivot (reference ``tile::potrfInfo``,
    ``lapack/tile.h:615-616``). The diagonal check runs device-side
    (``DistMatrix.diagonal``) — no host gather of the matrix.
    """
    out = cholesky(a)
    d = jnp.real(out.diagonal())
    bad = (~jnp.isfinite(d)) | (d <= 0)
    info = jnp.where(jnp.any(bad), jnp.argmax(bad) + 1, 0).astype(jnp.int32)
    return out, info
