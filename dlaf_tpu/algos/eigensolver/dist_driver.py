"""Distributed hermitian eigensolver driver.

Reference: distributed ``Eigensolver<B,D,T>::call``
(``eigensolver/eigensolver/impl.h:57-95``) and ``GenEigensolver::call``.

Round-1 distribution state (see README):
  - stage 1 (reduction to band, the dominant ~4n^3/3 flops) runs fully
    distributed (:mod:`dist_red2band`);
  - stage 2 (band -> tridiag) is narrow-band and latency-bound; like the
    reference, which pins it to Backend::MC with a 1-D re-distribution
    (``band_to_tridiag/api.h:37-42``), it runs replicated;
  - stage 3 (D&C) and the back-transformations currently run on the gathered
    matrix; distributing them (column-sharded eigenvector matrix) is the
    next step.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...matrix.dist_matrix import DistMatrix
from ...tune import get_tune_parameters
from .band2tridiag import band_to_tridiag_auto as band_to_tridiag
from .bt import bt_band_to_tridiag, bt_reduction_to_band
from .dist_red2band import reduction_to_band_dist
from .driver import _phase_normalize
from .red2band import extract_band
from .tridiag_dc import tridiag_eigh


def eigh_dist(a: DistMatrix, laed4_iter: int | None = None):
    """Eigen-decomposition of a distributed hermitian matrix (lower stored).

    Returns (w (n,), v DistMatrix over the same grid).
    """
    n = a.dist.size[0]
    nb = a.block_size
    pm = a.dist.padded_size[0]
    tune = get_tune_parameters()
    laed4 = laed4_iter or tune.laed4_max_iter

    # ensure decoupled padding with large separated diagonal entries so the
    # padded eigenvalues sort last (overwrite whatever padding is present)
    if pm > n:
        g = jnp.asarray(a.to_global())
        gersh = jnp.max(jnp.abs(g)) * (n + 1)
        gp = jnp.zeros((pm, pm), g.dtype)
        gp = gp.at[:n, :n].set(g)
        gp = gp.at[jnp.arange(n, pm), jnp.arange(n, pm)].set(
            gersh + 1.0 + jnp.arange(pm - n, dtype=jnp.abs(g).dtype))
        a = DistMatrix.from_global(gp, nb, a.grid)

    packed, taus1 = reduction_to_band_dist(a)

    packed_g = jnp.asarray(packed.to_global())
    band_dense = extract_band(packed_g, nb)
    d, e, vs, taus2 = band_to_tridiag(band_dense, nb)
    er, phases = _phase_normalize(e, packed_g.dtype)
    w, q = tridiag_eigh(jnp.real(d), er, laed4, mesh=a.grid.mesh)
    q = (phases[:, None] * q.astype(packed_g.dtype)).astype(packed_g.dtype)

    # back-transformations: shard the eigenvector matrix over its columns
    # (every reflector application is row-local, so GSPMD keeps the big
    # GEMMs fully distributed over the mesh)
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ...comm.mesh import COL_AXIS, ROW_AXIS
    if q.shape[1] % a.grid.mesh.devices.size == 0:
        col_sharding = NamedSharding(a.grid.mesh, P(None, (ROW_AXIS, COL_AXIS)))
        q = jax.device_put(q, col_sharding)
    q = bt_band_to_tridiag(q, vs, taus2, nb)
    q = bt_reduction_to_band(q, packed_g, taus1, nb)

    v = DistMatrix.from_global(q[:n, :n], nb, a.grid)
    return w[:n], v


def eigh_gen_dist(a: DistMatrix, b: DistMatrix, laed4_iter: int | None = None,
                  b_factorized: bool = False):
    """Distributed generalized eigensolver:
    cholesky -> gen_to_std -> eigh -> TRSM back-substitution, each stage the
    distributed implementation (reference ``gen_eigensolver/impl.h:46-93``;
    ``b_factorized`` = the reference's ``already_factorized`` mode where ``b``
    already holds the Cholesky factor L). The A symmetrization runs
    device-side (``DistMatrix.symmetrize``) — no host round-trip.
    """
    from ..cholesky import cholesky
    from ..gen_to_std import generalized_to_standard_dist
    from ..triangular import triangular_solver

    l = b if b_factorized else cholesky(b)
    afull = a.symmetrize(lower=True)
    astd = generalized_to_standard_dist(afull, l)
    w, z = eigh_dist(astd, laed4_iter)
    x = triangular_solver(l, z, uplo="L", trans="C")
    return w, x
