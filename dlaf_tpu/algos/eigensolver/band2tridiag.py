"""Stage 2: band -> tridiagonal via Householder bulge chasing.

TPU-native re-design of the reference's ``band_to_tridiag``
(``eigensolver/band_to_tridiag/mc.h:438-990``): the same sweep/chase
structure (sweep s eliminates column s below the first subdiagonal, then
chases the fill-in bulge down in steps of the bandwidth), but expressed as a
two-level ``fori_loop`` over (sweep, chase) with static-size windowed
two-sided updates, instead of the reference's SweepWorker pipeline with
counting semaphores.

Every reflector (length ``b``) is recorded — the analog of the reference's
``TridiagResult::hh_reflectors`` (``band_to_tridiag/api.h:19``) — so the
back-transformation can be applied to the eigenvectors later
(``bt_band_to_tridiag``).

The matrix is kept as a full symmetric dense array padded by ``3b+2`` on each
side so every dynamic window slice is in-bounds without clamping; entries
outside the real matrix are zero and make the corresponding reflectors no-ops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ...ops.core import matmul_precision
from ...ops.householder import householder_vector
from ...types import is_complex_dtype


@functools.partial(jax.jit, static_argnames=("b",))
def band_to_tridiag(band_dense, b: int):
    """Reduce a dense symmetric band matrix (bandwidth ``b``) to tridiagonal.

    Returns (d, e, vs, taus): diagonal (n,), subdiagonal (n-1,), recorded
    reflectors vs (nsweeps, ncmax, b) and taus (nsweeps, ncmax) where the
    chase-c reflector of sweep s acts on rows [s + 1 + c*b, s + 1 + (c+1)*b).
    """
    n = band_dense.shape[0]
    if b == 1 or n <= 2:
        d = jnp.diagonal(band_dense)
        e = jnp.diagonal(band_dense, -1)
        vs = jnp.zeros((1, 1, b), band_dense.dtype)
        taus = jnp.zeros((1, 1), band_dense.dtype)
        return jnp.real(d), e, vs, taus

    pad = 3 * b + 2
    npd = n + 2 * pad
    bp = jnp.zeros((npd, npd), band_dense.dtype)
    bp = lax.dynamic_update_slice(bp, band_dense, (pad, pad))

    nsweeps = n - 2
    ncmax = -(-(n - 1) // b)          # ceil((n-1)/b)
    win = 3 * b + 2

    vs0 = jnp.zeros((nsweeps, ncmax, b), band_dense.dtype)
    taus0 = jnp.zeros((nsweeps, ncmax), band_dense.dtype)

    def chase(c, carry):
        s, a, vs, taus = carry
        i0 = s + 1 + c * b                      # reflector rows [i0, i0+b)
        j = jnp.where(c == 0, s, s + 1 + (c - 1) * b)  # column to clean
        i0p = i0 + pad
        jp = j + pad
        x = lax.dynamic_slice(a, (i0p, jp), (b, 1))[:, 0]
        v, tau, beta = householder_vector(x, 0)
        # write the eliminated column: beta at head, zeros below
        newcol = jnp.where(jnp.arange(b) == 0, beta, 0)[:, None]
        a = lax.dynamic_update_slice(a, newcol.astype(a.dtype), (i0p, jp))
        # mirror (symmetric storage)
        newrow = jnp.conj(newcol.T) if is_complex_dtype(a.dtype) else newcol.T
        a = lax.dynamic_update_slice(a, newrow.astype(a.dtype), (jp, i0p))

        # two-sided windowed update on cols/rows (j, j + win]
        w0 = jp + 1
        srow = lax.dynamic_slice(a, (i0p, w0), (b, win))
        srow = srow - tau * v[:, None] * jnp.matmul(
            jnp.conj(v)[None, :], srow, precision=matmul_precision())
        a = lax.dynamic_update_slice(a, srow, (i0p, w0))
        scol = lax.dynamic_slice(a, (w0, i0p), (win, b))
        sv = jnp.matmul(scol, v[:, None], precision=matmul_precision())
        scol = scol - (jnp.conj(tau) if is_complex_dtype(a.dtype) else tau) \
            * sv * jnp.conj(v)[None, :]
        a = lax.dynamic_update_slice(a, scol, (w0, i0p))

        vs = lax.dynamic_update_slice(vs, v[None, None, :], (s, c, 0))
        taus = lax.dynamic_update_slice(taus, tau[None, None], (s, c))
        return s, a, vs, taus

    def sweep(s, carry):
        a, vs, taus = carry
        nc = jnp.maximum(0, -(-(n - 1 - s) // b))  # ceil((n-1-s)/b)
        _, a, vs, taus = lax.fori_loop(0, nc, chase, (s, a, vs, taus))
        return a, vs, taus

    a, vs, taus = lax.fori_loop(0, nsweeps, sweep, (bp, vs0, taus0))
    full = lax.dynamic_slice(a, (pad, pad), (n, n))
    d = jnp.real(jnp.diagonal(full))
    e = jnp.diagonal(full, -1)
    return d, e, vs, taus
