"""LAPACK-flavored single-device API.

Public entry points mirroring the reference's algorithm free functions
(``dlaf::cholesky_factorization`` ``factorization/cholesky.h:40``,
``dlaf::triangular_solver`` ``solver/triangular.h``,
``dlaf::triangular_multiplication``, ``dlaf::hermitian_multiplication``,
``multiplication/general.h``) in their local (non-distributed) variants.

Arbitrary sizes are supported by tile-aligned padding: POTRF/TRSM pad the
triangular operand with an identity block, everything else zero-pads.
All functions are jitted with static flags.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import blocked
from ..ops.core import ct
from ..tune import get_tune_parameters


def _leaf_nb(nb=None):
    return int(nb or get_tune_parameters().leaf_block_size)


def _pad_up(n, nb):
    return (-n) % nb


def _pad_tri_identity(a, nb):
    """Pad square ``a`` to a multiple of nb, identity on the padded diagonal."""
    n = a.shape[0]
    p = _pad_up(n, nb)
    if p == 0:
        return a
    ap = jnp.pad(a, ((0, p), (0, p)))
    return ap.at[n:, n:].set(jnp.eye(p, dtype=a.dtype))


def _pad_zero(a, nb, axes=(0, 1)):
    pads = [(0, _pad_up(a.shape[i], nb)) if i in axes else (0, 0)
            for i in range(a.ndim)]
    if all(p == (0, 0) for p in pads):
        return a
    return jnp.pad(a, pads)


@functools.partial(jax.jit, static_argnames=("uplo", "nb", "clean"))
def potrf(a, uplo: str = "L", nb: int | None = None, clean: bool = True):
    """Cholesky factor of hermitian positive definite ``a`` (referenced
    triangle only is read). With ``clean`` the other triangle is zeroed;
    without it it keeps the original content (reference in-place semantics,
    saves one full memory pass).

    Reference: ``dlaf::cholesky_factorization`` (``factorization/cholesky.h:40``).
    """
    nb = _leaf_nb(nb)
    n = a.shape[0]
    if uplo == "U":
        up = blocked.potrf_upper(_pad_tri_identity(a, nb), nb, clean=clean)
        return up[:n, :n]
    lp = blocked.potrf_lower(_pad_tri_identity(a, nb), nb, clean=clean)
    return lp[:n, :n]


@functools.partial(jax.jit, static_argnames=("uplo", "nb", "clean"))
def potrf_info(a, uplo: str = "L", nb: int | None = None, clean: bool = True):
    """Cholesky factor plus a LAPACK-style info channel: (L, info).

    info == 0 on success; otherwise the 1-based index of the first column
    whose factor diagonal is non-positive or non-finite. A non-SPD pivot
    turns into NaN through the rsqrt and propagates forward; the leaf kernel
    may NaN its whole tile, so info identifies the failing pivot to within
    its tile (the reference's ``potrfInfo`` is likewise per-tile,
    ``lapack/tile.h:615-616``, ``src/cusolver/assert_info.cu:49``).
    """
    l = potrf(a, uplo=uplo, nb=nb, clean=clean)
    d = jnp.real(jnp.diagonal(l))
    bad = (~jnp.isfinite(d)) | (d <= 0)
    info = jnp.where(jnp.any(bad), jnp.argmax(bad) + 1, 0).astype(jnp.int32)
    return l, info


@functools.partial(jax.jit, static_argnames=("side", "uplo", "trans", "diag", "nb"))
def trsm(a, b, side: str = "L", uplo: str = "L", trans: str = "N",
         diag: str = "N", alpha=1.0, nb: int | None = None):
    """Solve op(A) X = alpha B or X op(A) = alpha B, A triangular.

    Reference: ``dlaf::triangular_solver`` (``solver/triangular.h``), all 8
    side/uplo/trans cases plus unit diagonal.
    """
    nb = _leaf_nb(nb)
    m, n = b.shape
    ap = _pad_tri_identity(a, nb)
    bp = _pad_zero(b, nb)
    x = blocked.trsm(bp, ap, side=side, lower=(uplo == "L"), trans=trans,
                     unit=(diag == "U"), nb=nb, alpha=alpha)
    return x[:m, :n]


@functools.partial(jax.jit, static_argnames=("side", "uplo", "trans", "diag", "nb"))
def trmm(a, b, side: str = "L", uplo: str = "L", trans: str = "N",
         diag: str = "N", alpha=1.0, nb: int | None = None):
    """B <- alpha op(A) B or alpha B op(A), A triangular.

    Reference: ``dlaf::triangular_multiplication`` (``multiplication/triangular.h``).
    """
    nb = _leaf_nb(nb)
    m, n = b.shape
    ap = _pad_zero(a, nb)
    bp = _pad_zero(b, nb)
    x = blocked.trmm(bp, ap, side=side, lower=(uplo == "L"), trans=trans,
                     unit=(diag == "U"), nb=nb, alpha=alpha)
    return x[:m, :n]


@functools.partial(jax.jit, static_argnames=("side", "uplo",))
def hemm(a, b, c=None, side: str = "L", uplo: str = "L", alpha=1.0, beta=0.0):
    """C <- alpha A B + beta C (or B A), A hermitian (triangle-stored).

    Reference: ``dlaf::hermitian_multiplication`` (``multiplication/hermitian.h``).
    """
    if c is None:
        c = jnp.zeros(b.shape, b.dtype)
        beta = 0.0
    return blocked.hemm(c, a, b, side=side, lower=(uplo == "L"),
                        alpha=alpha, beta=beta)


@functools.partial(jax.jit, static_argnames=("uplo", "trans"))
def herk(a, c, uplo: str = "L", trans: str = "N", alpha=1.0, beta=1.0):
    """C <- alpha op(A) op(A)^H + beta C on the referenced triangle."""
    return blocked.herk(c, a, lower=(uplo == "L"), trans=trans,
                        alpha=alpha, beta=beta, nb=_leaf_nb())


@functools.partial(jax.jit, static_argnames=("transa", "transb"))
def gemm(a, b, c=None, transa: str = "N", transb: str = "N", alpha=1.0, beta=0.0):
    """C <- alpha op(A) op(B) + beta C (reference ``multiplication/general.h:52``)."""
    if c is None:
        from ..ops.core import mm
        from ..types import Trans
        return alpha * mm(a, b, ta=Trans(transa), tb=Trans(transb))
    return blocked.gemm(c, a, b, transa=transa, transb=transb, alpha=alpha, beta=beta)
