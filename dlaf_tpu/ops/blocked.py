"""Blocked recursive BLAS-3/LAPACK building blocks (single device).

The reference expresses POTRF/TRSM/TRMM/HERK as dynamic task graphs over
tiles (``factorization/cholesky/impl.h:151-189``,
``solver/triangular/impl.h:236-473``, ...). On TPU the idiomatic equivalent is
*static recursive blocking*: each operation splits at tile-aligned midpoints
into sub-operations plus large GEMMs, unrolled at trace time into one XLA
program. XLA's async scheduler then provides the overlap the pika runtime gave
the reference, and every flop lands on the MXU through a large matmul.

All functions require dimensions to be multiples of the leaf size ``nb``
(the public API pads, see :mod:`dlaf_tpu.api`), are dtype-generic, and follow
BLAS semantics for which triangle is read/written.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..types import Trans
from .core import ct, mm, op_mat, set_tri, symmetrize_tri, take_tri
from .leaf import potrf_leaf, trsm_leaf


def _split(n: int, nb: int) -> int:
    """Largest tile-aligned split point <= n/2 (at least one tile)."""
    return max(n // (2 * nb), 1) * nb


def _op(a, trans):
    return op_mat(a, Trans(trans))


# ---------------------------------------------------------------------------
# POTRF


def potrf_lower(a, nb: int):
    """Lower Cholesky of SPD ``a``; returns L with strictly-upper part zero.

    Reference algorithm: tiled right-looking Cholesky
    (``factorization/cholesky/impl.h:151-189``); here as a recursive blocked
    factorization, mathematically identical ordering of the same tile ops.
    """
    n = a.shape[0]
    assert n % nb == 0, (n, nb)
    if n <= nb:
        return potrf_leaf(a)
    n1 = _split(n, nb)
    l11 = potrf_lower(a[:n1, :n1], nb)
    # A21 <- A21 * L11^-H  (tile::trsm Right/Lower/ConjTrans, blas/tile.h:473)
    l21 = trsm(a[n1:, :n1], l11, side="R", lower=True, trans="C", unit=False, nb=nb)
    # A22 <- A22 - L21 L21^H (tile::herk / gemm trailing update)
    a22 = herk(a[n1:, n1:], l21, lower=True, trans="N", alpha=-1.0, beta=1.0, nb=nb)
    l22 = potrf_lower(a22, nb)
    top = jnp.concatenate([l11, jnp.zeros((n1, n - n1), a.dtype)], axis=1)
    bot = jnp.concatenate([l21, l22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


# ---------------------------------------------------------------------------
# TRSM — triangular solve with multiple RHS


def trsm(b, a, *, side: str, lower: bool, trans: str, unit: bool, nb: int, alpha=1.0):
    """Solve op(A) X = alpha B (side='L') or X op(A) = alpha B (side='R').

    All 8 side/uplo/trans cases of the reference's triangular solver
    (``solver/triangular/impl.h:236-473``). Right-side cases reduce to left
    cases by transposition:  X op(A) = B  <=>  op(A)^T X^T = B^T  (and for
    op='C' conjugate both sides so the left solve uses op='N').
    """
    if side == "R":
        if trans == "C":
            y = _trsm_left(jnp.conj(alpha) * ct(b), a, lower, "N", unit, nb)
            return ct(y)
        tt = {"N": "T", "T": "N"}[trans]
        return _trsm_left(alpha * b.T, a, lower, tt, unit, nb).T
    return _trsm_left(alpha * b, a, lower, trans, unit, nb)


def _trsm_left(b, a, lower, trans, unit, nb):
    n = a.shape[0]
    assert n % nb == 0 and b.shape[0] == n
    if n <= nb:
        return trsm_leaf(a, b, left=True, lower=lower, trans=trans, unit=unit)
    n1 = _split(n, nb)
    a11, a22 = a[:n1, :n1], a[n1:, n1:]
    off = a[n1:, :n1] if lower else a[:n1, n1:]
    b1, b2 = b[:n1], b[n1:]
    forward = (lower and trans == "N") or (not lower and trans != "N")
    if forward:
        x1 = _trsm_left(b1, a11, lower, trans, unit, nb)
        # op(A) block below-left: A21 (lower,N) or op(A12) (upper,T/C)
        m = off if (lower and trans == "N") else _op(off, trans)
        x2 = _trsm_left(b2 - mm(m, x1), a22, lower, trans, unit, nb)
    else:
        x2 = _trsm_left(b2, a22, lower, trans, unit, nb)
        m = off if (not lower and trans == "N") else _op(off, trans)
        x1 = _trsm_left(b1 - mm(m, x2), a11, lower, trans, unit, nb)
    return jnp.concatenate([x1, x2], axis=0)


# ---------------------------------------------------------------------------
# TRMM — triangular matrix multiply


def trmm(b, a, *, side: str, lower: bool, trans: str, unit: bool, nb: int, alpha=1.0):
    """B <- alpha op(A) B (side='L') or alpha B op(A) (side='R').

    Reference: ``multiplication/triangular`` (8 local cases,
    ``multiplication/triangular/api.h:17-75``).
    """
    if side == "R":
        if trans == "C":
            y = jnp.conj(alpha) * _trmm_left(ct(b), a, lower, "N", unit, nb)
            return ct(y)
        tt = {"N": "T", "T": "N"}[trans]
        return alpha * _trmm_left(b.T, a, lower, tt, unit, nb).T
    return alpha * _trmm_left(b, a, lower, trans, unit, nb)


def _trmm_left(b, a, lower, trans, unit, nb):
    n = a.shape[0]
    assert n % nb == 0 and b.shape[0] == n
    if n <= nb:
        return mm(take_tri(a, lower, unit), b, ta=Trans(trans))
    n1 = _split(n, nb)
    a11, a22 = a[:n1, :n1], a[n1:, n1:]
    off = a[n1:, :n1] if lower else a[:n1, n1:]
    b1, b2 = b[:n1], b[n1:]
    y1 = _trmm_left(b1, a11, lower, trans, unit, nb)
    y2 = _trmm_left(b2, a22, lower, trans, unit, nb)
    # op(A)'s off-diagonal block contributes to one half
    low_block = (lower and trans == "N") or (not lower and trans != "N")
    m = off if (trans == "N") else _op(off, trans)
    if low_block:
        y2 = y2 + mm(m, b1)
    else:
        y1 = y1 + mm(m, b2)
    return jnp.concatenate([y1, y2], axis=0)


# ---------------------------------------------------------------------------
# HERK / HER2K — hermitian rank-k updates (only referenced triangle written)


def herk(c, a, *, lower: bool, trans: str, alpha=1.0, beta=1.0, nb: int = 128):
    """C <- alpha op(A) op(A)^H + beta C on the referenced triangle.

    trans='N': op(A)=A (n x k); trans='C': op(A)=A^H (reference tile::herk,
    ``blas/tile.h:473-479``). Recursive: off-diagonal quadrants are plain
    GEMMs, only leaf diagonal blocks compute a wasted half-triangle.
    """
    n = c.shape[0]
    if n <= nb:
        g = mm(a, a, ta=Trans.NoTrans if trans == "N" else Trans.ConjTrans,
               tb=Trans.ConjTrans if trans == "N" else Trans.NoTrans)
        return set_tri(c, beta * c + alpha * g, lower)
    n1 = _split(n, nb)
    a1, a2 = (a[:n1], a[n1:]) if trans == "N" else (a[:, :n1], a[:, n1:])
    c11 = herk(c[:n1, :n1], a1, lower=lower, trans=trans, alpha=alpha, beta=beta, nb=nb)
    c22 = herk(c[n1:, n1:], a2, lower=lower, trans=trans, alpha=alpha, beta=beta, nb=nb)
    ta = Trans.NoTrans if trans == "N" else Trans.ConjTrans
    tb = Trans.ConjTrans if trans == "N" else Trans.NoTrans
    if lower:
        c21 = beta * c[n1:, :n1] + alpha * mm(a2, a1, ta=ta, tb=tb)
        top = jnp.concatenate([c11, c[:n1, n1:]], axis=1)
        bot = jnp.concatenate([c21, c22], axis=1)
    else:
        c12 = beta * c[:n1, n1:] + alpha * mm(a1, a2, ta=ta, tb=tb)
        top = jnp.concatenate([c11, c12], axis=1)
        bot = jnp.concatenate([c[n1:, :n1], c22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def her2k(c, a, b, *, lower: bool, trans: str, alpha=1.0, beta=1.0, nb: int = 128):
    """C <- alpha op(A) op(B)^H + conj(alpha) op(B) op(A)^H + beta C."""
    ta = Trans.NoTrans if trans == "N" else Trans.ConjTrans
    tb = Trans.ConjTrans if trans == "N" else Trans.NoTrans
    n = c.shape[0]
    if n <= nb:
        g = alpha * mm(a, b, ta=ta, tb=tb)
        g = g + jnp.conj(alpha) * mm(b, a, ta=ta, tb=tb)
        return set_tri(c, beta * c + g, lower)
    n1 = _split(n, nb)
    if trans == "N":
        a1, a2, b1, b2 = a[:n1], a[n1:], b[:n1], b[n1:]
    else:
        a1, a2, b1, b2 = a[:, :n1], a[:, n1:], b[:, :n1], b[:, n1:]
    c11 = her2k(c[:n1, :n1], a1, b1, lower=lower, trans=trans, alpha=alpha, beta=beta, nb=nb)
    c22 = her2k(c[n1:, n1:], a2, b2, lower=lower, trans=trans, alpha=alpha, beta=beta, nb=nb)
    if lower:
        g = alpha * mm(a2, b1, ta=ta, tb=tb) + jnp.conj(alpha) * mm(b2, a1, ta=ta, tb=tb)
        c21 = beta * c[n1:, :n1] + g
        top = jnp.concatenate([c11, c[:n1, n1:]], axis=1)
        bot = jnp.concatenate([c21, c22], axis=1)
    else:
        g = alpha * mm(a1, b2, ta=ta, tb=tb) + jnp.conj(alpha) * mm(b1, a2, ta=ta, tb=tb)
        c12 = beta * c[:n1, n1:] + g
        top = jnp.concatenate([c11, c12], axis=1)
        bot = jnp.concatenate([c[n1:, :n1], c22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


# ---------------------------------------------------------------------------
# HEMM — hermitian matrix multiply


def hemm(c, a, b, *, side: str, lower: bool, alpha=1.0, beta=0.0):
    """C <- alpha A B + beta C ('L') or alpha B A + beta C ('R'), A hermitian
    with only the ``lower``/upper triangle stored (reference
    ``multiplication/hermitian/impl.h:68``). Materializing the full hermitian
    operand costs O(n^2) bandwidth and keeps the product one large MXU GEMM.
    """
    full = symmetrize_tri(a, lower)
    prod = mm(full, b) if side == "L" else mm(b, full)
    return alpha * prod + beta * c


# ---------------------------------------------------------------------------
# GEMM


def gemm(c, a, b, *, transa: str = "N", transb: str = "N", alpha=1.0, beta=0.0):
    """C <- alpha op(A) op(B) + beta C (reference ``multiplication/general``)."""
    return alpha * mm(a, b, ta=Trans(transa), tb=Trans(transb)) + beta * c
