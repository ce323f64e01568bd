"""Pallas TPU kernel: fused trailing update C <- C - X^T Y (f32, bf16_3x).

The POTRF hot loop spends ~all its flops in the trailing rank-k updates
(reference trailing herk/gemm, ``factorization/cholesky/impl.h:273-300``).
XLA emits dot + subtract as separate HLOs; the fusion that matters for the
last few % of the ceiling is (a) accumulating the three bf16 passes AND the
C-subtract in one VMEM-resident accumulator, and (b) never writing the
intermediate product to HBM.  This kernel does exactly that: grid over
(M, N) output blocks x K accumulation steps, C loaded once into a VMEM
scratch accumulator, three-term bf16 decomposition (hi*hi + lo*hi + hi*lo,
the same "bf16_3x" scheme as ``Precision.HIGH`` f32 matmul) per K block.

Both operands arrive K-major ((k, m) and (k, n)) — the layout the upper
POTRF panel solve naturally produces — so the MXU contraction runs on
axis 0 of both and no operand is ever physically transposed.

Opt-in via ``TuneParameters.potrf_trailing_kernel = "pallas"``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DN_KM = (((0,), (0,)), ((), ()))   # X (k, m): contract axis 0 of both
_DN_NN = (((1,), (0,)), ((), ()))   # X (m, k): plain NN


def _ksub_kernel(c_ref, x_ref, y_ref, o_ref, acc_ref, *, nk, dn):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = c_ref[:]

    x = x_ref[:]
    y = y_ref[:]
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    yh = y.astype(jnp.bfloat16)
    yl = (y - yh.astype(jnp.float32)).astype(jnp.bfloat16)
    g = lax.dot_general(xh, yh, dn, preferred_element_type=jnp.float32)
    g = g + lax.dot_general(xl, yh, dn, preferred_element_type=jnp.float32)
    g = g + lax.dot_general(xh, yl, dn, preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] - g

    @pl.when(kk == nk - 1)
    def _flush():
        o_ref[:] = acc_ref[:]


def _ksub_kernel_masked(c_ref, x_ref, y_ref, gr_ref, gc_ref, o_ref, acc_ref,
                        *, nk, dn):
    """ksub with a lower-triangle epilogue: entries whose global row index
    (gr, per output row) is < the global col index (gc, per output col) keep
    the original C — the distributed staircase chunk's tril mask, applied in
    VMEM so the masked product never touches HBM (the XLA formulation pays
    a full u-write + u-read + select pass per chunk).

    Blocks entirely above the diagonal (max gr < min gc) skip their MXU
    dots: the staircase chunk's conservative rectangle then over-computes
    only a block-boundary sliver instead of ~1/(2*chunks) of the area, so
    fewer/wider chunks become viable."""
    kk = pl.program_id(2)
    live = jnp.max(gr_ref[:]) >= jnp.min(gc_ref[:])

    @pl.when(live)
    def _accumulate():
        @pl.when(kk == 0)
        def _init():
            acc_ref[:] = c_ref[:]

        x = x_ref[:]
        y = y_ref[:]
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        yh = y.astype(jnp.bfloat16)
        yl = (y - yh.astype(jnp.float32)).astype(jnp.bfloat16)
        g = lax.dot_general(xh, yh, dn, preferred_element_type=jnp.float32)
        g = g + lax.dot_general(xl, yh, dn,
                                preferred_element_type=jnp.float32)
        g = g + lax.dot_general(xh, yl, dn,
                                preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] - g

    @pl.when(kk == nk - 1)
    def _flush():
        # dead blocks never touched acc_ref; keep is all-False there, so the
        # select reads only c_ref
        keep = (gr_ref[:] >= gc_ref[:]) & live  # (bm, 1) >= (1, bn)
        o_ref[:] = jnp.where(keep, acc_ref[:], c_ref[:])


def _fit(b: int, d: int) -> int:
    """Largest block size <= b that divides d (halving steps, floor 128;
    falls back to d itself for small dims)."""
    b = min(b, d)
    while b >= 128 and d % b:
        b //= 2
    return b if b >= 128 and d % b == 0 else d


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "interpret",
                                             "x_k_major"))
def ksub_matmul(c, x, y, bm: int = 256, bn: int = 256, bk: int = 512,
                interpret: bool = False, x_k_major: bool = True):
    """C - op(X) Y for f32 C (m, n), Y (k, n); X is (k, m) with
    ``x_k_major`` (op = transpose — the upper-POTRF panel layout) or
    (m, k) otherwise (plain NN — the distributed trailing-chunk layout).
    All dims must divide by the fitted block sizes (caller falls back to
    XLA otherwise)."""
    m, n = c.shape
    k = x.shape[0] if x_k_major else x.shape[1]
    bm, bn, bk = _fit(bm, m), _fit(bn, n), _fit(bk, k)
    assert m % bm == 0 and n % bn == 0 and k % bk == 0, (m, n, k, bm, bn, bk)
    nk = k // bk
    grid = (m // bm, n // bn, nk)
    if x_k_major:
        xspec = pl.BlockSpec((bk, bm), lambda i, j, kk: (kk, i))
        dn = _DN_KM
    else:
        xspec = pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk))
        dn = _DN_NN
    return pl.pallas_call(
        functools.partial(_ksub_kernel, nk=nk, dn=dn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
            xspec,
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), c.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(c, x, y)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "interpret",
                                              "x_k_major"))
def ksub_matmul_masked(c, x, y, grow, gcol, bm: int = 256, bn: int = 256,
                       bk: int = 512, interpret: bool = False,
                       x_k_major: bool = True):
    """C - op(X) Y restricted to the global lower triangle: output entry
    (i, j) is updated only where ``grow[i] >= gcol[j]`` (int32 global
    element indices, shapes (m, 1) and (1, n)); elsewhere C passes through.
    Operand layouts as in :func:`ksub_matmul`. This is the distributed
    POTRF staircase chunk (algos/cholesky.py) fused into one kernel."""
    m, n = c.shape
    k = x.shape[0] if x_k_major else x.shape[1]
    bm, bn, bk = _fit(bm, m), _fit(bn, n), _fit(bk, k)
    assert m % bm == 0 and n % bn == 0 and k % bk == 0, (m, n, k, bm, bn, bk)
    nk = k // bk
    grid = (m // bm, n // bn, nk)
    if x_k_major:
        xspec = pl.BlockSpec((bk, bm), lambda i, j, kk: (kk, i))
        dn = _DN_KM
    else:
        xspec = pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk))
        dn = _DN_NN
    return pl.pallas_call(
        functools.partial(_ksub_kernel_masked, nk=nk, dn=dn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
            xspec,
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0)),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), c.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(c, x, y, grow, gcol)


def ksub_available(c, x, y, bm=256, bn=256, bk=512,
                   x_k_major: bool = True) -> bool:
    if c.dtype != jnp.float32:
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    m, n = c.shape
    k = x.shape[0] if x_k_major else x.shape[1]
    if min(m, n, k) < 128:
        return False
    # _fit always finds a block; reject only when the fallback (whole-dim
    # block for awkward sizes) would blow the VMEM budget
    return _fit(bm, m) <= 512 and _fit(bn, n) <= 512 and _fit(bk, k) <= 2048
