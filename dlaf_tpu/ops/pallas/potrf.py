"""Pallas TPU kernel: single-tile Cholesky factorization.

The analog of the reference's vendor potrf tile call (``lapack/tile.h``
``tile::potrf`` -> cusolverDnXpotrf): one VMEM-resident kernel factorizing an
nb x nb SPD tile. Computed in *upper* form (A = U^T U) so the micro-panel is
a row slab — (8, nb) sublane-major, the natural TPU layout — then transposed
to the lower factor by the caller-side wrapper.

Per 8-row step: 8 unrolled scalar pivot steps on the slab (VPU), then one
rank-8 MXU update of the trailing block. All masks are built from iota so
there is no dynamic lane indexing.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PANEL = 8


def _potrf_u_kernel(a_ref, o_ref):
    nb = a_ref.shape[0]
    o_ref[:] = a_ref[:]
    cols = jax.lax.broadcasted_iota(jnp.int32, (PANEL, nb), 1)
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (PANEL, nb), 0)

    def step(j, _):
        base = j * PANEL
        slab = o_ref[pl.ds(base, PANEL), :]            # (PANEL, nb)
        for t in range(PANEL):
            gcol = base + t
            here = cols == gcol                        # (PANEL, nb)
            # pivot = slab[t, gcol]; multipliers = slab[:, gcol]
            colvals = jnp.sum(jnp.where(here, slab, 0.0), axis=1)   # (PANEL,)
            piv = colvals[t]
            inv = lax.rsqrt(piv)
            newrow = slab[t, :] * inv
            newrow = jnp.where(cols[0] >= gcol, newrow, 0.0)
            mult = colvals * inv                       # (PANEL,)
            upd = mult[:, None] * newrow[None, :]
            slab = jnp.where(rows8 == t, newrow[None, :],
                             jnp.where(rows8 > t, slab - upd, slab))
        o_ref[pl.ds(base, PANEL), :] = slab
        # trailing rank-PANEL update: only cols >= base+PANEL contribute
        v = jnp.where(cols >= base + PANEL, slab, 0.0)
        o_ref[:] = o_ref[:] - jax.lax.dot_general(
            v, v, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)
        return 0

    lax.fori_loop(0, nb // PANEL, step, 0)


BLK = 64


def _potrf_u_kernel_blk(a_ref, o_ref):
    """Two-level blocked variant: factor 64-row panels with in-panel
    deferred rank-8 updates, then ONE rank-64 MXU update per trailing
    64-row block — 8x less full-tile traffic and a k=64 contraction the
    systolic array actually fills (the flat kernel's 64 rank-8 full-tile
    passes are latency/bandwidth-bound)."""
    nb = a_ref.shape[0]
    nblk = nb // BLK
    o_ref[:] = a_ref[:]
    cols8 = jax.lax.broadcasted_iota(jnp.int32, (PANEL, nb), 1)
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (PANEL, nb), 0)
    colsB = jax.lax.broadcasted_iota(jnp.int32, (BLK, nb), 1)

    def blk_step(p, _):
        pbase = p * BLK
        panel = o_ref[pl.ds(pbase, BLK), :]            # (BLK, nb)
        slabs = []                                     # factored 8-row slabs

        for j in range(BLK // PANEL):
            slab = panel[j * PANEL:(j + 1) * PANEL, :]
            base = pbase + j * PANEL
            if j:
                # deferred update from this panel's earlier slabs: the
                # multipliers are vprev's pivot-range columns, extracted on
                # the MXU via a one-hot contraction (no lane-dim slicing)
                vprev = jnp.concatenate(slabs, axis=0)          # (8j, nb)
                vprev = jnp.where(cols8[:1] >= base, vprev, 0.0)
                sel = ((cols8 - base) == rows8).astype(slab.dtype)
                w = jax.lax.dot_general(
                    sel, vprev, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)         # (8, 8j)
                slab = slab - jax.lax.dot_general(
                    w, vprev, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(slab.dtype)
            for t in range(PANEL):
                gcol = base + t
                here = cols8 == gcol
                colvals = jnp.sum(jnp.where(here, slab, 0.0), axis=1)
                piv = colvals[t]
                inv = lax.rsqrt(piv)
                newrow = slab[t, :] * inv
                newrow = jnp.where(cols8[0] >= gcol, newrow, 0.0)
                mult = colvals * inv
                upd = mult[:, None] * newrow[None, :]
                slab = jnp.where(rows8 == t, newrow[None, :],
                                 jnp.where(rows8 > t, slab - upd, slab))
            slabs.append(slab)

        fpanel = jnp.concatenate(slabs, axis=0)        # (BLK, nb) factored
        o_ref[pl.ds(pbase, BLK), :] = fpanel

        # trailing rank-BLK updates, one 64-contraction dot per later block
        ft = jnp.where(colsB >= pbase + BLK, fpanel, 0.0)
        for rb in range(1, nblk):
            @pl.when(rb > p)
            def _(rb=rb):
                mult = ft[:, rb * BLK:(rb + 1) * BLK]  # (BLK, BLK) static
                upd = jax.lax.dot_general(
                    mult, ft, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o_ref[rb * BLK:(rb + 1) * BLK, :] = (
                    o_ref[rb * BLK:(rb + 1) * BLK, :] - upd.astype(o_ref.dtype))
        return 0

    lax.fori_loop(0, nblk, blk_step, 0)


@functools.partial(jax.jit, static_argnames=("upper",))
def potrf_tile(a, upper: bool = False):
    """Cholesky factor of one SPD tile (f32/bf16), other triangle zeroed.

    ``upper=False``: lower factor L (A = L L^T), reads a's lower triangle.
    ``upper=True``: upper factor U (A = U^T U), reads a's upper triangle —
    the kernel natively produces U, so this variant skips both transposes.
    """
    nb = a.shape[0]
    assert nb % PANEL == 0, nb
    # the kernel wants a full symmetric tile; mirror the valid triangle
    if upper:
        asym = jnp.triu(a) + jnp.triu(a, 1).T
    else:
        asym = jnp.tril(a) + jnp.tril(a, -1).T
    kern = _potrf_u_kernel_blk if nb % BLK == 0 and nb > BLK \
        else _potrf_u_kernel
    u = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(asym)
    u = jnp.triu(u)
    return u if upper else u.T
