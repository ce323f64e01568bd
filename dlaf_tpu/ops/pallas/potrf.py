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
    u = pl.pallas_call(
        _potrf_u_kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(asym)
    u = jnp.triu(u)
    return u if upper else u.T
