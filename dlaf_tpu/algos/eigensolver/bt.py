"""Back-transformations: tridiagonal eigenvectors -> band -> full.

TPU-native equivalents of the reference's two back-transformations:

  - ``bt_band_to_tridiag`` (``eigensolver/bt_band_to_tridiag/impl.h``):
    applies the bulge-chasing reflectors recorded by
    :func:`band_to_tridiag` in reverse sweep order. All chases of one sweep
    act on disjoint row ranges, so each sweep is ONE batched rank-one update
    (the analog of the reference's ``hh_apply_group_size`` grouping).
  - ``bt_reduction_to_band`` (``eigensolver/bt_reduction_to_band/impl.h``):
    applies the stage-1 compact-WY panels in reverse panel order, each panel
    being two GEMMs (E -= V (T (V^H E))).

Convention (matches band2tridiag/red2band): the reductions computed
A_next = H A H^H per reflector in creation order, so the accumulated
transform is A = Q T Q^H with Q = H_1^H H_2^H ... H_N^H, and eigenvectors
map back as E <- H_k^H E applied in reverse creation order.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ...ops.core import ct, matmul_precision
from ...ops.householder import t_factor
from ...types import is_complex_dtype


@functools.partial(jax.jit, static_argnames=("b",))
def bt_band_to_tridiag(e_mat, vs, taus, b: int):
    """E <- Q_stage2 E using the recorded bulge-chase reflectors.

    e_mat: (n, nev); vs: (nsweeps, ncmax, b); taus: (nsweeps, ncmax).
    """
    if b == 1:
        return e_mat
    n, nev = e_mat.shape
    nsweeps, ncmax, _ = vs.shape
    dt = e_mat.dtype

    # pad rows so the batched per-sweep view [s+1, s+1+ncmax*b) is in-bounds
    pad_rows = ncmax * b + 1
    ep = jnp.concatenate([e_mat, jnp.zeros((pad_rows, nev), dt)], axis=0)

    def sweep_step(k, ep):
        s = nsweeps - 1 - k
        v = vs[s]                                  # (ncmax, b)
        tau = taus[s]                              # (ncmax,)
        blk = lax.dynamic_slice(ep, (s + 1, 0), (ncmax * b, nev))
        blk3 = blk.reshape(ncmax, b, nev)
        # w = v^H blk per chase; blk -= conj(tau) v w   (applying H^H)
        w = jnp.einsum("cb,cbe->ce", jnp.conj(v) if is_complex_dtype(dt) else v,
                       blk3, precision=matmul_precision())
        coef = (jnp.conj(tau) if is_complex_dtype(dt) else tau)[:, None, None]
        blk3 = blk3 - coef * v[:, :, None] * w[:, None, :]
        ep = lax.dynamic_update_slice(ep, blk3.reshape(ncmax * b, nev), (s + 1, 0))
        return ep

    ep = lax.fori_loop(0, nsweeps, sweep_step, ep)
    return ep[:n]


@functools.partial(jax.jit, static_argnames=("band",))
def bt_reduction_to_band(e_mat, a_packed, taus, band: int):
    """E <- Q_stage1 E using the panels stored in the packed stage-1 output.

    e_mat: (n, nev); a_packed/taus: outputs of :func:`reduction_to_band`.
    Stage 1 computed A_band = Q^H A Q with Q = prod_k (I - V_k T_k V_k^H)
    in panel order, so E <- Q E applies panels in reverse order:
    E -= V (T (V^H E)).
    """
    n, nev = e_mat.shape
    b = band
    npanels = max(n // b - 1, 0)
    rows = jnp.arange(n)

    def panel_step(k, e):
        kk = npanels - 1 - k
        j0 = kk * b
        r0 = j0 + b
        panel = lax.dynamic_slice(a_packed, (0, j0), (n, b))
        head = r0 + jnp.arange(b)
        v = jnp.where(rows[:, None] > head[None, :], panel, 0)
        v = v + jnp.where(rows[:, None] == head[None, :], 1.0, 0).astype(e.dtype)
        tp = lax.dynamic_slice(taus, (j0,), (b,))
        t = t_factor(v, tp)
        w = jnp.matmul(ct(v), e, precision=matmul_precision())
        e = e - jnp.matmul(v, jnp.matmul(t, w, precision=matmul_precision()),
                           precision=matmul_precision())
        return e

    return lax.fori_loop(0, npanels, panel_step, e_mat)
