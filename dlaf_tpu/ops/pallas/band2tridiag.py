"""Pallas TPU kernel: wavefront-pipelined bulge chasing on strip storage.

TPU-native replacement of the reference's pipelined ``SweepWorker`` ring
(``eigensolver/band_to_tridiag/mc.h:438-662``): up to ``ncmax/LAG`` sweeps are
chased concurrently, LAG chase-steps apart, so the sequential depth is
~LAG*n instead of ~n^2/b. The band lives in HBM as strip storage (see
:mod:`dlaf_tpu.algos.eigensolver.band_strips`); every lane's (2b, 2b) chase
window is moved with *manual async DMA copies* — no batched gathers/scatters,
which the axon TPU backend faults on past VMEM sizes — and the window update
itself is two rank-1 VPU/MXU passes.

Alignment: Mosaic requires DMA lane offsets divisible by 128, but a chase
window starts at an arbitrary row i0 (offset ``im = i0 mod b`` inside its
strip). So the DMAs move 128-aligned supersets of each strip's window range
and the unaligned extraction/merge happens in VMEM with dynamic rotates
(``pltpu.roll`` with a traced shift) + iota masks.

Pipelining: lanes of one wavefront step touch pairwise disjoint strip sets
(lane spacing LAG*b - 1 >= 3b for b >= 3, window spans 3 strips), so lane
iterations are independent within a step; the only cross-iteration hazard is
a lane re-reading its own strips one step later (distance ``nlanes``
iterations). Reads are prefetched DEPTH ahead and writes drained NW_W slots
behind, with NW_W + DEPTH <= nlanes guaranteeing the hazard ordering.

f32 only (Mosaic has no complex / emulated-f64 support); other dtypes use
the JAX strip kernel (``band_strips.band_to_tridiag_strips``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...algos.eigensolver.band_strips import STRIP_W, n_strips

LAG = 4
ALIGN = 128


def _params(i, *, nlanes, n, b, nsweeps, ncmax, dead_s0):
    """Scalar wavefront bookkeeping for flat iteration i = t*nlanes + w."""
    t = i // nlanes
    w = i - t * nlanes
    s = t // LAG - w
    c = t - LAG * s
    s_c = jnp.maximum(s, 0)
    nc = jnp.maximum(0, -(-(n - 1 - s_c) // b))
    valid = (s >= 0) & (s < nsweeps) & (c < nc)
    i0 = jnp.where(valid, s_c + 1 + c * b, dead_s0 * b)
    s_idx = jnp.where(valid, s_c, nsweeps)
    c_idx = jnp.where(valid, jnp.minimum(c, ncmax - 1), 0)
    first = valid & (c == 0)
    return i0, s_idx, c_idx, first


def _win_lanes(b: int) -> int:
    """Aligned DMA width covering any [t0, t0 + 2b) lane range."""
    return (-(-2 * b // ALIGN) + 1) * ALIGN


def _make_kernel(*, n, b, nsweeps, ncmax, nlanes, tsteps, ns_total, depth,
                 nw_w, nrec):
    total = tsteps * nlanes
    dead_s0 = ns_total - 3
    win = _win_lanes(b)
    par = functools.partial(_params, nlanes=nlanes, n=n, b=b,
                            nsweeps=nsweeps, ncmax=ncmax, dead_s0=dead_s0)
    serial = nlanes < depth + nw_w  # tiny problems: no pipelining

    def offs(i0, g):
        """(strip row, aligned lane start, residual shift) for strip g."""
        s0 = i0 // b
        im = i0 - s0 * b
        t0 = im + (2 - g) * b
        a0 = pl.multiple_of((t0 // ALIGN) * ALIGN, ALIGN)
        return s0, im, a0, t0 - a0

    def kernel(strips_in, hh_in, lo_ref, strips_ref, hh_ref, rbuf, hh_s_ref,
               rsem, wsem, hsem):
        # strips_in/hh_in are the aliased input views of strips_ref/hh_ref
        del strips_in, hh_in
        nw_r = rbuf.shape[0]

        def rec_row(s_idx):
            # sweep-chunked reflector record: rows outside [lo, lo + nrec)
            # land in the discard row nrec
            return jnp.clip(s_idx - lo_ref[0], -1, nrec) % (nrec + 1)

        def read_dmas(i, slot):
            i0, _, _, _ = par(i)
            cps = []
            for g in range(3):
                s0, _, a0, _ = offs(i0, g)
                cps.append(pltpu.make_async_copy(
                    strips_ref.at[s0 + g, :, pl.ds(a0, win)],
                    rbuf.at[slot, g], rsem.at[slot, g]))
            return cps

        def write_dmas(i, slot):
            i0, s_idx, c_idx, _ = par(i)
            cps = []
            for g in range(3):
                s0, _, a0, _ = offs(i0, g)
                cps.append(pltpu.make_async_copy(
                    rbuf.at[slot % nw_r, g],
                    strips_ref.at[s0 + g, :, pl.ds(a0, win)],
                    wsem.at[slot % nw_w, g]))
            # hh record stored as (nrec+1, ncmax*bpt, 128): 128-wide lane
            # tiles so the sublane-dim size-1 dynamic slice stays legal for
            # b > 128 (Mosaic rejects it when the minor dim spans >1 lane
            # tile); bpt = bp // 128 consecutive rows per (sweep, chase)
            bpt = hh_s_ref.shape[1]
            cps.append(pltpu.make_async_copy(
                hh_s_ref.at[slot % nw_w],
                hh_ref.at[rec_row(s_idx), pl.ds(c_idx * bpt, bpt), :],
                hsem.at[slot % nw_w]))
            return cps

        def start(cps):
            for cp in cps:
                cp.start()

        def wait(cps):
            for cp in cps:
                cp.wait()

        rows_b = lax.broadcasted_iota(jnp.int32, (b, b), 0)
        cols_b = lax.broadcasted_iota(jnp.int32, (b, b), 1)
        slow = rows_b > cols_b           # strictly lower mask
        idx_b1 = lax.broadcasted_iota(jnp.int32, (b, 1), 0)
        rows_3b = lax.broadcasted_iota(jnp.int32, (3 * b, 2 * b), 0)
        lanes_w = lax.broadcasted_iota(jnp.int32, (b, win), 1)

        def chase(i, rslot, wslot):
            i0, _, _, first = par(i)
            _, im, _, _ = offs(i0, 0)

            # ---- unaligned window extraction: rolls + static slices ------
            cols = []
            for g in range(3):
                _, _, _, r = offs(i0, g)
                cols.append(pltpu.roll(rbuf[rslot, g], win - r, axis=1)[:, :2 * b])
            slab3 = jnp.concatenate(cols, axis=0)         # (3b, 2b)
            g_ = pltpu.roll(slab3, 3 * b - im, axis=0)[:2 * b]

            cy = g_[:b, :b]
            s_ = g_[:b, b:]
            b_ = g_[b:, b:]

            # all contractions below are VPU reductions in f32: TPU dot_general
            # on f32 defaults to one bf16 pass, which is far too coarse for a
            # sequential chase chain (every rounding feeds the next reflector)
            ycol = jnp.where(first, b - 1, 0)
            y = jnp.sum(jnp.where(cols_b == ycol, cy, 0.0), axis=1,
                        keepdims=True)                    # column ycol (b, 1)

            # Householder of y (head 0): LAPACK larfg
            normx = jnp.sqrt(jnp.sum(y * y))
            x0 = jnp.sum(jnp.where(idx_b1 == 0, y, 0.0))
            phase = jnp.where(x0 >= 0, 1.0, -1.0)
            beta = -phase * normx
            denom = x0 - beta
            safe = jnp.abs(denom) > 0
            v = jnp.where(idx_b1 > 0, y / jnp.where(safe, denom, 1.0), 0.0)
            v = jnp.where(idx_b1 == 0, 1.0, v)            # (b, 1)
            tau = jnp.where(safe, (beta - x0) / beta, 0.0)

            def r1(m, vec, coef):      # m - coef * vec @ (vec^T m), exact f32
                vtm = jnp.sum(vec * m, axis=0, keepdims=True)   # (1, cols)
                return m - coef * vec * vtm

            cy2 = r1(cy, v, tau)
            headcol = jnp.where(rows_b == 0, beta, 0.0)
            cy2 = jnp.where(cols_b == ycol, headcol, cy2)

            s_full = s_ + jnp.where(slow, s_, 0.0).T
            s1 = r1(s_full, v, tau)
            s1v = jnp.sum(s1 * v[:, 0][None, :], axis=1, keepdims=True)
            s2 = s1 - tau * s1v * v[:, 0][None, :]
            s2 = jnp.where(rows_b >= cols_b, s2, 0.0)

            bv = jnp.sum(b_ * v[:, 0][None, :], axis=1, keepdims=True)
            b2 = b_ - tau * bv * v[:, 0][None, :]

            # ---- merge the window back & stage the write buffers ---------
            g_new = jnp.concatenate([
                jnp.concatenate([cy2, s2], axis=1),
                jnp.concatenate([g_[b:, :b], b2], axis=1),
                jnp.zeros((b, 2 * b), g_.dtype)], axis=0)  # (3b, 2b)
            g_back = pltpu.roll(g_new, im, axis=0)
            win_rows = (rows_3b >= im) & (rows_3b < im + 2 * b)
            slab3n = jnp.where(win_rows, g_back, slab3)
            for g in range(3):
                _, _, _, r = offs(i0, g)
                blk = slab3n[g * b:(g + 1) * b]            # (b, 2b)
                blk_w = jnp.concatenate(
                    [blk, jnp.zeros((b, win - 2 * b), blk.dtype)], axis=1)
                blk_w = pltpu.roll(blk_w, r, axis=1)
                keep = (lanes_w >= r) & (lanes_w < r + 2 * b)
                rbuf[rslot, g] = jnp.where(keep, blk_w, rbuf[rslot, g])
            bpt = hh_s_ref.shape[1]
            bp = bpt * 128
            hh_row = jnp.where(idx_b1 == 0, tau, v).T      # (1, b)
            if bp > b:
                hh_row = jnp.concatenate(
                    [hh_row, jnp.zeros((1, bp - b), hh_row.dtype)], axis=1)
            hh_s_ref[wslot % nw_w] = hh_row.reshape(bpt, 128)

        if serial:
            def body(i, _):
                start(read_dmas(i, 0))
                wait(read_dmas(i, 0))
                chase(i, 0, 0)
                cps = write_dmas(i, 0)
                start(cps)
                wait(cps)
                return 0
            lax.fori_loop(0, total, body, 0)
            return

        for k in range(depth):
            if k < total:
                start(read_dmas(k, k % nw_r))

        def body(i, _):
            rslot = i % nw_r
            wait(read_dmas(i, rslot))
            # drain the write slot we are about to reuse
            @pl.when(i >= nw_w)
            def _():
                wait(write_dmas(i - nw_w, i - nw_w))
            chase(i, rslot, i)
            start(write_dmas(i, i))
            @pl.when(i + depth < total)
            def _():
                start(read_dmas(i + depth, (i + depth) % nw_r))
            return 0

        lax.fori_loop(0, total, body, 0)
        for k in range(nw_w):
            if total - nw_w + k >= 0:
                wait(write_dmas(total - nw_w + k, total - nw_w + k))

    return kernel


@functools.partial(jax.jit, static_argnames=("n", "b", "sweep_chunk"))
def band_to_tridiag_strips_pallas(strips, n: int, b: int, sweep_lo=0,
                                  sweep_chunk: int | None = None):
    """Wavefront bulge chasing on strip storage (f32, b >= 8).

    strips: (>= n_strips(n, b) + 3, b, 5b) f32 strip storage.
    Returns (d, e, vs, taus) in the shared recorded-reflector layout.
    With ``sweep_chunk``, only sweeps [sweep_lo, sweep_lo + sweep_chunk) are
    recorded (see band_strips.band_to_tridiag_strips).
    """
    assert strips.dtype == jnp.float32
    nsweeps = n - 2
    ncmax = -(-(n - 1) // b)
    nlanes = ncmax // LAG + 1
    tsteps = LAG * (nsweeps - 1) + ncmax + 1
    ns_data = n_strips(n, b)
    ns_total = max(strips.shape[0], ns_data + 3)
    win = _win_lanes(b)
    # lane padding so every aligned window DMA [a0, a0 + win) is in bounds
    a0max = ((3 * b - 1) // ALIGN) * ALIGN
    widthp = max(STRIP_W * b, a0max + win)
    pads = ((0, ns_total - strips.shape[0]), (0, 0),
            (0, widthp - strips.shape[2]))
    if any(p[1] for p in pads):
        strips = jnp.pad(strips, pads)

    # read-prefetch depth 3 + 6 draining write slots measured ~20% faster
    # than 2/4 at n=8192 b=128 (DMA latency hiding); hazard bound
    # NW_W + DEPTH <= nlanes still holds for every lane count
    depth = 3
    nw_w = max(1, min(6, nlanes - depth))
    nw_r = nw_w + depth
    nrec = nsweeps if sweep_chunk is None else sweep_chunk

    kernel = _make_kernel(n=n, b=b, nsweeps=nsweeps, ncmax=ncmax,
                          nlanes=nlanes, tsteps=tsteps, ns_total=ns_total,
                          depth=depth, nw_w=nw_w, nrec=nrec)
    bp = -(-b // ALIGN) * ALIGN          # lane-aligned reflector record
    bpt = bp // ALIGN                    # 128-wide lane tiles per record row
    hh0 = jnp.zeros((nrec + 1, ncmax * bpt, ALIGN), jnp.float32)
    lo_arr = jnp.asarray([sweep_lo], jnp.int32)
    strips_out, hh = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(strips.shape, strips.dtype),
                   jax.ShapeDtypeStruct(hh0.shape, hh0.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY)),
        scratch_shapes=[
            pltpu.VMEM((nw_r, 3, b, win), jnp.float32),
            pltpu.VMEM((nw_w, bpt, ALIGN), jnp.float32),
            pltpu.SemaphoreType.DMA((nw_r, 3)),
            pltpu.SemaphoreType.DMA((nw_w, 3)),
            pltpu.SemaphoreType.DMA((nw_w,)),
        ],
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(strips, hh0, lo_arr)

    from ...algos.eigensolver.band_strips import strips_extract_tridiag
    d, e = strips_extract_tridiag(strips_out[:, :, :STRIP_W * b], n, b)
    hh = hh[:nrec].reshape(nrec, ncmax, bp)[:, :, :b]
    taus = hh[:, :, 0]
    vs = hh.at[:, :, 0].set(jnp.where(taus != 0, 1.0, 0.0))
    return d, e, vs, taus
