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

Dtypes: f32 natively; c64 as a TWO-PLANE (re, im) f32 layout — Mosaic has
no complex type, so the strips/reflector-record buffers carry a leading
plane axis and the chase math is explicit (re, im) arithmetic mirroring
``band_strips.chase_math`` (reference dispatches {s,c} on GPU the same
way through its CUDA kernels, ``miniapp/include/dlaf/miniapp/dispatch.h``).
Emulated f64 stays on the JAX strip kernel.

Slot counts (read-prefetch depth / draining write slots) are fitted to the
~16 MB/core VMEM budget — the (nw_r, P, 3, b, win) window buffer dominates,
and at b = 256 the round-2 fixed counts (3/6) alone exceeded VMEM.
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
# VMEM budget for the window read buffer (leave headroom of the ~16 MB/core
# for the write/hh scratch and the window temporaries)
RBUF_BYTES = 10 * 2**20
# hard feasibility bound on the ACTUAL read-buffer allocation
# (nw_r * slot_bytes): _slot_counts floors at 3 slots, so past this the
# kernel cannot fit VMEM at all and selection must fall back to the JAX
# strips kernel (e.g. f32 b >= 512, c64 b >= 384)
FEASIBLE_BYTES = 12 * 2**20


def chaser_feasible(b: int, dtype) -> bool:
    """Whether the Pallas chaser's minimum slot configuration fits VMEM for
    this band size / dtype (two planes for complex)."""
    import jax.numpy as _jnp
    planes = 2 if _jnp.issubdtype(dtype, _jnp.complexfloating) else 1
    slot_bytes = planes * 3 * b * _win_lanes(b) * 4
    nslots = max(3, min(9, RBUF_BYTES // slot_bytes))
    depth = min(3, nslots - 1)
    nw_w = max(1, nslots - depth)
    return (nw_w + depth) * slot_bytes <= FEASIBLE_BYTES


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


def _slot_counts(b: int, planes: int, nlanes: int):
    """(depth, nw_w) read-prefetch/write-drain slots under the VMEM budget.

    depth 3 + 6 write slots measured ~20% faster than 2/4 at n=8192 b=128
    f32 (DMA latency hiding); larger b / the two-plane complex layout scale
    the per-slot window buffer, so the counts shrink to fit. The hazard
    bound NW_W + DEPTH <= nlanes is enforced last.
    """
    slot_bytes = planes * 3 * b * _win_lanes(b) * 4
    nslots = max(3, min(9, RBUF_BYTES // slot_bytes))
    depth = min(3, nslots - 1)
    nw_w = max(1, min(nslots - depth, nlanes - depth))
    return depth, nw_w


def _make_kernel(*, n, b, nsweeps, ncmax, nlanes, tsteps, ns_total, depth,
                 nw_w, nrec, planes):
    total = tsteps * nlanes
    dead_s0 = ns_total - 3
    win = _win_lanes(b)
    par = functools.partial(_params, nlanes=nlanes, n=n, b=b,
                            nsweeps=nsweeps, ncmax=ncmax, dead_s0=dead_s0)
    serial = nlanes < depth + nw_w  # tiny problems: no pipelining
    P = planes

    def offs(i0, g):
        """(strip row, aligned lane start, residual shift) for strip g."""
        s0 = i0 // b
        im = i0 - s0 * b
        t0 = im + (2 - g) * b
        a0 = pl.multiple_of((t0 // ALIGN) * ALIGN, ALIGN)
        return s0, im, a0, t0 - a0

    def kernel(strips_in, hh_in, lo_ref, strips_ref, hh_ref, rbuf, hh_s_ref,
               rsem, wsem, hsem):
        # strips_in/hh_in are the aliased input views of strips_ref/hh_ref;
        # buffers are (P, ...) plane-major (P=1 real, P=2 complex re/im)
        del strips_in, hh_in
        nw_r = rbuf.shape[0]

        def rec_row(s_idx):
            # sweep-chunked reflector record: rows outside [lo, lo + nrec)
            # land in the discard row nrec
            return jnp.clip(s_idx - lo_ref[0], -1, nrec) % (nrec + 1)

        def read_dmas(i, slot):
            i0, _, _, _ = par(i)
            cps = []
            for p in range(P):
                for g in range(3):
                    s0, _, a0, _ = offs(i0, g)
                    cps.append(pltpu.make_async_copy(
                        strips_ref.at[p, s0 + g, :, pl.ds(a0, win)],
                        rbuf.at[slot, p, g], rsem.at[slot, p, g]))
            return cps

        def write_dmas(i, slot):
            i0, s_idx, c_idx, _ = par(i)
            cps = []
            for p in range(P):
                for g in range(3):
                    s0, _, a0, _ = offs(i0, g)
                    cps.append(pltpu.make_async_copy(
                        rbuf.at[slot % nw_r, p, g],
                        strips_ref.at[p, s0 + g, :, pl.ds(a0, win)],
                        wsem.at[slot % nw_w, p, g]))
            # hh record stored as (P, nrec+1, ncmax*bpt, 128): 128-wide lane
            # tiles, bpt = bp // 128 consecutive rows per (sweep, chase).
            # One single-sublane DMA per row: Mosaic rejects BOTH a
            # dynamic slice whose minor dim spans >1 lane tile (the old
            # (1, bp) layout) AND a multi-sublane block at a dynamic
            # unaligned sublane offset (a (bpt, 128) copy at c_idx*bpt —
            # the b=256 tiling error); size-1 sublane slices at dynamic
            # offsets are the one legal shape, so issue bpt of them.
            bpt = hh_s_ref.shape[2]
            for p in range(P):
                for j in range(bpt):
                    cps.append(pltpu.make_async_copy(
                        hh_s_ref.at[slot % nw_w, p, pl.ds(j, 1), :],
                        hh_ref.at[p, rec_row(s_idx),
                                  pl.ds(c_idx * bpt + j, 1), :],
                        hsem.at[slot % nw_w, p, j]))
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

        def extract(rslot, i0, im):
            """Unaligned (2b, 2b) windows + raw 3-strip slabs, per plane."""
            gs, slabs = [], []
            for p in range(P):
                cols = []
                for g in range(3):
                    _, _, _, r = offs(i0, g)
                    cols.append(pltpu.roll(rbuf[rslot, p, g], win - r,
                                           axis=1)[:, :2 * b])
                slab3 = jnp.concatenate(cols, axis=0)         # (3b, 2b)
                slabs.append(slab3)
                gs.append(pltpu.roll(slab3, 3 * b - im, axis=0)[:2 * b])
            return gs, slabs

        def merge_back(rslot, i0, im, news, slabs):
            """Roll the per-plane updated windows back into the read slots."""
            for p in range(P):
                g_back = pltpu.roll(news[p], im, axis=0)
                win_rows = (rows_3b >= im) & (rows_3b < im + 2 * b)
                slab3n = jnp.where(win_rows, g_back, slabs[p])
                for g in range(3):
                    _, _, _, r = offs(i0, g)
                    blk = slab3n[g * b:(g + 1) * b]            # (b, 2b)
                    blk_w = jnp.concatenate(
                        [blk, jnp.zeros((b, win - 2 * b), blk.dtype)], axis=1)
                    blk_w = pltpu.roll(blk_w, r, axis=1)
                    keep = (lanes_w >= r) & (lanes_w < r + 2 * b)
                    rbuf[rslot, p, g] = jnp.where(keep, blk_w,
                                                  rbuf[rslot, p, g])

        def record_hh(wslot, hh_rows):
            bpt = hh_s_ref.shape[2]
            bp = bpt * 128
            for p in range(P):
                row = hh_rows[p]                               # (1, b)
                if bp > b:
                    row = jnp.concatenate(
                        [row, jnp.zeros((1, bp - b), row.dtype)], axis=1)
                hh_s_ref[wslot % nw_w, p] = row.reshape(bpt, 128)

        # all contractions below are VPU reductions in f32: TPU dot_general
        # on f32 defaults to one bf16 pass, which is far too coarse for a
        # sequential chase chain (every rounding feeds the next reflector)
        def chase_real(i, rslot, wslot):
            i0, _, _, first = par(i)
            _, im, _, _ = offs(i0, 0)
            (g_,), slabs = extract(rslot, i0, im)

            cy = g_[:b, :b]
            s_ = g_[:b, b:]
            b_ = g_[b:, b:]

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

            g_new = jnp.concatenate([
                jnp.concatenate([cy2, s2], axis=1),
                jnp.concatenate([g_[b:, :b], b2], axis=1),
                jnp.zeros((b, 2 * b), g_.dtype)], axis=0)  # (3b, 2b)
            merge_back(rslot, i0, im, [g_new], slabs)
            record_hh(wslot, [jnp.where(idx_b1 == 0, tau, v).T])

        def chase_complex(i, rslot, wslot):
            """(re, im)-plane chase mirroring band_strips.chase_math for
            complex dtypes (H = I - tau v v^H, A <- H A H^H)."""
            i0, _, _, first = par(i)
            _, im, _, _ = offs(i0, 0)
            gs, slabs = extract(rslot, i0, im)
            gr, gi = gs

            def cmul(a, c):
                return (a[0] * c[0] - a[1] * c[1],
                        a[0] * c[1] + a[1] * c[0])

            def csub(a, c):
                return (a[0] - c[0], a[1] - c[1])

            cy = (gr[:b, :b], gi[:b, :b])
            s_ = (gr[:b, b:], gi[:b, b:])
            b_ = (gr[b:, b:], gi[b:, b:])

            ycol = jnp.where(first, b - 1, 0)
            y = tuple(jnp.sum(jnp.where(cols_b == ycol, c, 0.0), axis=1,
                              keepdims=True) for c in cy)          # (b, 1)

            # complex larfg (ops/householder.py householder_vector): complex
            # phase x0/|x0|, beta = -phase*||y||, v = y/(x0-beta), v[0] = 1,
            # tau = (beta - x0)/beta
            norm2 = jnp.sum(y[0] * y[0] + y[1] * y[1])
            normx = jnp.sqrt(norm2)
            x0 = tuple(jnp.sum(jnp.where(idx_b1 == 0, c, 0.0)) for c in y)
            mag0 = jnp.sqrt(x0[0] * x0[0] + x0[1] * x0[1])
            m0safe = jnp.where(mag0 > 0, mag0, 1.0)
            phase = (jnp.where(mag0 > 0, x0[0] / m0safe, 1.0),
                     jnp.where(mag0 > 0, x0[1] / m0safe, 0.0))
            beta = (-phase[0] * normx, -phase[1] * normx)
            den = (x0[0] - beta[0], x0[1] - beta[1])
            dn2 = den[0] * den[0] + den[1] * den[1]
            safe = dn2 > 0
            dinv = tuple(jnp.where(safe, c, 0.0) / jnp.where(safe, dn2, 1.0)
                         for c in (den[0], -den[1]))        # 1/den = conj/|.|^2
            vt = cmul(y, dinv)
            v = (jnp.where(idx_b1 == 0, 1.0,
                           jnp.where(safe, vt[0], y[0])),
                 jnp.where(idx_b1 == 0, 0.0,
                           jnp.where(safe, vt[1], y[1])))   # (b, 1)
            # tau = (beta - x0)/beta = -den * conj(beta)/|beta|^2; |beta| = normx
            b2inv = jnp.where(safe, 1.0, 0.0) / jnp.where(norm2 > 0, norm2, 1.0)
            tau = cmul((-den[0], -den[1]), (beta[0] * b2inv, -beta[1] * b2inv))

            vrow = (v[0][:, 0][None, :], v[1][:, 0][None, :])     # (1, b)
            cvrow = (vrow[0], -vrow[1])
            tv = cmul(tau, v)                                     # (b, 1)
            ctau = (tau[0], -tau[1])

            def vh_dot(m):     # conj(v)^T m over rows -> (1, cols)
                return (jnp.sum(v[0] * m[0] + v[1] * m[1], axis=0,
                                keepdims=True),
                        jnp.sum(v[0] * m[1] - v[1] * m[0], axis=0,
                                keepdims=True))

            def mv_dot(m):     # m v over cols -> (rows, 1)
                return (jnp.sum(m[0] * vrow[0] - m[1] * vrow[1], axis=1,
                                keepdims=True),
                        jnp.sum(m[0] * vrow[1] + m[1] * vrow[0], axis=1,
                                keepdims=True))

            cy2 = csub(cy, cmul(tv, vh_dot(cy)))
            headcol = tuple(jnp.where(rows_b == 0, c, 0.0) for c in beta)
            cy2 = tuple(jnp.where(cols_b == ycol, h, c)
                        for h, c in zip(headcol, cy2))

            # hermitian diagonal block: S = s_ + tril(s_, -1)^H
            s_full = (s_[0] + jnp.where(slow, s_[0], 0.0).T,
                      s_[1] - jnp.where(slow, s_[1], 0.0).T)
            s1 = csub(s_full, cmul(tv, vh_dot(s_full)))
            s2 = csub(s1, cmul(cmul(ctau, mv_dot(s1)), cvrow))
            s2 = tuple(jnp.where(rows_b >= cols_b, c, 0.0) for c in s2)

            b2 = csub(b_, cmul(cmul(ctau, mv_dot(b_)), cvrow))

            news = []
            for p, (cyp, sp, bp_) in enumerate(zip(cy2, s2, b2)):
                gp = gs[p]
                news.append(jnp.concatenate([
                    jnp.concatenate([cyp, sp], axis=1),
                    jnp.concatenate([gp[b:, :b], bp_], axis=1),
                    jnp.zeros((b, 2 * b), gp.dtype)], axis=0))
            merge_back(rslot, i0, im, news, slabs)
            record_hh(wslot, [jnp.where(idx_b1 == 0, tau[p], v[p]).T
                              for p in range(P)])

        chase = chase_real if P == 1 else chase_complex

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


def record_buf_shape(n: int, b: int, sweep_chunk: int | None, dtype):
    """Shape of the chaser's raw reflector-record buffer (see hh_buf)."""
    import numpy as _np
    planes = 2 if _np.issubdtype(_np.dtype(dtype), _np.complexfloating) else 1
    nrec = (n - 2) if sweep_chunk is None else sweep_chunk
    ncmax = -(-(n - 1) // b)
    bpt = (-(-b // ALIGN) * ALIGN) // ALIGN
    return (planes, nrec + 1, ncmax * bpt, ALIGN)


@functools.partial(jax.jit,
                   static_argnames=("n", "b", "sweep_chunk", "raw_record"),
                   donate_argnums=(5,))
def band_to_tridiag_strips_pallas(strips, n: int, b: int, sweep_lo=0,
                                  sweep_chunk: int | None = None,
                                  hh_buf=None, raw_record: bool = False):
    """Wavefront bulge chasing on strip storage (f32 or c64, b >= 8).

    strips: (>= n_strips(n, b) + 3, b, 5b) f32/c64 strip storage.
    Returns (d, e, vs, taus) in the shared recorded-reflector layout.
    With ``sweep_chunk``, only sweeps [sweep_lo, sweep_lo + sweep_chunk) are
    recorded (see band_strips.band_to_tridiag_strips).

    With ``raw_record`` (f32 only), ``vs`` is returned in the kernel's RAW
    aliased layout (nrec + 1, ncmax * ceil(b/128), 128) — slot 0 of every
    row still holds tau and the trailing trash row is kept — so no second
    O(n^2) record buffer is materialized (cooking the record into the
    shared layout costs a full copy: the n = 32768 single-chunk stage-4
    OOM). Consumers fix the unit head per group (see
    ``bt.bt_band_to_tridiag(raw_bp=...)``).

    ``hh_buf``: optional caller-allocated ZERO-FILLED record buffer of
    shape ``record_buf_shape(n, b, sweep_chunk, dtype)``, DONATED. The
    axon backend does not honor pallas input_output_aliases on buffers
    created inside the jit (measured: alias 0, the 4.3 GB record held
    TWICE at n = 32768), but parameter->output donation chains through the
    custom call correctly — so contract-scale callers must pass the buffer
    in. Zero-fill is semantic: (sweep, chase) slots the chase never visits
    keep their initial value and must read as tau = 0 no-ops.
    """
    if strips.dtype == jnp.complex64:
        planes = (jnp.real(strips), jnp.imag(strips))
    elif strips.dtype == jnp.float32:
        planes = (strips,)
    else:
        raise ValueError(
            f"pallas bulge chaser supports f32/c64 strips, got {strips.dtype}")
    P = len(planes)
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
    pads = ((0, 0), (0, ns_total - strips.shape[0]), (0, 0),
            (0, widthp - strips.shape[2]))
    sp = jnp.stack(planes)
    if any(p[1] for p in pads):
        sp = jnp.pad(sp, pads)

    depth, nw_w = _slot_counts(b, P, nlanes)
    nw_r = nw_w + depth
    nrec = nsweeps if sweep_chunk is None else sweep_chunk

    kernel = _make_kernel(n=n, b=b, nsweeps=nsweeps, ncmax=ncmax,
                          nlanes=nlanes, tsteps=tsteps, ns_total=ns_total,
                          depth=depth, nw_w=nw_w, nrec=nrec, planes=P)
    bp = -(-b // ALIGN) * ALIGN          # lane-aligned reflector record
    bpt = bp // ALIGN                    # 128-wide lane tiles per record row
    hh_shape = (P, nrec + 1, ncmax * bpt, ALIGN)
    if hh_buf is None:
        hh0 = jnp.zeros(hh_shape, jnp.float32)
    else:
        assert hh_buf.shape == hh_shape and hh_buf.dtype == jnp.float32, \
            (hh_buf.shape, hh_shape)
        hh0 = hh_buf
    lo_arr = jnp.asarray([sweep_lo], jnp.int32)
    strips_out, hh = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(sp.shape, sp.dtype),
                   jax.ShapeDtypeStruct(hh0.shape, hh0.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((nw_r, P, 3, b, win), jnp.float32),
            pltpu.VMEM((nw_w, P, bpt, ALIGN), jnp.float32),
            pltpu.SemaphoreType.DMA((nw_r, P, 3)),
            pltpu.SemaphoreType.DMA((nw_w, P, 3)),
            pltpu.SemaphoreType.DMA((nw_w, P, bpt)),
        ],
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(sp, hh0, lo_arr)

    if P == 2:
        strips_out = lax.complex(strips_out[0], strips_out[1])
        hhc = lax.complex(hh[0], hh[1])
    else:
        strips_out = strips_out[0]
        hhc = hh[0]
    from ...algos.eigensolver.band_strips import strips_extract_tridiag
    d, e = strips_extract_tridiag(strips_out[:, :, :STRIP_W * b], n, b)
    if raw_record:
        if P != 1:
            raise ValueError("raw_record is f32-only")
        # taus: direct strided slice of the raw layout — slicing through a
        # reshape materialized a full O(n^2) record copy as an XLA temp
        taus = hhc[:nrec, ::bpt, 0]
        return d, e, hhc, taus
    hhc = hhc[:nrec].reshape(nrec, ncmax, bp)[:, :, :b]
    taus = hhc[:, :, 0]
    one = jnp.ones((), hhc.dtype)
    vs = hhc.at[:, :, 0].set(jnp.where(taus != 0, one, jnp.zeros_like(one)))
    return d, e, vs, taus
