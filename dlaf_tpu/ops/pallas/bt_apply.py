"""Pallas TPU kernel: streaming grouped compact-WY stage-2 back-transform.

Applies one group (``g = b`` consecutive sweeps) of bulge-chase reflectors
to the eigenvector matrix — the hot half of ``bt_band_to_tridiag``
(reference ``eigensolver/bt_band_to_tridiag/impl.h:177-535``). The pure-XLA
grouped apply round-trips a (b+g-1, nev) window through HBM per chase
(dynamic_slice + GEMMs + dynamic_update_slice ≈ 4 extra O(b·nev) buffer
passes per chase); this kernel streams E through VMEM exactly once per
group, carrying the window overlap between consecutive chases in VMEM, so
per-group HBM traffic drops to read-once + write-once.

Layout: with g == b (multiple of 128) and the chunk/sweep bases multiples
of b, every window starts at matrix row r0 ≡ 1 (mod b). The caller holds E
in SHIFTED form (buffer row r = E row r+1; E row 0 is never touched by
stage-2 windows since every r0 >= 1), which makes every window exactly TWO
b-row blocks — the WY trapezoid V is zero-padded from b+g-1 to 2b rows
(the extra row is an exact no-op). Chase c reads fresh block base+c+1,
reuses the carried updated block base+c from VMEM, computes

    W (2b, T) <- W - V2[c] (V[c]^T W)        with V2 = V T^H prefolded,

and drains the finalized first block. The per-group chase count is the
EXACT ``ncvalid = ceil((n - 1 - abs_sweep0) / b)`` (chases past the band
end are never visited), so every touched block index is in bounds by
construction — no clamping, whose read/write divergence would corrupt the
tail blocks.

Grid: nev tiles x valid chases, chase innermost (sequential carry).
Fresh-block reads are triple-buffered, V/V2 slabs prefetched two ahead,
finalized writes drained N_WSLOT behind and fully drained at each tile-pass
boundary — the slot scheme of ``band2tridiag``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_RSLOT = 3          # fresh-block read slots (prefetch depth N_RSLOT - 1)
N_VSLOT = 3          # V/V2 slab slots (prefetch depth N_RSLOT - 1)
N_WSLOT = 2          # finalized-block write drain slots


VMEM_BUDGET = 15 << 20   # scoped-vmem limit is 16 MiB; leave compiler slack


def _vmem_bytes(b: int, tile: int) -> int:
    """Scoped VMEM of one kernel instance: scratch buffers + the compute
    temporaries (w concat, vw, new ~ 5*b*tile). Measured calibration:
    b=256/tile=1024 lowers to 16.23 MiB (just over the 16 MiB limit),
    b=128/tile=1024 to ~7 MiB."""
    scratch = (N_RSLOT + N_WSLOT + 1) * b * tile + 2 * N_VSLOT * 2 * b * b
    temps = 8 * b * tile          # calibrated: b=256/tile=1024 -> 16.23 MiB
    return 4 * (scratch + temps)


def apply_tile(nev: int, b: int) -> int | None:
    """Largest lane-tile width that fits scoped VMEM, or None if nev is
    incompatible (the round-4 b-agnostic choice OOM'd Mosaic's scoped
    allocation at b=256, tile=1024)."""
    for t in (1024, 512, 256, 128):
        if nev % t == 0 and _vmem_bytes(b, t) <= VMEM_BUDGET:
            return t
    return None


def _fused_vmem_bytes(k: int, b: int, tile: int) -> int:
    """Scoped VMEM of one FUSED kernel instance: the (k+3)-slot block
    carousel, triple-buffered (k, 2b, b) V and V2 slabs, and the compute
    temporaries of one cascade op (same 8*b*tile calibration as the
    single-group kernel)."""
    carousel = (k + 3) * b * tile
    slabs = 2 * N_VSLOT * k * 2 * b * b
    temps = 8 * b * tile
    return 4 * (carousel + slabs + temps)


def fused_groups(nev: int, b: int, tile: int, k_max: int = 8) -> int:
    """Largest group-fusion factor k (power of two <= k_max) whose fused
    kernel fits scoped VMEM at this (b, tile); 1 = fusion infeasible."""
    k = 1
    cand = 2
    while cand <= k_max and _fused_vmem_bytes(cand, b, tile) <= VMEM_BUDGET:
        k = cand
        cand *= 2
    return k


def _make_kernel(*, b, ncmax, nblk, njt, tile):
    depth = N_RSLOT - 1

    def kernel(scal_ref, ep_in, v_ref, v2_ref, ep_ref,
               rbuf, vbuf, v2buf, wbuf, fbuf, rsem, vsem, wsem, fsem):
        del ep_in
        base = scal_ref[0]
        ncvalid = scal_ref[1]          # in [1, ncmax]

        def lanes(jt):
            return pl.ds(pl.multiple_of(jt * tile, 128), tile)

        def read_dma(jt, c, slot):
            return pltpu.make_async_copy(
                ep_ref.at[base + c + 1, :, lanes(jt)], rbuf.at[slot],
                rsem.at[slot])

        def v_dmas(c, slot):
            return [pltpu.make_async_copy(v_ref.at[c], vbuf.at[slot],
                                          vsem.at[slot, 0]),
                    pltpu.make_async_copy(v2_ref.at[c], v2buf.at[slot],
                                          vsem.at[slot, 1])]

        def write_dma(jt, c, slot):
            return pltpu.make_async_copy(
                wbuf.at[slot], ep_ref.at[base + c, :, lanes(jt)],
                wsem.at[slot])

        def issue(jt, c):
            @pl.when(c < ncvalid)
            def _():
                read_dma(jt, c, c % N_RSLOT).start()
                for cp in v_dmas(c, c % N_VSLOT):
                    cp.start()

        def pass_body(jt, _):
            # seed carry for this tile pass: block `base` (sync, once/pass)
            cp = pltpu.make_async_copy(ep_ref.at[base, :, lanes(jt)],
                                       fbuf, fsem)
            cp.start()
            cp.wait()
            carry0 = fbuf[...]
            for k in range(depth):
                issue(jt, k)

            def chase(c, carry):
                issue(jt, c + depth)
                read_dma(jt, c, c % N_RSLOT).wait()
                fresh = rbuf[c % N_RSLOT]
                for cpv in v_dmas(c, c % N_VSLOT):
                    cpv.wait()
                w = jnp.concatenate([carry, fresh], axis=0)   # (2b, tile)
                # HIGHEST: default f32 dot is a single bf16 MXU pass, which
                # costs ~30x in the eigensolver residuals (measured orth
                # 1.2e-4 -> 3.3e-3 at n = 8192)
                vw = jnp.dot(vbuf[c % N_VSLOT].T, w,
                             precision=lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
                new = w - jnp.dot(v2buf[c % N_VSLOT], vw,
                                  precision=lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)
                wslot = c % N_WSLOT

                @pl.when(c >= N_WSLOT)
                def _():
                    write_dma(jt, c - N_WSLOT, wslot).wait()
                wbuf[wslot] = new[:b]
                write_dma(jt, c, wslot).start()
                return new[b:]

            carry = lax.fori_loop(0, ncvalid, chase, carry0)

            # drain this pass's outstanding block writes
            for k in range(N_WSLOT):
                c = ncvalid - 1 - k

                @pl.when(c >= 0)
                def _(c=c):
                    write_dma(jt, c, c % N_WSLOT).wait()

            # flush the carried block base+ncvalid (sync, dedicated buffer)
            fbuf[...] = carry
            cpf = pltpu.make_async_copy(
                fbuf, ep_ref.at[base + ncvalid, :, lanes(jt)], fsem)
            cpf.start()
            cpf.wait()
            return 0

        lax.fori_loop(0, njt, pass_body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("b", "tile"))
def bt_apply_group_pallas(ep2, v, v2, base_blk, ncvalid, b: int,
                          tile: int = 1024):
    """Apply one group's chases to the SHIFTED eigenvector buffer in place.

    ep2: (nblk*b, nev) f32 — E rows [1:] plus >= 2b+1 pad rows (see module
         doc; content of the pad rows is irrelevant).
    v:   (ncmax, 2b, b) f32 — per-chase WY trapezoids, zero row 2b-1.
    v2:  (ncmax, 2b, b) f32 — V T^H prefolded.
    base_blk: int32 scalar — block index of the group's first window
              ((lo + s0) // b).
    ncvalid: int32 scalar in [1, ncmax] — the group's valid chase count
             ceil((n - 1 - (lo + s0)) / b).
    """
    nrows, nev = ep2.shape
    assert nrows % b == 0 and nev % tile == 0 and b % 128 == 0
    nblk = nrows // b
    ncmax = v.shape[0]
    njt = nev // tile
    ep3 = ep2.reshape(nblk, b, nev)
    kernel = _make_kernel(b=b, ncmax=ncmax, nblk=nblk, njt=njt, tile=tile)
    scal = jnp.stack([jnp.asarray(base_blk, jnp.int32),
                      jnp.asarray(ncvalid, jnp.int32)])
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(ep3.shape, ep3.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((N_RSLOT, b, tile), jnp.float32),
            pltpu.VMEM((N_VSLOT, 2 * b, b), jnp.float32),
            pltpu.VMEM((N_VSLOT, 2 * b, b), jnp.float32),
            pltpu.VMEM((N_WSLOT, b, tile), jnp.float32),
            pltpu.VMEM((b, tile), jnp.float32),
            pltpu.SemaphoreType.DMA((N_RSLOT,)),
            pltpu.SemaphoreType.DMA((N_VSLOT, 2)),
            pltpu.SemaphoreType.DMA((N_WSLOT,)),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(scal, ep3, v, v2)
    return out.reshape(nrows, nev)


def _make_fused_kernel(*, k, b, njt, tile):
    """Wavefront-fused kernel: k staggered groups share one E pass.

    Groups are indexed i = 0..k-1 BOTTOM-first (i = 0 is the group with the
    highest sweep base = lowest in the matrix = applied FIRST); group i's
    chase t is the two-block WY op on blocks (beta + nact-1-i + t,
    ... + 1). At wavefront step t the cascade runs i ascending — each op's
    upper block is the next op's lower block, so the within-step order
    reproduces the earliest-applied-first group order exactly; across
    steps the window slides down one block, reading one fresh block and
    finalizing the top block per step. E traffic: one read+write pass per
    k groups instead of per group.

    Blocks live in a (k+3)-slot VMEM carousel addressed by block % nslots:
    step t touches blocks beta+t .. beta+nact+t (distinct slots), the
    finalized write of block beta+t drains while the slot's next tenant
    (block beta+t + nslots, the fresh read of step t + nslots - nact) is
    still >= 3 steps away.

    ``nact`` (the number of geometrically valid groups, SMEM) gates a
    BOTTOM prefix of phantom groups: fused steps whose window would start
    at/past the band end (chunked records with rounded sweep overshoot)
    simply skip those i — no clamped no-op DMAs, no OOB window arithmetic
    (the round-4 advisor's OOB class is structurally gone on this path).
    """
    nslots = k + 3

    def kernel(scal_ref, ep_in, v_ref, v2_ref, ep_ref,
               cbuf, vbuf, v2buf, rsem, vsem, wsem, fsem):
        del ep_in
        beta = scal_ref[0]
        nact = scal_ref[1]           # valid groups, in [0, k]
        v0p = scal_ref[2]            # chase count of group i = 0
        nsteps = scal_ref[3]         # v0p + nact - 1 (0 when nact == 0)

        def lanes(jt):
            return pl.ds(pl.multiple_of(jt * tile, 128), tile)

        def slot(blk):
            return lax.rem(blk, jnp.int32(nslots))

        def read_dma(jt, blk):
            return pltpu.make_async_copy(
                ep_ref.at[blk, :, lanes(jt)], cbuf.at[slot(blk)],
                rsem.at[slot(blk)])

        def v_dmas(t, vslot):
            return [pltpu.make_async_copy(v_ref.at[t], vbuf.at[vslot],
                                          vsem.at[vslot, 0]),
                    pltpu.make_async_copy(v2_ref.at[t], v2buf.at[vslot],
                                          vsem.at[vslot, 1])]

        def write_dma(jt, blk):
            return pltpu.make_async_copy(
                cbuf.at[slot(blk)], ep_ref.at[blk, :, lanes(jt)],
                wsem.at[slot(blk)])

        def issue_fresh(jt, t):
            @pl.when(t < v0p)
            def _():
                blk = beta + nact + t
                # the slot's previous tenant (block blk - nslots, finalized
                # at step t + nact - nslots) may still be draining
                @pl.when(t + nact >= nslots)
                def _():
                    write_dma(jt, blk - nslots).wait()
                read_dma(jt, blk).start()

        def issue_v(t):
            @pl.when(t < nsteps)
            def _():
                for cp in v_dmas(t, lax.rem(jnp.int32(t), jnp.int32(N_VSLOT))):
                    cp.start()

        def pass_body(jt, _):
            # seed the carousel: blocks beta .. beta+nact-1
            for i in range(k):
                @pl.when(i < nact)
                def _(i=i):
                    read_dma(jt, beta + i).start()
            for t in range(N_VSLOT - 1):
                issue_fresh(jt, t)
                issue_v(t)
            for i in range(k):
                @pl.when(i < nact)
                def _(i=i):
                    read_dma(jt, beta + i).wait()

            def step(t, _):
                issue_fresh(jt, t + N_VSLOT - 1)
                issue_v(t + N_VSLOT - 1)
                vslot = lax.rem(jnp.int32(t), jnp.int32(N_VSLOT))
                for cp in v_dmas(t, vslot):
                    cp.wait()

                @pl.when(t < v0p)
                def _():
                    read_dma(jt, beta + nact + t).wait()
                for i in range(k):
                    @pl.when((i < nact) & (t < v0p + i))
                    def _(i=i):
                        up = beta + nact - 1 - i + t
                        w = jnp.concatenate(
                            [cbuf[slot(up)], cbuf[slot(up + 1)]], axis=0)
                        # HIGHEST: see the single-group kernel
                        vw = jnp.dot(vbuf[vslot, i].T, w,
                                     precision=lax.Precision.HIGHEST,
                                     preferred_element_type=jnp.float32)
                        new = w - jnp.dot(v2buf[vslot, i], vw,
                                          precision=lax.Precision.HIGHEST,
                                          preferred_element_type=jnp.float32)
                        cbuf[slot(up)] = new[:b]
                        cbuf[slot(up + 1)] = new[b:]
                write_dma(jt, beta + t).start()
                return 0

            lax.fori_loop(0, nsteps, step, 0)

            # drain the trailing writes (steps nsteps-1 .. nsteps-nslots+1;
            # earlier ones were pre-waited by issue_fresh)
            for d in range(nslots - 1):
                @pl.when(nsteps - 1 - d >= 0)
                def _(d=d):
                    write_dma(jt, beta + nsteps - 1 - d).wait()

            # flush the one carried-but-unfinalized block beta + nsteps
            @pl.when(nact > 0)
            def _():
                cpf = pltpu.make_async_copy(
                    cbuf.at[slot(beta + nsteps)],
                    ep_ref.at[beta + nsteps, :, lanes(jt)], fsem)
                cpf.start()
                cpf.wait()
            return 0

        lax.fori_loop(0, njt, pass_body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "b", "tile"))
def bt_apply_fused_pallas(ep2, v, v2, beta, nact, v0p, k: int, b: int,
                          tile: int = 1024):
    """Apply k staggered groups' chases to the SHIFTED eigenvector buffer
    in ONE streaming E pass (in place).

    ep2: (nblk*b, nev) f32 shifted buffer (bt_apply_group_pallas layout).
    v:   (ncmax, k, 2b, b) f32 — v[t, i] is the chase-t WY trapezoid of
         group i, i = 0 the BOTTOM (earliest-applied) valid group.
    v2:  (ncmax, k, 2b, b) f32 — V T^H prefolded.
    beta: int32 — block index of the TOP group's first window.
    nact: int32 in [0, k] — geometrically valid groups (phantoms are the
          i >= nact suffix; their slabs are never read).
    v0p:  int32 — chase count of group i = 0 (group i has v0p + i chases:
          the exact stagger of g == b groups).
    """
    nrows, nev = ep2.shape
    assert nrows % b == 0 and nev % tile == 0 and b % 128 == 0 and k >= 2
    nblk = nrows // b
    njt = nev // tile
    ep3 = ep2.reshape(nblk, b, nev)
    kernel = _make_fused_kernel(k=k, b=b, njt=njt, tile=tile)
    nact32 = jnp.asarray(nact, jnp.int32)
    v0p32 = jnp.asarray(v0p, jnp.int32)
    scal = jnp.stack([jnp.asarray(beta, jnp.int32), nact32, v0p32,
                      jnp.where(nact32 > 0, v0p32 + nact32 - 1, 0)])
    nslots = k + 3
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(ep3.shape, ep3.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((nslots, b, tile), jnp.float32),
            pltpu.VMEM((N_VSLOT, k, 2 * b, b), jnp.float32),
            pltpu.VMEM((N_VSLOT, k, 2 * b, b), jnp.float32),
            pltpu.SemaphoreType.DMA((nslots,)),
            pltpu.SemaphoreType.DMA((N_VSLOT, 2)),
            pltpu.SemaphoreType.DMA((nslots,)),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(scal, ep3, v, v2)
    return out.reshape(nrows, nev)
