"""Benchmark sections, one per subprocess (isolated HBM lifetimes).

Each section is invoked as ``python scripts/bench_sections.py <name> <out>``
by the ``bench.py`` orchestrator and writes its JSON result to ``<out>``,
updating the file incrementally after every sub-step so a timeout or OOM
still leaves a partial artifact (round-3 lesson: one shared process lost
three artifacts to one RESOURCE_EXHAUSTED).

Timing discipline follows the reference miniapps (fenced, warmups excluded,
``miniapp/miniapp_cholesky.cpp:128-155``): every measured program takes a
donated input prepared outside the timed region and is fenced by a tiny
scalar readback (block_until_ready does not block on this backend); the
fence+dispatch overhead is measured once and subtracted.

Residual gates run ON DEVICE: the tunnel moves ~0.02 GB/s host<->device, so
pulling an n=32768 eigenvector matrix to numpy would cost minutes; instead
the gates use O(n^2) on-device products with O(1) scalar readbacks
(the same bounds as the reference's
``test_eigensolver_correctness.h:71-96``, eps-scaled).
"""
import json
import resource
import sys
import time

# XLA's executable (de)serializer recurses deeply on the big eigensolver
# programs; under a default 8 MiB stack the persistent-compile-cache path
# segfaults (same guard as tests/conftest.py — a FINITE soft limit also
# propagates to XLA worker threads via glibc's pthread default).
try:
    _hard = resource.getrlimit(resource.RLIMIT_STACK)[1]
    _want = 512 << 20
    if _hard != resource.RLIM_INFINITY:
        _want = min(_want, _hard)
    resource.setrlimit(resource.RLIMIT_STACK, (_want, _hard))
except (ValueError, OSError):
    pass

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_fence = jax.jit(lambda y: y.ravel()[-1])


def _sync(x):
    float(_fence(x))


def _overhead():
    tiny = jnp.ones((8, 128), jnp.float32)
    _sync(tiny)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(tiny)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _time_donated(fn, mk_input, ovh, reps=3):
    """min time of fn(x) over fresh donated inputs, fence overhead removed."""
    out = fn(mk_input())  # compile + warmup
    del out
    ts = []
    for _ in range(reps):
        x = mk_input()
        _sync(x)
        t0 = time.perf_counter()
        y = fn(x)
        _sync(y)
        ts.append(time.perf_counter() - t0)
        del y
    return max(min(ts) - ovh, 1e-9)


class Result:
    """Incrementally-written JSON result file."""

    def __init__(self, path):
        self.path = path
        self.data = {}

    def update(self, **kv):
        self.data.update(kv)
        with open(self.path, "w") as f:
            json.dump(self.data, f, indent=1)
            f.write("\n")


# ---------------------------------------------------------------------------
# POTRF headline + self-tuner


def _env_ladder(var: str, default: tuple) -> tuple:
    """Rung-list override (testing: lets the CPU lane drive the degraded-
    server ladder at toy sizes, with an oversized first rung forcing a real
    allocation failure)."""
    import os
    raw = os.environ.get(var)
    return tuple(int(x) for x in raw.split(",")) if raw else default


def section_potrf(res: Result):
    import dlaf_tpu as dt
    from dlaf_tpu.matrix import generators as gen

    prec = "high"
    dt.set_tune_parameters(matmul_precision=prec)
    ovh = _overhead()

    # GEMM ceiling at the same precision = practical MXU peak; ladder down
    # on a degraded server (HBM-leaked tunnel, see _hbm_contiguity_probe) —
    # a reduced-scale ceiling+headline beats a null headline.
    peak = None
    for ng in _env_ladder("DLAF_BENCH_GEMM_NS", (16384, 8192)):
        try:
            b = jax.random.normal(jax.random.PRNGKey(1), (ng, ng),
                                  jnp.float32)
            gemm_fn = jax.jit(
                lambda x: jnp.matmul(x, x, precision=prec), donate_argnums=0)
            mk_b = jax.jit(lambda x: x + 0.0)
            t_gemm = _time_donated(gemm_fn, lambda: mk_b(b), ovh)
            peak = 2 * ng**3 / t_gemm / 1e12
            del b
            break
        except Exception as exc:  # noqa: BLE001 - try the smaller rung
            res.update(**{f"gemm_ceiling_n{ng}_error": repr(exc)[:120]})
    if peak is None:
        res.update(skipped_reason="hbm_degraded: gemm ceiling does not fit")
        return
    res.update(gemm_ceiling_tflops=round(peak, 2), gemm_ceiling_n=ng)

    eps32 = float(jnp.finfo(jnp.float32).eps)
    n = _env_ladder("DLAF_BENCH_POTRF_NS", (32768, 16384, 8192))[0]

    def potrf_jit(mode, nbc):
        dt.set_tune_parameters(potrf_trailing_kernel=mode)
        return jax.jit(lambda x, nb_=nbc: dt.potrf(x, uplo="U", nb=nb_,
                                                   clean=False),
                       donate_argnums=0)

    # --- probe A/B at n=16384: (trailing kernel) x (block size) ----------
    # n=8192 runs (~4ms) vanish under the fence overhead on this tunneled
    # backend, so the probe runs at n=16384 where candidates take ~30ms.
    # Non-reference winners must (a) beat xla@512 by >= 3% at the probe,
    # (b) pass an eps-scaled correctness gate (test-style bound, VERDICT r03
    # weak #7), and (c) CONFIRM the win at the headline scale n=32768
    # (round-3 regression: a 2.7%/2-rep probe win lost ~22% at n=32768).
    trailing, nb = "xla", 512
    ab_times = {}
    confirm = {}
    try:
        na = _env_ladder("DLAF_BENCH_TUNER_N", (16384,))[0]
        aa = gen.random_hermitian_positive_definite(jax.random.PRNGKey(4),
                                                    na, jnp.float32)
        mk = jax.jit(lambda x: x + 0.0)
        outs = {}
        for mode, nbc in [("xla", 512), ("pallas", 512), ("xla", 1024),
                          ("pallas", 1024)]:
            try:
                fn = potrf_jit(mode, nbc)
                ab_times[f"{mode}@{nbc}"] = _time_donated(
                    fn, lambda: mk(aa), ovh, reps=3)
                outs[f"{mode}@{nbc}"] = fn(mk(aa))
            except Exception as exc:  # noqa: BLE001 - keep other candidates
                ab_times[f"{mode}@{nbc}"] = repr(exc)[:120]
                if "RESOURCE_EXHAUSTED" in repr(exc):
                    # degraded server: every further failed allocation
                    # extends the wedge; fall back to the default kernel
                    # and save the HBM attempts for the headline ladder
                    break
        res.update(trailing_ab_seconds={
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in ab_times.items()})
        ref = outs["xla@512"]
        scale = float(jnp.max(jnp.abs(ref)))
        timed = {k: v for k, v in ab_times.items() if isinstance(v, float)}
        best = min(timed, key=timed.get)
        cand = None
        if best != "xla@512" and timed[best] < timed["xla@512"] * 0.97:
            # eps-scaled gate (tests use factor*n*eps, conftest.tol)
            dev = float(jnp.max(jnp.abs(outs[best] - ref)))
            res.update(probe_winner=best, probe_max_dev=dev)
            if dev <= 30 * na * eps32 * max(scale, 1.0):
                cand = best
        del aa, outs, ref
        # --- confirmation at the headline scale --------------------------
        if cand is not None:
            a32 = gen.random_hermitian_positive_definite(
                jax.random.PRNGKey(0), n, jnp.float32)
            mk32 = jax.jit(lambda x: x + 0.0)
            t_ref = _time_donated(potrf_jit("xla", 512),
                                  lambda: mk32(a32), ovh, reps=2)
            cmode, cnb = cand.split("@")[0], int(cand.split("@")[1])
            t_cand = _time_donated(potrf_jit(cmode, cnb),
                                   lambda: mk32(a32), ovh, reps=2)
            confirm = {"xla@512": round(t_ref, 4), cand: round(t_cand, 4)}
            res.update(confirm_seconds=confirm)
            if t_cand < t_ref * 0.99:
                trailing, nb = cmode, cnb
            del a32
    except Exception as exc:  # noqa: BLE001 - keep the default on any failure
        res.update(tuner_error=repr(exc)[:200])

    res.update(potrf_trailing_kernel=trailing, potrf_nb=nb)

    # --- headline run ------------------------------------------------------
    # contract n=32768 (4 GiB A), else the largest rung a degraded server
    # holds (the in-client generate-A attempt doubles as the fit probe; a
    # reduced-scale headline beats a null one — round-5 wedge lesson).
    a = None
    ladder = _env_ladder("DLAF_BENCH_POTRF_NS", (32768, 16384, 8192))
    for cand in ladder:
        try:
            a = gen.random_hermitian_positive_definite(
                jax.random.PRNGKey(0), cand, jnp.float32)
            _sync(a)
            n = cand
            break
        except Exception as exc:  # noqa: BLE001 - rung does not fit
            res.update(**{f"probe_n{cand}": repr(exc)[:120]})
            a = None
    if a is None:
        res.update(skipped_reason="hbm_degraded: no headline rung fits")
        return
    if n != ladder[0]:
        res.update(n_reduced_from=ladder[0])
    mk_a = jax.jit(lambda x: x + 0.0)
    t = _time_donated(potrf_jit(trailing, nb), lambda: mk_a(a), ovh)
    tflops = (n**3 / 3) / t / 1e12
    res.update(potrf_tflops=round(tflops, 2),
               vs_baseline=round(tflops / peak, 4),
               potrf_seconds=round(t, 4), n=n)


# ---------------------------------------------------------------------------
# HEEV n=8192: wall time, residual gates, per-stage breakdown


def _eigh_gates_device(a, w, v, n):
    """Reference-style gates computed on device (no host pulls):
    orth = max|V^T V - I|, res = max|A V - V diag(w)|."""
    @jax.jit
    def gates(a, w, v):
        eye = jnp.eye(v.shape[0], dtype=v.dtype)
        orth = jnp.max(jnp.abs(jnp.matmul(v.T, v, precision="float32") - eye))
        res = jnp.max(jnp.abs(jnp.matmul(a, v, precision="float32")
                              - v * w[None, :]))
        scale = jnp.maximum(jnp.max(jnp.abs(a)), 1.0)
        return orth, res, scale
    orth, resid, scale = (float(x) for x in gates(a, w, v))
    eps32 = float(jnp.finfo(jnp.float32).eps)
    ok = orth <= 500 * n * eps32 and resid <= 1000 * n * eps32 * scale
    return orth, resid, bool(ok)


def section_heev(res: Result):
    import dlaf_tpu as dt
    from dlaf_tpu.matrix import generators as gen

    dt.set_tune_parameters(matmul_precision="high")
    ovh = _overhead()
    ne = 8192
    ah = gen.random_hermitian(jax.random.PRNGKey(2), ne, jnp.float32)

    # band self-tuning (the chase moves ~9 n^2 b bytes: narrower band =
    # less traffic but more windows; wider = fewer stage-4 groups) with
    # the residual gate probed per candidate
    band_times = {}
    best_band = 128
    for cand in (64, 128, 256):
        try:
            eigh_fn = jax.jit(lambda x, b_=cand: dt.eigh(x, band=b_))
            w, v = eigh_fn(ah)
            _sync(v)
            t0 = time.perf_counter()
            w, v = eigh_fn(ah)
            _sync(v)
            band_times[cand] = round(time.perf_counter() - t0 - ovh, 3)
            orth, resid, ok = _eigh_gates_device(ah, w, v, ne)
            if not ok:
                band_times[cand] = f"gate_failed orth={orth:.2e} res={resid:.2e}"
            del w, v
        except Exception as exc:  # noqa: BLE001
            band_times[cand] = repr(exc)[:120]
        res.update(band_ab_seconds={str(k): v for k, v in band_times.items()})
    timed_bands = {k: v for k, v in band_times.items()
                   if isinstance(v, float)}
    if timed_bands:
        best_band = min(timed_bands, key=timed_bands.get)
    dt.set_tune_parameters(eigensolver_min_band=best_band)

    eigh_fn = jax.jit(lambda x, b_=best_band: dt.eigh(x, band=b_))
    w, v = eigh_fn(ah)
    _sync(v)
    t0 = time.perf_counter()
    w, v = eigh_fn(ah)
    _sync(v)
    t_eigh = time.perf_counter() - t0 - ovh
    orth, resid, ok = _eigh_gates_device(ah, w, v, ne)
    res.update(n=ne, seconds=round(t_eigh, 3), orth=orth, res=resid,
               residual_gates_pass=ok, band=best_band)
    del w, v

    # --- per-stage breakdown (VERDICT r03 #4: aim the optimization) -------
    try:
        from dlaf_tpu.algos.eigensolver.band2tridiag import band_to_tridiag_auto
        from dlaf_tpu.algos.eigensolver.red2band import (extract_band,
                                                         reduction_to_band)
        from dlaf_tpu.algos.eigensolver.tridiag_dc import tridiag_eigh
        b_ = best_band

        def timed(fn, *args):
            out = fn(*args)
            _sync(out[0] if isinstance(out, tuple) else out)
            t0 = time.perf_counter()
            out = fn(*args)
            _sync(out[0] if isinstance(out, tuple) else out)
            return time.perf_counter() - t0 - ovh, out

        s1_fn = jax.jit(lambda x: reduction_to_band(x, b_)[0])
        t_s1, packed = timed(s1_fn, ah)
        s2_fn = jax.jit(lambda p: band_to_tridiag_auto(
            extract_band(p, b_), b_))
        t_s2, (d_, e_, vs_, taus_) = timed(s2_fn, packed)
        s3_fn = jax.jit(lambda d, e: tridiag_eigh(d, e))
        t_s3, _ = timed(s3_fn, d_, e_)
        stages = {"stage1_red2band": round(t_s1, 3),
                  "stage2_band2tridiag": round(t_s2, 3),
                  "stage3_tridiag_dc": round(t_s3, 3),
                  "stage45_bt_both": round(t_eigh - t_s1 - t_s2 - t_s3, 3)}
        res.update(stage_seconds=stages)
    except Exception as exc:  # noqa: BLE001
        res.update(stage_seconds={"error": repr(exc)[:200]})


# ---------------------------------------------------------------------------
# HEEV n=32768 (the BASELINE.json contract scale)


def _hbm_contiguity_probe(res: Result, n: int = 32768,
                          nblocks: int = 3) -> bool:
    """Probe whether ``nblocks`` sequential n^2 f32 contiguous buffers fit
    (the eigh_large peak is 3 x n^2). The shared tunnel server leaks HBM
    across crashed clients (round-4 diagnosis, HEEV_32768.json caveat): on
    a degraded server the third block fails and the contract-scale attempt
    would burn OOM -> cooldown -> OOM. Prefers the backend's memory_stats
    (no allocation, no server-side OOM debris — a probe OOM itself wedges
    the server for many minutes, observed round 5); falls back to real
    allocations when stats are unavailable. Records the failure mode."""
    need = nblocks * n * n * 4
    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit") or stats.get(
            "bytes_reservable_limit")
        used = stats.get("bytes_in_use", 0)
        if limit:
            ok = limit - used >= need * 1.02
            if not ok:
                res.update(skipped_reason="hbm_degraded",
                           hbm_probe=f"memory_stats: {(limit - used) / 2**30:.2f}"
                                     f" GiB free < {need / 2**30:.2f} needed")
            return ok
    except Exception:  # noqa: BLE001 - stats unsupported on this backend
        pass
    held = []
    try:
        for i in range(nblocks):
            buf = jax.jit(lambda n_=n: jnp.zeros((n_, n_), jnp.float32))()
            _sync(buf)
            held.append(buf)
        return True
    except Exception as exc:  # noqa: BLE001 - RESOURCE_EXHAUSTED expected
        res.update(skipped_reason="hbm_degraded",
                   hbm_probe=f"{len(held)}/{nblocks} {n * n * 4 / 2**30:.1f}"
                             "GiB blocks fit",
                   hbm_probe_error=repr(exc)[:160])
        return False
    finally:
        del held


def section_heev_big(res: Result):
    import os

    import dlaf_tpu as dt
    from dlaf_tpu.matrix import generators as gen

    budget = float(os.environ.get("DLAF_BENCH_BUDGET_S", "700"))
    t_section0 = time.perf_counter()
    dt.set_tune_parameters(matmul_precision="high")
    ovh = _overhead()
    eps32 = float(jnp.finfo(jnp.float32).eps)

    # contract scale, else the largest reduced scale the (possibly
    # HBM-degraded, see memory_stats probe) server can hold — a stage-timed
    # artifact at 24576 beats a skip. ASCENDING with early bail: every
    # FAILED allocation extends the server's wedge (round-5 observation),
    # so probe the smallest rung first and stop at the first failure —
    # at most ONE failed allocation per attempt, vs 3-9 descending.
    nb2 = 0
    for cand in (16384, 24576, 32768):
        if _hbm_contiguity_probe(res, n=cand):
            nb2 = cand
            res.data.pop("skipped_reason", None)
        else:
            res.update(**{f"probe_n{cand}": "does_not_fit"})
            break
    if not nb2:
        return
    if nb2 != 32768:
        res.update(n_reduced_from=32768)

    def mk_a():
        return gen.random_hermitian(jax.random.PRNGKey(3), nb2, jnp.float32)

    try:
        from dlaf_tpu.algos.eigensolver.large import eigh_large
        a = mk_a()
        _sync(a)
        t0 = time.perf_counter()
        w, v, stage_s = eigh_large(a, timers=True)   # consumes (donates) a
        _sync(v)
        t_warm = time.perf_counter() - t0
        res.update(n=nb2, seconds_cold=round(t_warm, 3),
                   stage_seconds={k: round(s, 3) for k, s in stage_s.items()})
        # timed run (compile cached now)
        del w, v
        a = mk_a()
        _sync(a)
        t0 = time.perf_counter()
        w, v, stage_s = eigh_large(a, timers=True)
        _sync(v)
        t_big = time.perf_counter() - t0 - ovh
        res.update(seconds=round(t_big, 3),
                   stage_seconds={k: round(s, 3) for k, s in stage_s.items()})
        # on-device probe gates (O(n^2) per probe), input regenerated
        a = mk_a()

        @jax.jit
        def probes(a, w, v):
            u = jax.random.normal(jax.random.PRNGKey(5), (nb2, 4), jnp.float32)
            u = u / jnp.linalg.norm(u, axis=0, keepdims=True)
            vu = jnp.matmul(v, u, precision="float32")
            orth = jnp.max(jnp.abs(jnp.matmul(v.T, vu, precision="float32")
                                   - u))
            resid = jnp.max(jnp.abs(jnp.matmul(a, vu, precision="float32")
                                    - jnp.matmul(v, w[:, None] * u,
                                                 precision="float32")))
            return orth, resid, jnp.maximum(jnp.max(jnp.abs(a)), 1.0)

        orth_b, res_b, scale_b = (float(x) for x in probes(a, w, v))
        gates = orth_b <= 500 * nb2 * eps32 and \
            res_b <= 1000 * nb2 * eps32 * scale_b
        res.update(orth_probe=orth_b, res_probe=res_b,
                   residual_gates_pass=bool(gates))
        del a, w, v
    except Exception as exc:  # noqa: BLE001 - fall back to eigenvalues only
        res.update(full_evp_error=repr(exc)[:300])
        evp_failed = True
    else:
        evp_failed = False
    if evp_failed:
        # the except block is OVER: the exception + traceback (which pin
        # the failed attempt's ~13 GB of HBM through frame references) are
        # dead; collect before retrying (round-4 lesson: the fallback
        # OOM'd while the dead EVP frames still held q/packed/buf).
        # Then COOL DOWN: the tunnel server reclaims a crashed/OOM'd
        # execution's HBM asynchronously (observed minutes-long lag); an
        # immediate retry OOMs on buffers that are already logically dead.
        # The cooldown is BUDGET-AWARE (round-4 lesson: an unconditional
        # 180s sleep pushed the whole bench past the driver timeout): the
        # fallback needs ~120s; with less headroom, skip it.
        import gc
        gc.collect()
        headroom = budget - (time.perf_counter() - t_section0)
        cooldown = min(180.0, headroom - 120.0)
        if cooldown < 30.0:
            res.update(fallback_skipped="insufficient budget for cooldown "
                                        f"(headroom {headroom:.0f}s)")
            return
        time.sleep(cooldown)
        try:
            jax.clear_caches()
            from dlaf_tpu.algos.eigensolver.large import eigvalsh_large
            w = eigvalsh_large(mk_a())      # compile + warmup (donates)
            _sync(w)
            del w
            a = mk_a()
            _sync(a)
            t0 = time.perf_counter()
            w = eigvalsh_large(a)
            _sync(w)
            t_ev = time.perf_counter() - t0 - ovh
            tr = float(jnp.sum(w) - jnp.trace(mk_a()))
            res.update(n=nb2, mode="eigvalsh_fallback",
                       seconds=round(t_ev, 3), trace_err=tr)
        except Exception as exc2:  # noqa: BLE001
            res.update(eigvalsh_error=repr(exc2)[:300])


# ---------------------------------------------------------------------------
# distributed 1x1 overhead + TPU kernel smoke


def section_dist(res: Result):
    import os
    sys.path.insert(0, "/root/repo/scripts")
    import bench_dist
    budget = float(os.environ.get("DLAF_BENCH_BUDGET_S", "900"))
    # bench_dist checkpoints incrementally into THIS section's result file:
    # a timeout still leaves every candidate measured so far (round-5
    # lesson — the dist section burned its whole cap and left nothing).
    args = ["--budget", str(max(budget - 90, 120)), "--out", res.path]
    if budget < 900:
        args.append("--skip-eigh")
    bench_dist.main(args)
    with open(res.path) as f:
        res.data = json.load(f)
    res.update(section="dist")
    with open("/root/repo/BENCH_DIST.json", "w") as f:
        json.dump({k: v for k, v in res.data.items() if k != "section"},
                  f, indent=1)
        f.write("\n")


def section_smoke(res: Result):
    import numpy as np
    from dlaf_tpu.matrix import generators as gen
    from dlaf_tpu.ops.pallas.potrf import potrf_tile
    from dlaf_tpu.ops.pallas.trailing import ksub_matmul
    ts_ = gen.random_hermitian_positive_definite(
        jax.random.PRNGKey(9), 256, jnp.float32)
    # residual check on HOST in f64 (a default-precision device matmul is
    # bf16 on TPU — it would swamp the kernel's own error); 256^2 is tiny
    u_ = np.triu(np.asarray(potrf_tile(ts_, upper=True))).astype(np.float64)
    tn = np.asarray(ts_).astype(np.float64)
    r_pot = float(np.max(np.abs(u_.T @ u_ - tn)))
    cx = jax.random.normal(jax.random.PRNGKey(10), (256, 256), jnp.float32)
    xx = jax.random.normal(jax.random.PRNGKey(11), (512, 256), jnp.float32)
    yy = jax.random.normal(jax.random.PRNGKey(12), (512, 256), jnp.float32)
    r_ks = float(np.max(np.abs(
        np.asarray(ksub_matmul(cx, xx, yy)).astype(np.float64) -
        (np.asarray(cx).astype(np.float64)
         - np.asarray(xx).T.astype(np.float64) @ np.asarray(yy)))))
    res.update(potrf_tile_res=r_pot, ksub_res=r_ks,
               ok=bool(r_pot < 1e-2 and r_ks < 1e-2))


SECTIONS = {
    "potrf": section_potrf,
    "heev": section_heev,
    "heev_big": section_heev_big,
    "dist": section_dist,
    "smoke": section_smoke,
}


def main():
    name, out = sys.argv[1], sys.argv[2]
    sys.path.insert(0, "/root/repo")
    res = Result(out)
    # written before any device op: a later empty-but-present file means
    # the section hung acquiring the chip, not that it failed to start
    res.update(section=name)
    try:
        SECTIONS[name](res)
    except Exception as exc:  # noqa: BLE001 - partial result + error marker
        res.update(error=repr(exc)[:300])
        raise


if __name__ == "__main__":
    main()
