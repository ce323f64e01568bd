"""Headline benchmark: POTRF throughput on one chip at n = 32768,
plus the HEEV (eigh) wall time at n = 8192 with residual gates.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (POTRF, the
driver contract), with the HEEV numbers under the extra "heev" key; the full
set is also written to BENCH_EXTRA.json.
``vs_baseline`` = POTRF sustained TFLOP/s divided by the measured GEMM
ceiling at the same matmul precision — i.e. fraction of practical MXU peak
(BASELINE.md target: >= 0.70 of MXU peak at n = 32768).

Precision: f32 data with bf16_3x (jax "high") matmuls — the same effective
f32 pipeline the residual tests validate.

Timing discipline (reference style: fenced, warmups excluded,
``miniapp/miniapp_cholesky.cpp:128-155``): every measured program takes a
donated input prepared outside the timed region and is fenced by a tiny
scalar readback (block_until_ready does not block on this backend); the
fence+dispatch overhead is measured separately and subtracted symmetrically
from both POTRF and the GEMM ceiling.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_fence = jax.jit(lambda y: y.ravel()[-1])


def _sync(x):
    float(_fence(x))


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


def main():
    sys.path.insert(0, "/root/repo")
    import os

    import dlaf_tpu as dt
    from dlaf_tpu.matrix import generators as gen

    t_start = time.perf_counter()
    budget = float(os.environ.get("DLAF_BENCH_BUDGET_S", "2400"))

    def over_budget():
        return time.perf_counter() - t_start > budget

    prec = "high"
    dt.set_tune_parameters(matmul_precision=prec)

    # fence + dispatch overhead through the runtime
    tiny = jnp.ones((8, 128), jnp.float32)
    _sync(tiny)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(tiny)
        ts.append(time.perf_counter() - t0)
    ovh = min(ts)

    # GEMM ceiling at the same precision = practical MXU peak
    ng = 16384
    b = jax.random.normal(jax.random.PRNGKey(1), (ng, ng), jnp.float32)
    gemm_fn = jax.jit(
        lambda x: jnp.matmul(x, x, precision=prec), donate_argnums=0)
    mk_b = jax.jit(lambda x: x + 0.0)
    t_gemm = _time_donated(gemm_fn, lambda: mk_b(b), ovh)
    peak = 2 * ng**3 / t_gemm / 1e12

    # POTRF self-tuning at n=8192: A/B (trailing kernel) x (block size) and
    # keep the winner for the headline run — the fused Pallas accumulator
    # (ops/pallas/trailing.py) vs XLA dot+subtract, and nb=1024's deeper
    # trailing contractions vs nb=512's cheaper serial diagonal work. Every
    # non-reference candidate passes a correctness gate before selection.
    trailing, nb = "xla", 512
    try:
        na = 8192
        aa = gen.random_hermitian_positive_definite(jax.random.PRNGKey(4),
                                                    na, jnp.float32)
        mk = jax.jit(lambda x: x + 0.0)
        ab_times = {}
        outs = {}
        cands = [("xla", 512), ("pallas", 512), ("xla", 1024),
                 ("pallas", 1024)]
        for mode, nbc in cands:
            if over_budget() and ab_times:
                ab_times[f"{mode}@{nbc}"] = "skipped: wall budget"
                continue
            try:
                dt.set_tune_parameters(potrf_trailing_kernel=mode)
                fn = jax.jit(lambda x, nb_=nbc, m_=mode:
                             dt.potrf(x, uplo="U", nb=nb_, clean=False),
                             donate_argnums=0)
                ab_times[f"{mode}@{nbc}"] = _time_donated(
                    fn, lambda: mk(aa), ovh, reps=2)
                outs[f"{mode}@{nbc}"] = fn(mk(aa))
            except Exception as exc:  # noqa: BLE001 - keep other candidates
                ab_times[f"{mode}@{nbc}"] = repr(exc)[:120]
        ref = outs["xla@512"]
        scale = float(jnp.max(jnp.abs(ref)))
        timed = {k: v for k, v in ab_times.items() if isinstance(v, float)}
        best = min(timed, key=timed.get)
        if best != "xla@512":
            dev = float(jnp.max(jnp.abs(outs[best] - ref)))
            ab_times["max_dev"] = dev
            if timed[best] < timed["xla@512"] * 0.995 and \
                    dev <= 1e-3 * max(scale, 1.0):
                trailing, nb = best.split("@")[0], int(best.split("@")[1])
        del aa, outs, ref
    except Exception:  # noqa: BLE001 - keep the default on any failure
        ab_times = {"error": True}
    dt.set_tune_parameters(potrf_trailing_kernel=trailing)

    # POTRF (upper: the layout-native uplo on TPU, see ops/blocked.py)
    n = 32768
    a = gen.random_hermitian_positive_definite(jax.random.PRNGKey(0), n,
                                               jnp.float32)
    potrf_fn = jax.jit(
        lambda x: dt.potrf(x, uplo="U", nb=nb, clean=False), donate_argnums=0)
    mk_a = jax.jit(lambda x: x + 0.0)
    t = _time_donated(potrf_fn, lambda: mk_a(a), ovh)
    tflops = (n**3 / 3) / t / 1e12

    # HEEV: wall time + the reference's correctness gates
    # (test_eigensolver_correctness.h:71-96: ||E^H E - I|| and ||AE - E Lam||
    # scaled by n * eps)
    import numpy as np
    ne = 8192
    ah = gen.random_hermitian(jax.random.PRNGKey(2), ne, jnp.float32)

    # band self-tuning: stage 2 is iteration-bound (~n^2/b windows), so a
    # wider band is faster through the chase IF the Mosaic kernel compiles
    # at 256 (single-sublane record drains) and the gates still pass.
    # NOTE: tune state is invisible to jit caching, so each candidate gets
    # its own jit with the band passed explicitly.
    band_times = {}
    best_band = 128
    for cand in ((128, 256) if not over_budget() else (128,)):
        try:
            eigh_fn = jax.jit(lambda x, b_=cand: dt.eigh(x, band=b_))
            w, v = eigh_fn(ah)
            _sync(v)
            t0 = time.perf_counter()
            w, v = eigh_fn(ah)
            _sync(v)
            band_times[cand] = round(time.perf_counter() - t0 - ovh, 3)
            # probe residual gate before trusting the candidate
            wn_, vn_ = np.asarray(w), np.asarray(v)
            an_ = np.asarray(ah)
            u_ = np.asarray(jax.random.normal(jax.random.PRNGKey(5),
                                              (ne, 2), jnp.float32))
            rp = np.abs(an_ @ (vn_ @ u_) - vn_ @ (wn_[:, None] * u_)).max()
            if rp > 2000 * ne * float(jnp.finfo(jnp.float32).eps) * \
                    max(np.abs(an_).max(), 1.0):
                band_times[cand] = f"gate_failed res={rp:.2e}"
        except Exception as exc:  # noqa: BLE001
            band_times[cand] = repr(exc)[:120]
    if isinstance(band_times.get(256), float) and \
            isinstance(band_times.get(128), float) and \
            band_times[256] < band_times[128]:
        best_band = 256
    dt.set_tune_parameters(eigensolver_min_band=best_band)
    eigh_fn = jax.jit(lambda x, b_=best_band: dt.eigh(x, band=b_))

    w, v = eigh_fn(ah)
    _sync(v)
    t0 = time.perf_counter()
    w, v = eigh_fn(ah)
    _sync(v)
    t_eigh = time.perf_counter() - t0 - ovh
    wn, vn = np.asarray(w), np.asarray(v)
    an = np.asarray(ah)
    orth = float(np.max(np.abs(vn.T @ vn - np.eye(ne))))
    res = float(np.max(np.abs(an @ vn - vn * wn[None, :])))
    scale = float(max(np.max(np.abs(an)), 1.0))
    eps32 = float(jnp.finfo(jnp.float32).eps)
    gates = orth <= 500 * ne * eps32 and res <= 1000 * ne * eps32 * scale

    heev = {"n": ne, "seconds": round(t_eigh, 3), "orth": orth, "res": res,
            "residual_gates_pass": bool(gates),
            "band": best_band, "band_ab_seconds": band_times}

    # HEEV at the BASELINE.json contract scale n = 32768 (probe residuals:
    # the full n^3 host-side checks would take ~30 min on this 1-core host,
    # so gates use O(n^2)-per-probe products; stage-1+2 share timed by
    # running stages 1-2 alone once)
    heev_big = None
    try:
        if over_budget():
            raise TimeoutError("bench wall budget exhausted")
        nb2 = 32768
        ab = gen.random_hermitian(jax.random.PRNGKey(3), nb2, jnp.float32)
        w, v = eigh_fn(ab)
        _sync(v)
        t0 = time.perf_counter()
        w, v = eigh_fn(ab)
        _sync(v)
        t_big = time.perf_counter() - t0 - ovh
        # stage 1+2 share
        from dlaf_tpu.algos.eigensolver.band2tridiag import band_to_tridiag_auto
        from dlaf_tpu.algos.eigensolver.driver import get_band_size
        from dlaf_tpu.algos.eigensolver.red2band import (extract_band,
                                                         reduction_to_band)
        from dlaf_tpu.tune import get_tune_parameters
        bnd = get_band_size(get_tune_parameters().default_block_size)
        s12_fn = jax.jit(lambda x: band_to_tridiag_auto(
            extract_band(reduction_to_band(x, bnd)[0], bnd), bnd)[0])
        s1_fn = jax.jit(lambda x: reduction_to_band(x, bnd)[0])
        d_ = s12_fn(ab); _sync(d_)
        t0 = time.perf_counter(); d_ = s12_fn(ab); _sync(d_)
        t_s12 = time.perf_counter() - t0 - ovh
        p_ = s1_fn(ab); _sync(p_)
        t0 = time.perf_counter(); p_ = s1_fn(ab); _sync(p_)
        t_s1 = time.perf_counter() - t0 - ovh
        del p_, d_
        wn, vn = np.asarray(w), np.asarray(v)
        an = np.asarray(ab)
        rng = np.random.default_rng(0)
        u = rng.standard_normal((nb2, 4)).astype(np.float32)
        u /= np.linalg.norm(u, axis=0, keepdims=True)
        orth_b = float(np.abs(vn.T @ (vn @ u) - u).max())
        res_b = float(np.abs(an @ (vn @ u) - vn @ (wn[:, None] * u)).max())
        scale_b = float(max(np.abs(an).max(), 1.0))
        gates_b = orth_b <= 500 * nb2 * eps32 and \
            res_b <= 1000 * nb2 * eps32 * scale_b
        heev_big = {"n": nb2, "seconds": round(t_big, 3),
                    "stage12_seconds": round(t_s12, 3),
                    "stage1_seconds": round(t_s1, 3),
                    "orth_probe": orth_b, "res_probe": res_b,
                    "residual_gates_pass": bool(gates_b)}
        del w, v, wn, vn, an, ab
    except TimeoutError as exc:
        heev_big = {"skipped": str(exc)}
    except Exception as exc:  # noqa: BLE001 - report, don't fail the bench
        # most likely HBM exhaustion (full EVP needs ~5 n^2 f32 buffers);
        # fall back to eigenvalues-only, which still runs stages 1-3
        try:
            ab = gen.random_hermitian(jax.random.PRNGKey(3), 32768,
                                      jnp.float32)
            ev_fn = jax.jit(lambda x: dt.eigvalsh(x))
            w = ev_fn(ab)
            _sync(w)
            t0 = time.perf_counter()
            w = ev_fn(ab)
            _sync(w)
            t_ev = time.perf_counter() - t0 - ovh
            tr = float(jnp.sum(w) - jnp.trace(ab))
            heev_big = {"n": 32768, "mode": "eigvalsh_fallback",
                        "seconds": round(t_ev, 3),
                        "trace_err": tr,
                        "full_evp_error": repr(exc)[:200]}
            del w, ab
        except Exception as exc2:  # noqa: BLE001
            heev_big = {"error": repr(exc)[:200],
                        "eigvalsh_error": repr(exc2)[:200]}
    # distributed-vs-local artifact refresh (BENCH_DIST.json): the 1x1-grid
    # overhead measurement, in-process (a second process could not grab the
    # chip through the tunnel) with the leftover wall budget
    dist_1x1 = None
    try:
        del a  # free the POTRF input (bench_dist makes its own)
        rem = budget - (time.perf_counter() - t_start)
        if rem > 300:
            sys.path.insert(0, "/root/repo/scripts")
            import bench_dist
            bd_args = ["--budget", str(max(rem - 60, 120))]
            if rem < 900:
                bd_args.append("--skip-eigh")
            bench_dist.main(bd_args)
            with open("/root/repo/BENCH_DIST.json") as f:
                dist_1x1 = json.load(f)
        else:
            dist_1x1 = {"skipped": "bench wall budget exhausted"}
    except Exception as exc:  # noqa: BLE001 - report, don't fail the bench
        dist_1x1 = {"error": repr(exc)[:200]}

    # hardware kernel smoke: the Pallas tile kernels on the real chip
    # (the TPU pytest lane's core checks, wired into the driver flow)
    try:
        from dlaf_tpu.ops.pallas.potrf import potrf_tile
        from dlaf_tpu.ops.pallas.trailing import ksub_matmul
        ts_ = gen.random_hermitian_positive_definite(
            jax.random.PRNGKey(9), 256, jnp.float32)
        u_ = potrf_tile(ts_, upper=True)
        r_pot = float(jnp.max(jnp.abs(jnp.triu(u_).T @ jnp.triu(u_) - ts_)))
        cx = jax.random.normal(jax.random.PRNGKey(10), (256, 256), jnp.float32)
        xx = jax.random.normal(jax.random.PRNGKey(11), (512, 256), jnp.float32)
        yy = jax.random.normal(jax.random.PRNGKey(12), (512, 256), jnp.float32)
        r_ks = float(jnp.max(jnp.abs(
            ksub_matmul(cx, xx, yy) -
            (cx - jnp.matmul(xx.T, yy, precision="float32")))))
        smoke = {"potrf_tile_res": r_pot, "ksub_res": r_ks,
                 "pass": bool(r_pot < 1e-2 and r_ks < 1e-2)}
    except Exception as exc:  # noqa: BLE001
        smoke = {"error": repr(exc)[:200], "pass": False}

    line = {
        "metric": f"potrf_f32_n{n}_tflops",
        "value": round(tflops, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(tflops / peak, 4),
        "heev": heev,
        "heev_32768": heev_big,
    }
    with open("/root/repo/BENCH_EXTRA.json", "w") as f:
        json.dump({"potrf_tflops": round(tflops, 2),
                   "gemm_ceiling_tflops": round(peak, 2),
                   "potrf_trailing_kernel": trailing,
                   "potrf_nb": nb,
                   "trailing_ab_seconds": {k: (round(v, 4)
                                               if isinstance(v, float) else v)
                                           for k, v in ab_times.items()},
                   "heev": heev,
                   "heev_32768": heev_big,
                   "dist_1x1": dist_1x1,
                   "tpu_kernel_smoke": smoke}, f, indent=1)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
