"""Contract-scale complex64 eigensolver artifact (HEEV_c64_16384.json).

The reference runs z-type (complex) eigensolvers at n <= 20480 in its
standard sweeps (scripts/gen_dlaf_strong-gpu.py:20-38; dtype dispatch
miniapp/include/dlaf/miniapp/dispatch.h:17-60). n = 16384 c64 keeps the
memory-planned pipeline's peak (~5 x n^2 complex+real mix ~ 9 GB) inside
the 16 GB chip; n = 32768 c64 cannot fit (packed alone is 8.6 GB).

Usage: python scripts/bench_heev_c64.py [--n 16384] [--band 128]
                                        [--rec-chunks 1] [--out PATH]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_fence = jax.jit(lambda y: jnp.real(y.ravel()[-1]))


def _sync(x):
    float(_fence(x))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--band", type=int, default=128)
    ap.add_argument("--rec-chunks", type=int, default=1)
    ap.add_argument("--out", default="/root/repo/HEEV_c64_16384.json")
    args = ap.parse_args(argv)
    n, b = args.n, args.band

    import dlaf_tpu as dt
    from dlaf_tpu.algos.eigensolver.large import eigh_large
    from dlaf_tpu.matrix import generators as gen

    dt.set_tune_parameters(matmul_precision="high")
    res = {"n": n, "dtype": "complex64", "band": b,
           "rec_chunks": args.rec_chunks}

    def save():
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
            f.write("\n")

    def mk_a():
        return gen.random_hermitian(jax.random.PRNGKey(3), n, jnp.complex64)

    a = mk_a()
    _sync(a)
    t0 = time.perf_counter()
    w, v, stage_s = eigh_large(a, band=b, rec_chunks=args.rec_chunks,
                               timers=True)
    _sync(v)
    res["seconds_cold"] = round(time.perf_counter() - t0, 3)
    res["stage_seconds"] = {k: round(s, 3) for k, s in stage_s.items()}
    save()
    del w, v
    a = mk_a()
    _sync(a)
    t0 = time.perf_counter()
    w, v, stage_s = eigh_large(a, band=b, rec_chunks=args.rec_chunks,
                               timers=True)
    _sync(v)
    res["seconds"] = round(time.perf_counter() - t0, 3)
    res["stage_seconds"] = {k: round(s, 3) for k, s in stage_s.items()}
    save()

    # on-device probe gates (reference bounds, eps-scaled:
    # test_eigensolver_correctness.h:71-96) — O(n^2) per probe
    a = mk_a()

    @jax.jit
    def probes(a, w, v):
        u = jax.random.normal(jax.random.PRNGKey(5), (n, 4), jnp.float32)
        u = (u / jnp.linalg.norm(u, axis=0, keepdims=True)).astype(a.dtype)
        vu = jnp.matmul(v, u, precision="float32")
        orth = jnp.max(jnp.abs(jnp.matmul(v.conj().T, vu,
                                          precision="float32") - u))
        resid = jnp.max(jnp.abs(jnp.matmul(a, vu, precision="float32")
                                - jnp.matmul(v, w[:, None].astype(a.dtype) * u,
                                             precision="float32")))
        return orth, resid, jnp.maximum(jnp.max(jnp.abs(a)), 1.0)

    orth, resid, scale = (float(jnp.real(x)) for x in probes(a, w, v))
    eps32 = float(jnp.finfo(jnp.float32).eps)
    res["orth_probe"] = orth
    res["res_probe"] = resid
    res["residual_gates_pass"] = bool(
        orth <= 500 * n * eps32 and resid <= 1000 * n * eps32 * scale)
    save()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
