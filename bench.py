"""Headline benchmark: POTRF throughput on one chip at n = 32768.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
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
    import dlaf_tpu as dt
    from dlaf_tpu.matrix import generators as gen

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

    # POTRF (upper: the layout-native uplo on TPU, see ops/blocked.py)
    n, nb = 32768, 512
    a = gen.random_hermitian_positive_definite(jax.random.PRNGKey(0), n,
                                               jnp.float32)
    potrf_fn = jax.jit(
        lambda x: dt.potrf(x, uplo="U", nb=nb, clean=False), donate_argnums=0)
    mk_a = jax.jit(lambda x: x + 0.0)
    t = _time_donated(potrf_fn, lambda: mk_a(a), ovh)
    tflops = (n**3 / 3) / t / 1e12

    print(json.dumps({
        "metric": f"potrf_f32_n{n}_tflops",
        "value": round(tflops, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(tflops / peak, 4),
    }))


if __name__ == "__main__":
    main()
