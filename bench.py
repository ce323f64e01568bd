"""Headline benchmark: distributed-capable POTRF throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is POTRF sustained TFLOP/s divided by the machine's measured
GEMM ceiling at the same precision — i.e. fraction of practical MXU peak
(BASELINE.md target: >= 0.70).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _time_scalar(fn, *args, reps=3):
    float(fn(*args))  # compile + warmup
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    sys.path.insert(0, "/root/repo")
    import dlaf_tpu as dt
    from dlaf_tpu.matrix import generators as gen

    n, nb = 8192, 256
    prec = "high"
    dt.set_tune_parameters(matmul_precision=prec)

    key = jax.random.PRNGKey(0)
    a = gen.random_hermitian_positive_definite(key, n, jnp.float32)

    # GEMM ceiling at the same precision = practical peak
    b = jax.random.normal(key, (n, n), jnp.float32)
    gemm_fn = jax.jit(lambda x, y: jnp.sum(jnp.matmul(x, y, precision=prec)))
    t_gemm = _time_scalar(gemm_fn, b, b)
    peak = 2 * n**3 / t_gemm / 1e12

    potrf_fn = jax.jit(lambda x: jnp.sum(dt.potrf(x, nb=nb)))
    t = _time_scalar(potrf_fn, a)
    tflops = (n**3 / 3) / t / 1e12

    print(json.dumps({
        "metric": f"potrf_f32_n{n}_tflops",
        "value": round(tflops, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(tflops / peak, 4),
    }))


if __name__ == "__main__":
    main()
