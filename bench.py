"""Headline benchmark: POTRF throughput on one chip at n = 32768.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` = POTRF sustained TFLOP/s divided by the measured GEMM
ceiling at the same matmul precision — i.e. fraction of practical MXU peak
(BASELINE.md target: >= 0.70 of MXU peak at n = 32768).

Precision: f32 data with bf16_3x (jax "high") matmuls — the same effective
f32 pipeline the residual tests validate.
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

    prec = "high"
    dt.set_tune_parameters(matmul_precision=prec)

    # dispatch overhead through the runtime (excluded from both measurements
    # symmetrically, reference-style fenced timing)
    tiny = jnp.ones((8, 128), jnp.float32)
    ovh = _time_scalar(jax.jit(lambda v: jnp.sum(v)), tiny, reps=5)

    # GEMM ceiling at the same precision = practical MXU peak
    ng = 16384
    b = jax.random.normal(jax.random.PRNGKey(1), (ng, ng), jnp.float32)
    gemm_fn = jax.jit(lambda x, y: jnp.sum(jnp.matmul(x, y, precision=prec)))
    t_gemm = max(_time_scalar(gemm_fn, b, b) - ovh, 1e-9)
    peak = 2 * ng**3 / t_gemm / 1e12

    n, nb = 32768, 512
    a = gen.random_hermitian_positive_definite(jax.random.PRNGKey(0), n, jnp.float32)
    potrf_fn = jax.jit(lambda x: jnp.sum(dt.potrf(x, nb=nb, clean=False)))
    t = max(_time_scalar(potrf_fn, a) - ovh, 1e-9)
    tflops = (n**3 / 3) / t / 1e12

    print(json.dumps({
        "metric": f"potrf_f32_n{n}_tflops",
        "value": round(tflops, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(tflops / peak, 4),
    }))


if __name__ == "__main__":
    main()
