"""Microbenchmark: GEMM ceiling + recursive POTRF on the real TPU.

Timing discipline: materialize a scalar reduction of the result (4-byte fetch
through the relay) instead of block_until_ready, which does not synchronize
reliably under the axon remote backend.
"""
import time

import jax
import jax.numpy as jnp

assert jax.default_backend() != "cpu", jax.devices()
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, reps=3):
    """fn must return a SCALAR jax value."""
    float(fn(*args))  # warmup/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_gemm(n, dtype, prec):
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (n, n), dtype)
    b = jax.random.normal(k, (n, n), dtype)
    f = jax.jit(lambda x, y: jnp.sum(jnp.matmul(x, y, precision=prec)).astype(jnp.float32))
    t = timeit(f, a, b)
    tf = 2 * n**3 / t / 1e12
    print(f"GEMM n={n} {jnp.dtype(dtype).name} prec={prec}: {t*1e3:.2f} ms  {tf:.1f} TFLOP/s", flush=True)


for prec in ["default", "high", "highest"]:
    bench_gemm(8192, jnp.float32, prec)
bench_gemm(8192, jnp.bfloat16, "default")
bench_gemm(16384, jnp.bfloat16, "default")

# recursive potrf
import sys
sys.path.insert(0, "/root/repo")
import dlaf_tpu as dt
from dlaf_tpu.matrix import generators as gen

for n, nb in [(8192, 128), (8192, 256), (8192, 512), (16384, 256)]:
    a = gen.random_hermitian_positive_definite(jax.random.PRNGKey(1), n, jnp.float32)
    f = jax.jit(lambda x, nb=nb: jnp.sum(dt.potrf(x, nb=nb)).astype(jnp.float32))
    t = timeit(f, a)
    tf = (n**3 / 3) / t / 1e12
    print(f"POTRF n={n} nb={nb} f32: {t*1e3:.2f} ms  {tf:.1f} TFLOP/s", flush=True)
